from . import checkpoint, csv_out, orbax_ckpt, vtk

__all__ = ["checkpoint", "csv_out", "orbax_ckpt", "vtk"]
