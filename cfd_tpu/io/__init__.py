from . import checkpoint, csv_out, vtk

__all__ = ["checkpoint", "csv_out", "vtk"]
