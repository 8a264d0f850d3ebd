from . import stencils

__all__ = ["stencils"]
