from .mesh import Mesh, structured_rectangle
from .taylor_hood import TaylorHoodSpace, build_taylor_hood
from .hole import square_with_hole_mesh

__all__ = [
    "Mesh",
    "structured_rectangle",
    "TaylorHoodSpace",
    "build_taylor_hood",
    "square_with_hole_mesh",
]
