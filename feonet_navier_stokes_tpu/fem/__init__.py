from .quadrature import triangle_quadrature
from .basis import p1_basis, p2_basis, P1_DIM, P2_DIM
from .assemble import (
    ElementGeometry,
    element_geometry,
    scatter_add_dense,
    assemble_scalar_block,
    assemble_stokes,
    assemble_velocity_mass,
    assemble_convection,
    assemble_load_sincos,
    assemble_load_from_velocity_values,
    assemble_load_constant,
    apply_bc_matrix,
    apply_bc_vector,
)
from .bcs import BoundaryCondition, make_bc, BCData
from .device_assemble import make_device_load_sincos, make_device_load_grf

__all__ = [
    "triangle_quadrature",
    "p1_basis",
    "p2_basis",
    "P1_DIM",
    "P2_DIM",
    "ElementGeometry",
    "element_geometry",
    "scatter_add_dense",
    "assemble_scalar_block",
    "assemble_stokes",
    "assemble_velocity_mass",
    "assemble_convection",
    "assemble_load_sincos",
    "assemble_load_from_velocity_values",
    "assemble_load_constant",
    "apply_bc_matrix",
    "apply_bc_vector",
    "make_device_load_sincos",
    "make_device_load_grf",
    "BoundaryCondition",
    "make_bc",
    "BCData",
]
