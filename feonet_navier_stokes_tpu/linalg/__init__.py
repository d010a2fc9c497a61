"""Dense linear algebra: SPAI preconditioner, ground-truth solvers, Newton."""

from .spai import spai, spai_sparse, equilibrate, condition_number
from .bpx import bpx_factor, p2_interpolation, BPXFactor
from .solvers import solve_dense, solve_dense_batched, implicit_euler_rollout
from .linear_fit import (
    linear_map_lstsq,
    set_linear_map_params,
    linear_step_exact,
    set_linear_step_params,
)
from .newton import (masked_convection, ns_residual, newton_solve_ns,
                     stable_solve_ns, stable_solve_ns_sparse,
                     stable_solve_weak)
from .ns_corrector import (
    steady_weak_residual,
    steady_defect_fit,
    apply_steady_defect_fit,
    tdns_step_fit,
    apply_tdns_step_fit,
)

__all__ = [
    "spai",
    "spai_sparse",
    "equilibrate",
    "bpx_factor",
    "p2_interpolation",
    "BPXFactor",
    "condition_number",
    "solve_dense",
    "solve_dense_batched",
    "implicit_euler_rollout",
    "linear_map_lstsq",
    "set_linear_map_params",
    "linear_step_exact",
    "set_linear_step_params",
    "masked_convection",
    "ns_residual",
    "newton_solve_ns",
    "stable_solve_ns",
    "stable_solve_ns_sparse",
    "stable_solve_weak",
    "steady_weak_residual",
    "steady_defect_fit",
    "apply_steady_defect_fit",
    "tdns_step_fit",
    "apply_tdns_step_fit",
]
