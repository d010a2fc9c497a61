"""Side-by-side tricontourf comparison plots + training curves.

Replaces the reference's evaluation notebooks
(FEONet_Stokes_square/plot_results_channel_flow.ipynb cells 18-20,
FEONet_time_dep_Stokes/plot_results.ipynb cells 9-14): prediction vs
reference fields rendered on the triangulation, per component, plus the
absolute-error panel.
"""

from __future__ import annotations

import numpy as np

from ..problems.base import Problem


def velocity_magnitude(problem: Problem, coeff: np.ndarray) -> np.ndarray:
    """|u| at the P2 nodes from a mixed coefficient vector."""
    u1, u2, _ = problem.split_components(coeff)
    return np.hypot(np.asarray(u1), np.asarray(u2))


def _component_tri(problem: Problem, component: str):
    import matplotlib.tri as mtri

    sp = problem.space
    if component == "p":
        coords = sp.p1_coords
        tri = mtri.Triangulation(coords[:, 0], coords[:, 1], sp.mesh.cells)
    else:
        coords = sp.p2_coords
        # subdivide each P2 triangle into 4 sub-triangles through midpoints
        d = sp.cell_dofs_p2  # local: v0 v1 v2 m12 m02 m01
        sub = np.concatenate(
            [
                d[:, [0, 5, 4]],
                d[:, [5, 1, 3]],
                d[:, [4, 3, 2]],
                d[:, [3, 4, 5]],
            ]
        )
        tri = mtri.Triangulation(coords[:, 0], coords[:, 1], sub)
    return tri


def tricontourf_compare(
    problem: Problem,
    pred_coeff: np.ndarray,
    true_coeff: np.ndarray,
    component: str = "u1",
    out_path: str | None = None,
    levels: int = 40,
    title: str | None = None,
):
    """Three-panel (prediction | reference | abs error) tricontourf figure
    for one sample. component in {'u1', 'u2', 'p', 'speed'}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    comp_idx = {"u1": 0, "u2": 1, "p": 2}
    if component == "speed":
        pv = velocity_magnitude(problem, pred_coeff)
        tv = velocity_magnitude(problem, true_coeff)
        tri = _component_tri(problem, "u1")
    else:
        pv = np.asarray(problem.split_components(pred_coeff)[comp_idx[component]])
        tv = np.asarray(problem.split_components(true_coeff)[comp_idx[component]])
        tri = _component_tri(problem, component)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4.2), constrained_layout=True)
    vmin, vmax = float(min(pv.min(), tv.min())), float(max(pv.max(), tv.max()))
    for ax, vals, name in (
        (axes[0], pv, "FEONet prediction"),
        (axes[1], tv, "reference solve"),
    ):
        m = ax.tricontourf(tri, vals, levels=levels, vmin=vmin, vmax=vmax, cmap="viridis")
        ax.set_title(f"{name}: {component}")
        ax.set_aspect("equal")
        fig.colorbar(m, ax=ax, shrink=0.9)
    m = axes[2].tricontourf(tri, np.abs(pv - tv), levels=levels, cmap="magma")
    axes[2].set_title("abs error")
    axes[2].set_aspect("equal")
    fig.colorbar(m, ax=axes[2], shrink=0.9)
    if title:
        fig.suptitle(title)
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig


def plot_training_history(history: list[dict], out_path: str | None = None):
    """Loss + rel-L2 curves from Trainer.history (reference logs these as
    text lines, train_FEONet.py:456-469)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [h["epoch"] for h in history]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4), constrained_layout=True)
    ax1.semilogy(epochs, [h["loss"] for h in history])
    ax1.set_xlabel("epoch")
    ax1.set_ylabel("residual loss")
    for key in ("u1", "u2", "p", "coeff", "traj_rel_l2"):
        if key in history[-1]:
            ax2.semilogy(epochs, [h[key] for h in history if key in h], label=key)
    ax2.set_xlabel("epoch")
    ax2.set_ylabel("rel L2")
    ax2.legend()
    if out_path:
        fig.savefig(out_path, dpi=120)
        plt.close(fig)
        return out_path
    return fig
