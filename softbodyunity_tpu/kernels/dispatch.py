"""Backend dispatch: route structured-grid scenes to fast kernels.

Returns None when no fast path applies (caller falls back to the general
jnp path).  The stencil / Pallas fast paths land in
kernels/stencil.py and kernels/pallas_substep.py.
"""

from __future__ import annotations


def maybe_fast_step(top, cfg, backend):
    from ..core.config import Solver

    if top.n_tets > 0:
        # volumetric lattices: fused Pallas lattice kernel (Mosaic-only —
        # no XLA-level stencil twin; the banded jnp path is the fallback)
        if backend == "pallas":
            from .pallas_lattice import lattice_applicable, make_lattice_step

            if lattice_applicable(top, cfg):
                return make_lattice_step(top, cfg)
        return None
    if top.grid_shape is None or top.grid_spacing is None:
        return None
    if cfg.self_collision.enabled:
        return None
    # fused Pallas kernels cover Euler and XPBD; Verlet takes the stencil path
    if backend == "pallas" and cfg.solver == Solver.VERLET:
        backend = "stencil"
    try:
        if backend == "stencil":
            from .stencil import make_stencil_step
            return make_stencil_step(top, cfg)
        if backend == "pallas":
            if cfg.solver == Solver.XPBD:
                from .pallas_xpbd import make_pallas_xpbd_step
                return make_pallas_xpbd_step(top, cfg)
            from .pallas_substep import MAX_VMEM_VERTICES, make_pallas_step

            ny, nx = top.grid_shape
            if ny * nx > MAX_VMEM_VERTICES:
                # beyond VMEM capacity: row-tiled kernel (plane-only)
                from .pallas_tiled import make_tiled_step
                return make_tiled_step(top, cfg)
            return make_pallas_step(top, cfg)
    except (ImportError, ValueError):
        # kernel preconditions unmet (size/collider gates) -> general path
        return None
    return None
