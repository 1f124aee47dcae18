"""Strain limiting — device twin of the oracle's binding semantics
(``oracle/reference.py::strain_limit_dx``; Provot 1995 hard bound on
edge elongation, ``StrainLimitParams``).

General incidence-gather formulation (any edge list); grid scenes run
the roll-based banded variant instead (``solver/banded.py``) — TPU
gathers are ~1% of HBM bandwidth, rolls are not (docs/PERF.md).  The
sweep loop is static and small, so it unrolls under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import SimConfig
from ..core.topology import Topology


def strain_limit_dx(top: Topology, cfg: SimConfig, x, alive=None,
                    rest_scale=None):
    """Total strain-limiting position correction (oracle
    ``strain_limit_dx`` twin): ``iterations`` Jacobi sweeps projecting
    every edge outside the ``[rest*(1-max_compress),
    rest*(1+max_stretch)]`` band back to the nearest bound, endpoint
    shares weighted by inverse mass, vertex updates averaged over the
    VIOLATING incident edges.  ``rest`` honours plasticity's scale; torn
    edges are inert; pinned vertices never move."""
    sl = cfg.strain_limit
    w = top.inv_mass
    a_idx = top.edges[:, 0]
    b_idx = top.edges[:, 1]
    rest = (top.rest_length if rest_scale is None
            else top.rest_length * rest_scale)
    hi = rest * (1.0 + sl.max_stretch)
    lo = (rest * (1.0 - sl.max_compress) if sl.max_compress >= 0.0
          else jnp.zeros_like(rest))
    wa, wb = w[a_idx], w[b_idx]
    denom = jnp.maximum(wa + wb, 1e-12)
    # Jacobi mean over the ALIVE incident edges (the xpbd_iteration
    # convention; continuous in x — see the oracle comment)
    e_cnt = (jnp.ones(a_idx.shape[0], x.dtype) if alive is None else alive)
    cnt = jnp.zeros(x.shape[0], x.dtype)
    cnt = cnt.at[a_idx].add(e_cnt)
    cnt = cnt.at[b_idx].add(e_cnt)
    inv_cnt = 1.0 / jnp.maximum(cnt, 1.0)
    x0 = x
    for _ in range(sl.iterations):
        d = x[b_idx] - x[a_idx]
        length = jnp.linalg.norm(d, axis=1)
        n = d / jnp.maximum(length, 1e-12)[:, None]
        c_val = length - jnp.clip(length, lo, hi)
        if alive is not None:
            c_val = c_val * alive
        corr = c_val / denom
        dx = jnp.zeros_like(x)
        dx = dx.at[a_idx].add((wa * corr)[:, None] * n)
        dx = dx.at[b_idx].add(-(wb * corr)[:, None] * n)
        x = x + dx * inv_cnt[:, None]
    return x - x0
