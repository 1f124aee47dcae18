"""Profile the block-sparse self-collision path on the real TPU.

Breaks a self-collision substep into its pipeline stages and reports the
marginal per-substep cost of each (bench.py methodology: marginal time
between two scan lengths — the tunnel's ~20-30 ms dispatch latency and
non-blocking block_until_ready make naive timing lie).

Rerun when: changing solver/blocksparse.py (sort / partner
machinery), kernels/pallas_blocks.py (the pair kernel), or the
cloth_selfcollide_* presets.  Usage:

    timeout 900 python tools/prof_selfcollision.py [preset] [frames]

(default cloth_selfcollide_64k, drape 24 frames first so the partner
distribution matches the bench state).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from softbodyunity_tpu import api
from softbodyunity_tpu.kernels.pallas_blocks import (
    self_collision_forces_block_pallas)
from softbodyunity_tpu.models import presets
from softbodyunity_tpu.solver.blocksparse import (
    _sorted_tiles, _tile_partners)


def best_time(run, args, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make_run, args, small=4, big=36):
    rs = make_run(small)
    float(rs(*args))
    t_s = best_time(rs, args)
    rb = make_run(big)
    float(rb(*args))
    t_b = best_time(rb, args)
    return (t_b - t_s) / (big - small)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "cloth_selfcollide_64k"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    host, cfg = presets.build(preset)
    top, state = api.init(host)
    p = cfg.self_collision
    for _ in range(frames):
        state = api.step(top, cfg, state)
    x = state.x

    def mk_force(W):
        @jax.jit
        def run(x):
            def body(c, _):
                f = self_collision_forces_block_pallas(c, p)
                return c + 1e-6 * f, None
            c, _ = lax.scan(body, x, None, length=W)
            return jnp.sum(c)
        return run

    def mk_sortpart(W):
        @jax.jit
        def run(x):
            def body(c, _):
                xb, valid, order, b = _sorted_tiles(c, p.cell_size,
                                                    p.block_size)
                k = min(p.block_partners, b)
                partners, pvalid, _ = _tile_partners(xb, valid, p.radius, k)
                return c + 1e-9 * (jnp.sum(pvalid) + jnp.sum(partners)), None
            c, _ = lax.scan(body, x, None, length=W)
            return jnp.sum(c)
        return run

    def mk_sort_only(W):
        @jax.jit
        def run(x):
            def body(c, _):
                xb, valid, order, b = _sorted_tiles(c, p.cell_size,
                                                    p.block_size)
                return c + 1e-9 * jnp.sum(xb), None
            c, _ = lax.scan(body, x, None, length=W)
            return jnp.sum(c)
        return run

    # survival stats on the draped state
    xb, valid, order, b = _sorted_tiles(x, p.cell_size, p.block_size)
    k = min(p.block_partners, b)
    partners, pvalid, ovf = _tile_partners(xb, valid, p.radius, k)
    nv = jnp.sum(pvalid)
    print(f"{preset}: tiles {b}  sum nvalid {int(nv)}  avg {float(nv)/b:.1f}"
          f"  overflow {int(ovf)}", flush=True)
    for name, mk in (("force kernel      ", mk_force),
                     ("sort+partners      ", mk_sortpart),
                     ("sort only          ", mk_sort_only)):
        d = marginal(mk, (x,))
        print(f"{name}: {1e6 * d:7.0f} us/substep", flush=True)


if __name__ == "__main__":
    main()
