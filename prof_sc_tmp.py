import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from softbodyunity_tpu.models import presets
from softbodyunity_tpu import api
from softbodyunity_tpu.kernels.pallas_blocks import self_collision_forces_block_pallas
from softbodyunity_tpu.solver.blocksparse import _sorted_tiles, _tile_partners, _chunk_masks

host, cfg = presets.build("cloth_selfcollide_64k")
top, state = api.init(host)
p = cfg.self_collision
# advance a bit so the sheet drapes (closer to bench state)
state = api.step(top, cfg, state)
x = state.x

def best_time(run, args, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(*args)); ts.append(time.perf_counter() - t0)
    return min(ts)

def marginal(make_run, args, small=4, big=36):
    rs = make_run(small); float(rs(*args)); t_s = best_time(rs, args)
    rb = make_run(big); float(rb(*args)); t_b = best_time(rb, args)
    return (t_b - t_s) / (big - small)

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
            xb, valid, order, b = _sorted_tiles(c, p.cell_size, p.block_size)
            k = min(p.block_partners, b)
            partners, pvalid, _ = _tile_partners(xb, valid, p.radius, k)
            cm = _chunk_masks(xb, valid, partners, p.radius, 8)
            return c + 1e-9 * (jnp.sum(pvalid) + jnp.sum(cm)), None
        c, _ = lax.scan(body, x, None, length=W)
        return jnp.sum(c)
    return run

# survival stats
xb, valid, order, b = _sorted_tiles(x, p.cell_size, p.block_size)
k = min(p.block_partners, b)
partners, pvalid, ovf = _tile_partners(xb, valid, p.radius, k)
cm = _chunk_masks(xb, valid, partners, p.radius, 8)
nv = jnp.sum(pvalid)
print("tiles", b, "sum nvalid", int(nv), "avg", float(nv)/b,
      "chunk survival", float(jnp.sum(cm * pvalid[..., None]) / (nv * 8)),
      "overflow", int(ovf), flush=True)
d = marginal(mk_force, (x,))
print("force-eval total   : %.0f us/substep" % (1e6*d), flush=True)
d = marginal(mk_sortpart, (x,))
print("sort+partners+cmask: %.0f us/substep" % (1e6*d), flush=True)
