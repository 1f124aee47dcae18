import time, dataclasses, numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
import softbodyunity_tpu as sb
from softbodyunity_tpu.models import presets
from softbodyunity_tpu import api
from softbodyunity_tpu.kernels import pallas_lattice as PL
from softbodyunity_tpu.solver import shapematch as SM

host, cfg = presets.build("jelly_voxel_50k")
top, state = api.init(host)
state = api.ensure_shapematch_state(top, cfg, state)
n = top.n_vertices
s_dim = pl.cdiv(n, 128)
g = top.offset_groups; t = top.tet_groups
egroups = tuple((d, k, r) for d, (k, r, _a) in zip(g.deltas, g.uniform))
use_volume = len(t.deltas) > 0 and cfg.volume_stiffness != 0.0
tgroups = tuple((p, rv) for p, rv in zip(t.deltas, t.uniform_rest_volume)) if use_volume else ()
from softbodyunity_tpu.kernels.pallas_substep import _pack_plane, _pack_spheres, _pack_capsules, _pack_boxes
im2 = PL._fold(top.inv_mass, s_dim)
emask = PL._fold(g.mask, s_dim)
tmask = PL._fold(t.mask, s_dim)
plane = _pack_plane(top); spheres = _pack_spheres(top)
caps = _pack_capsules(top); boxes = _pack_boxes(top)
cfg_nc = cfg.replace(collision=dataclasses.replace(cfg.collision,
    enable_plane=False, enable_spheres=False, enable_capsules=False, enable_boxes=False))
dt = float(cfg.dt)
x3 = PL._fold(state.x.T, s_dim); v3 = PL._fold(state.v.T, s_dim)
quats = state.cluster_quat
smd = SM.shape_match_flat_statics(top, s_dim, 128)
smd_t = (smd["m"], smd["r3"], smd["oh"], smd["member"], smd["inv_mass_k"])
print("n", n, "s_dim", s_dim, "K", top.n_clusters, flush=True)

def best_time(run, args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(run(*args)); ts.append(time.perf_counter() - t0)
    return min(ts)

def marginal(make_run, args, small=8, big=88):
    rs = make_run(small); float(rs(*args)); t_s = best_time(rs, args)
    rb = make_run(big); float(rb(*args)); t_b = best_time(rb, args)
    return (t_b - t_s) / (big - small)

def mk_kernel_only(W):
    @jax.jit
    def run(x3, v3, im2, emask, tmask, plane, spheres, caps, boxes):
        def body(c, _):
            xo, vo = PL._pallas_lattice_substeps(c[0], c[1], im2, emask, tmask,
                plane, spheres, caps, boxes, cfg_nc, egroups, tgroups, dt, 1, False)
            return (xo, vo), None
        c, _ = lax.scan(body, (x3, v3), None, length=W)
        return jnp.sum(c[0])
    return run

def mk_kernel_fusedW(W):
    @jax.jit
    def run(x3, v3, im2, emask, tmask, plane, spheres, caps, boxes):
        xo, vo = PL._pallas_lattice_substeps(x3, v3, im2, emask, tmask,
            plane, spheres, caps, boxes, cfg_nc, egroups, tgroups, dt, W, False)
        return jnp.sum(xo)
    return run

def mk_sm_only(W):
    @jax.jit
    def run(x3, quats, m, r3, oh, member, imk):
        smd2 = dict(m=m, r3=r3, oh=oh, member=member, inv_mass_k=imk)
        def body(c, _):
            x3, q = c
            xf = x3.reshape(3, -1)
            dxf, q = SM.shape_match_dx_flat(cfg, smd2, xf, q)
            return ((xf + dxf).reshape(3, s_dim, 128), q), None
        c, _ = lax.scan(body, (x3, quats), None, length=W)
        return jnp.sum(c[0])
    return run

def mk_full_new(W):
    fn = PL.make_lattice_shapematch_step(top, cfg)
    @jax.jit
    def run(state):
        s = fn(state, dt, W)
        return jnp.sum(s.x)
    return run

def mk_full_old(W):
    old = SM.MXU_ONEHOT_MAX_ELEMS
    SM.MXU_ONEHOT_MAX_ELEMS_SAVE = old
    fn = None
    try:
        # vertex-layout fallback: force flat_oh False at build time
        import softbodyunity_tpu.kernels.pallas_lattice as PLm
        class _Z: pass
        # monkeypatch module-level import site
        import softbodyunity_tpu.solver.shapematch as SMm
        SMm_old = SMm.MXU_ONEHOT_MAX_ELEMS
        SMm.MXU_ONEHOT_MAX_ELEMS = 0
        fn = PL.make_lattice_shapematch_step(top, cfg)
        SMm.MXU_ONEHOT_MAX_ELEMS = SMm_old
    except Exception:
        raise
    @jax.jit
    def run(state):
        s = fn(state, dt, W)
        return jnp.sum(s.x)
    return run

args_k = (x3, v3, im2, emask, tmask, plane, spheres, caps, boxes)
d = marginal(mk_kernel_only, args_k)
print("kernel-only scan       : %.1f us/substep (%.0f /s)" % (1e6*d, 1/d), flush=True)
d = marginal(mk_kernel_fusedW, args_k)
print("kernel fused W (floor) : %.1f us/substep (%.0f /s)" % (1e6*d, 1/d), flush=True)
d = marginal(mk_sm_only, (x3, quats) + smd_t)
print("shapematch-only scan   : %.1f us/substep (%.0f /s)" % (1e6*d, 1/d), flush=True)
d = marginal(mk_full_new, (state,))
print("full NEW plane-layout  : %.1f us/substep (%.0f /s)" % (1e6*d, 1/d), flush=True)
d = marginal(mk_full_old, (state,))
print("full OLD vertex-layout : %.1f us/substep (%.0f /s)" % (1e6*d, 1/d), flush=True)
