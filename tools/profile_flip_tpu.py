"""Per-op FLIP profiling on the real TPU: flat vs bucketed, XLA vs Pallas.

Run (TPU): python tools/profile_flip_tpu.py [res] [stage] [warm_steps]
Stages: setup advect rebin p2g ls blend step flat all
warm_steps > 0 profiles the DEVELOPED state: the dam is advanced that many
steps through the overflow-safe auto driver first (PPC escalates as the
dam piles up), so the per-op numbers attribute the cost of the state the
developed bench rows measure (VERDICT r4: the 64^3-only attribution left
round 5 optimizing 128^3 blind).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
t00 = time.time()


def log(msg):
    print(f"[{time.time()-t00:7.1f}s] {msg}", flush=True)


import jax
import jax.numpy as jnp

log(f"devices={jax.devices()}")

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.models import flip
from mantaflow_tpu.ops import flip_bucket as fb

res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
stage = sys.argv[2] if len(sys.argv) > 2 else "all"
stages = set(stage.split(","))
warm = int(sys.argv[3]) if len(sys.argv) > 3 else 0
on_tpu = jax.default_backend() == "tpu"

dom = Domain(size=(res, res, res), dim=3)
params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                         cg_accuracy=1e-3, ring_only_obstacles=True)
ppc0 = 12 if res >= 128 else 10
cache = f"/tmp/flip_dev_{res}_{warm}.npz"
if warm and os.path.exists(cache):
    # rebuild the developed state purely from the cache — the initial
    # make_dam_state_bucketed costs minutes of 128^3 compile on its own
    import numpy as np

    from mantaflow_tpu.core import solver as slv
    d = np.load(cache)
    bk0 = fb.Buckets(px=jnp.asarray(d["px"]), py=jnp.asarray(d["py"]),
                     pz=jnp.asarray(d["pz"]), vx=jnp.asarray(d["vx"]),
                     vy=jnp.asarray(d["vy"]), vz=jnp.asarray(d["vz"]),
                     valid=jnp.asarray(d["valid"]),
                     dropped=jnp.zeros((), jnp.int32))
    st = flip.FlipBucketState(
        flags=jnp.asarray(d["flags"]), vel=jnp.asarray(d["vel"]),
        vel_old=jnp.asarray(d["vel_old"]),
        pressure=jnp.zeros(dom.shape, jnp.float32),
        phi=jnp.asarray(d["phi"]), buckets=bk0,
        ts=slv.TimeState.create(0.5),
        blend_pending=jnp.ones((), jnp.bool_))
    log(f"loaded developed state from {cache}")
else:
    st = flip.make_dam_state_bucketed(dom, params, discretization=2,
                                      ppc=ppc0)
    if warm:
        import numpy as np
        st = flip.flip_run_bucketed_auto(st, dom, params, warm,
                                         check_every=10)
        b = st.buckets
        np.savez(cache + ".tmp.npz", ppc=b.ppc, px=np.asarray(b.px),
                 py=np.asarray(b.py), pz=np.asarray(b.pz),
                 vx=np.asarray(b.vx), vy=np.asarray(b.vy),
                 vz=np.asarray(b.vz), valid=np.asarray(b.valid),
                 flags=np.asarray(st.flags), vel=np.asarray(st.vel),
                 vel_old=np.asarray(st.vel_old), phi=np.asarray(st.phi))
        os.replace(cache + ".tmp.npz", cache)   # atomic: no torn cache
        log(f"saved developed state to {cache}")
if warm:
    log(f"developed: ppc={st.buckets.ppc} "
        f"parts={int(st.buckets.count())} dropped={int(st.buckets.dropped)}")
bk, flags, vel = st.buckets, st.flags, st.vel
dt = 0.5
log(f"state: ppc={bk.ppc} cells={bk.ncells} parts={int(bk.count())}")


def _sync(out):
    # forced device->host fetch: block_until_ready can return early
    # through the axon tunnel (see .claude/skills/verify)
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def bench(name, fn, arg, n=10):
    t0 = time.time()
    out = fn(arg)
    _sync(out)
    log(f"{name}: compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(n):
        out = fn(arg)
    _sync(out)
    log(f"{name}: {(time.time()-t0)/n*1000:.2f} ms")
    return out


if stages & {"advect", "all"} and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    bench("advect_pallas", jax.jit(
        lambda b: fbp.advect_pallas(b, flags, vel, dt, dom, 2, True, True)),
        bk)

if stages & {"advect", "all"} and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    bench("advect_blend_pallas", jax.jit(
        lambda b: fbp.advect_blend_pallas(
            b, flags, vel, vel, dt, jnp.ones((), jnp.bool_), 0.97, dom, 2,
            True, True)), bk)

if stages & {"pressure", "all"}:
    from mantaflow_tpu.ops import extrapolation as xtr
    from mantaflow_tpu.ops import pressure as prs
    phi0 = fb.union_levelset_bucketed(bk, dom)
    bench("solve_pressure(ghost)", jax.jit(
        lambda v: prs.solve_pressure(v, flags, dom, cg_accuracy=1e-3,
                                     phi=phi0)[0]), vel)
    bench("extrap_weight+simple", jax.jit(
        lambda v: xtr.extrapolate_mac_simple(
            flags, xtr.extrapolate_mac_from_weight(
                v, jnp.abs(v) + 0.5, dom, 2)[0], dom, 4)), vel)

if stages & {"rebin", "rebinp", "all"} and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    bench("rebin_pallas", jax.jit(lambda b: fbp.rebin_pallas(b, dom)), bk)
    if stages & {"rebin", "all"}:
        bench("rebin_xla(sort)", jax.jit(lambda b: fb.rebin(b, dom)), bk)

if stages & {"p2g", "all"}:
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    if on_tpu:
        bench("p2g_pallas", jax.jit(lambda b: fbp2.p2g_mac_pallas(b, dom)),
              bk)
    bench("p2g_xla", jax.jit(lambda b: fb.p2g_mac(b, dom)), bk)

if stages & {"p2gu", "all"} and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    bench("p2g_union_pallas(fused)", jax.jit(
        lambda b: fbp2.p2g_union_pallas(b, dom, 1.0)), bk)

if stages & {"ls", "all"}:
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    if on_tpu:
        bench("ls_pallas", jax.jit(
            lambda b: fbp2.union_levelset_pallas(b, dom)), bk)
    bench("ls_xla", jax.jit(lambda b: fb.union_levelset_bucketed(b, dom)),
          bk)

if stages & {"blend", "all"}:
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    if on_tpu:
        bench("blend_pallas", jax.jit(
            lambda b: fbp2.flip_update_pallas(b, vel, vel, 0.97, dom)), bk)
    bench("blend_xla", jax.jit(
        lambda b: fb.flip_update_bucketed(b, vel, vel, 0.97, dom)), bk)

if stages & {"step", "all"}:
    step = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    out = bench("bucketed step", step, st)
    log(f"dropped={int(out.buckets.dropped)}")

if stages & {"flat", "all"}:
    stf = flip.make_dam_state(dom, params, discretization=2)
    stepf = jax.jit(lambda s: flip.flip_step(s, dom, params))
    bench("flat step", stepf, stf)

log("done")
