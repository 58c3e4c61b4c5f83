"""Per-op FLIP profiling on the real TPU: flat vs bucketed, XLA vs Pallas.

Run (TPU): python tools/profile_flip_tpu.py [res] [stage]
Stages: setup advect rebin p2g ls blend step flat all
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
on_tpu = jax.default_backend() == "tpu"

dom = Domain(size=(res, res, res), dim=3)
params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                         cg_accuracy=1e-3, ring_only_obstacles=True)
st = flip.make_dam_state_bucketed(dom, params, discretization=2)
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


if stage in ("advect", "all") and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    bench("advect_pallas", jax.jit(
        lambda b: fbp.advect_pallas(b, flags, vel, dt, dom, 2, True, True)),
        bk)

if stage in ("advect", "all") and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    bench("advect_blend_pallas", jax.jit(
        lambda b: fbp.advect_blend_pallas(
            b, flags, vel, vel, dt, jnp.ones((), jnp.bool_), 0.97, dom, 2,
            True, True)), bk)

if stage in ("pressure", "all"):
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

if stage in ("rebin", "all") and on_tpu:
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    bench("rebin_pallas", jax.jit(lambda b: fbp.rebin_pallas(b, dom)), bk)
    bench("rebin_xla(sort)", jax.jit(lambda b: fb.rebin(b, dom)), bk)

if stage in ("p2g", "all"):
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    if on_tpu:
        bench("p2g_pallas", jax.jit(lambda b: fbp2.p2g_mac_pallas(b, dom)),
              bk)
    bench("p2g_xla", jax.jit(lambda b: fb.p2g_mac(b, dom)), bk)

if stage in ("ls", "all"):
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    if on_tpu:
        bench("ls_pallas", jax.jit(
            lambda b: fbp2.union_levelset_pallas(b, dom)), bk)
    bench("ls_xla", jax.jit(lambda b: fb.union_levelset_bucketed(b, dom)),
          bk)

if stage in ("blend", "all"):
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    if on_tpu:
        bench("blend_pallas", jax.jit(
            lambda b: fbp2.flip_update_pallas(b, vel, vel, 0.97, dom)), bk)
    bench("blend_xla", jax.jit(
        lambda b: fb.flip_update_bucketed(b, vel, vel, 0.97, dom)), bk)

if stage in ("step", "all"):
    step = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    out = bench("bucketed step", step, st)
    log(f"dropped={int(out.buckets.dropped)}")

if stage in ("flat", "all"):
    stf = flip.make_dam_state(dom, params, discretization=2)
    stepf = jax.jit(lambda s: flip.flip_step(s, dom, params))
    bench("flat step", stepf, stf)

log("done")
