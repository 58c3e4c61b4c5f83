"""Chained-on-device per-op smoke profiling at 128^3.

Each op is timed as lax.scan of K on-device repetitions inside ONE jit
call, so per-dispatch tunnel overhead (1-3 ms through axon) is amortized
out and the number reflects the cost the op contributes to the fused step.

Run: python tools/profile_smoke_chain.py [res] [K]
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
from mantaflow_tpu.core.shapes import Sphere
from mantaflow_tpu.models import smoke
from mantaflow_tpu.ops import advection_pallas as advp
from mantaflow_tpu.ops import extforces as ext
from mantaflow_tpu.ops import pressure as prs

res = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
dom = Domain(size=(res, res, res), dim=3)
params = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0),
                           vorticity_confinement=0.1,
                           cg_accuracy=1e-3, window=3, use_pallas=True,
                           adaptive_dt=True, cfl=3.0, dt_max=2.0)
src = Sphere(center=(res / 2.0, res * 0.1, res / 2.0), radius=res * 0.14)
st = smoke.make_smoke_state(dom, params, source_shape=src)
step = jax.jit(lambda s: smoke.smoke_step(s, dom, params))
for _ in range(20):
    st = step(st)
float(st.density.sum())
log("state developed (20 steps)")
flags, vel, density = st.flags, st.vel, st.density
dt = st.ts.dt


def chain(name, fn, init, n=3):
    """fn: x -> x same-structure; scan K times inside one jit."""
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    out = run(init)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = run(init)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    ms = (time.time() - t0) / n / K * 1000
    log(f"{name}: {ms:.2f} ms")
    return ms


# --- individual ops, perturbed slightly each iter so scan can't hoist ---
chain("advect_real(o2)",
      lambda d: advp.advect_real_pl(flags, vel, d, dt, dom, 3, order=2),
      density)
chain("advect_mac(o2)",
      lambda v: advp.advect_mac_pl(flags, v, v, dt, dom, 3, order=2,
                                   strength=1.0),
      vel)
chain("set_wall_bcs", lambda v: ext.set_wall_bcs(flags, v, dom), vel)
chain("buoyancy",
      lambda v: ext.add_buoyancy(flags, density, v, params.buoyancy, dt, dom),
      vel)
chain("vconf",
      lambda v: ext.vorticity_confinement(v, flags, dom, 0.1),
      vel)
chain("maxabs+adapt",
      lambda v: v * (1.0 + 0.0 * jnp.sqrt(jnp.max(v[0]**2 + v[1]**2
                                                  + v[2]**2))),
      vel)

# --- pressure: stencil assembly vs CG iterations ---
chain("make_stencil",
      lambda f: jnp.stack(prs.make_laplace_stencil(f, dom))[0, 0, 0, 0]
      .astype(jnp.int32) + f,
      flags)

stencil = prs.make_laplace_stencil(flags, dom)
rhs = prs.make_rhs(flags, vel, dom)
chain("apply_laplace (1 CG matvec)",
      lambda x: prs.apply_laplace(flags, x, stencil, dom),
      rhs)


def cg_iter(c):
    p, r, s, sigma = c
    tmp = prs.apply_laplace(flags, s, stencil, dom)
    dp = jnp.sum(tmp * s, dtype=jnp.float32)
    alpha = jnp.where(jnp.abs(dp) > 0, sigma / dp, 0.0)
    p = p + alpha * s
    r = r - alpha * tmp
    sigma_new = jnp.sum(r * r, dtype=jnp.float32)
    beta = sigma_new / sigma
    s = r + beta * s
    return (p, r, s, sigma_new)


chain("cg_iteration (matvec+dots+axpys)", cg_iter,
      (jnp.zeros_like(rhs), rhs, rhs, jnp.sum(rhs * rhs)))


# full solve with iteration count
@jax.jit
def full_solve(v):
    return prs.solve_pressure(v, flags, dom, cg_accuracy=1e-3)


# measure the actual step's CG iteration count on a mid-step velocity:
# rebuild the velocity right before projection
@jax.jit
def prestep_vel(s):
    d = jnp.where(s.source > 0.0, s.source, s.density)
    d2 = advp.advect_real_pl(s.flags, s.vel, d, s.ts.dt, dom, 3, order=2)
    v = advp.advect_mac_pl(s.flags, s.vel, s.vel, s.ts.dt, dom, 3, order=2,
                           strength=1.0)
    v = ext.set_wall_bcs(s.flags, v, dom)
    v = ext.add_buoyancy(s.flags, d2, v, params.buoyancy, s.ts.dt, dom)
    v = ext.vorticity_confinement(v, s.flags, dom, 0.1)
    return v


pv = prestep_vel(st)
out = full_solve(pv)
iters = int(out[3])
log(f"CG iters at 1e-3 on pre-projection vel: {iters}, "
    f"res {float(out[4]):.2e}")
out14 = jax.jit(lambda v: prs.solve_pressure(v, flags, dom,
                                             cg_accuracy=1e-4))(pv)
log(f"CG iters at 1e-4: {int(out14[3])}, res {float(out14[4]):.2e}")

chain("full step", lambda s: smoke.smoke_step(s, dom, params), st, n=2)
log("done")
