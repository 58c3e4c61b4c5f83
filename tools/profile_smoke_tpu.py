"""Per-op smoke profiling on the real TPU at the bench config (128^3).

Run: python tools/profile_smoke_tpu.py [res]
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
dom = Domain(size=(res, res, res), dim=3)
params = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0),
                           vorticity_confinement=0.1,
                           cg_accuracy=1e-3, window=3, use_pallas=True,
                           adaptive_dt=True, cfl=3.0, dt_max=2.0)
src = Sphere(center=(res / 2.0, res * 0.1, res / 2.0), radius=res * 0.14)
st = smoke.make_smoke_state(dom, params, source_shape=src)
step = jax.jit(lambda s: smoke.smoke_step(s, dom, params))
# reach a developed state so CG iteration counts are realistic
for _ in range(20):
    st = step(st)
jax.block_until_ready(st.vel)
log("state developed (20 steps)")
flags, vel, density = st.flags, st.vel, st.density
dt = 0.5


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    log(f"{name}: {(time.time()-t0)/n*1000:.2f} ms")


bench("advect_real_pl(o2)", lambda v, d: advp.advect_real_pl(
    flags, v, d, dt, dom, 3, order=2), vel, density)
bench("advect_mac_pl(o2)", lambda v: advp.advect_mac_pl(
    flags, v, v, dt, dom, 3, order=2, strength=1.0), vel)
bench("set_wall_bcs", lambda v: ext.set_wall_bcs(flags, v, dom), vel)
bench("buoyancy", lambda v, d: ext.add_buoyancy(
    flags, d, v, (0.0, -6e-4, 0.0), dt, dom), vel, density)
bench("vconf", lambda v: ext.vorticity_confinement(v, flags, dom, 0.1), vel)
bench("solve_pressure", lambda v: prs.solve_pressure(
    vel=v, flags=flags, dom=dom, cg_accuracy=1e-3, cg_max_iter_fac=1.5,
    preconditioner=params.preconditioner), vel)
_, _, _, it, res_ = jax.jit(lambda v: prs.solve_pressure(
    vel=v, flags=flags, dom=dom, cg_accuracy=1e-3, cg_max_iter_fac=1.5,
    preconditioner=params.preconditioner))(vel)
log(f"CG iters={int(it)} residual={float(res_):.3e}")
bench("full step", lambda s: smoke.smoke_step(s, dom, params), st)
log("done")
