"""CG-iters/sec north-star re-record (VERDICT r4 item 6).

Measures the developed-state pressure solve to 1e-4 at 128^3 (smoke bench
config, 30 warm steps) through the PRODUCTION paths:
- whole-solve-in-VMEM Pallas CG (ops/pressure_pallas.py, the TPU default)
- XLA CG (MANTA_NO_PALLAS_CG=1 path, what the round-3 7947 iters/s row
  measured)
- MG auto-selection path for reference (MANTA_NO_AUTO_MG unset)

Run (idle TPU host): python tools/profile_cg_iters.py [res]
Match: reference GridCg iterate loop, plugin/pressure.cpp:438-441.
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

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.core.shapes import Sphere
from mantaflow_tpu.models import smoke
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
for _ in range(30):
    st = step(st)
float(st.vel.sum())           # forced fetch (axon tunnel)
log("state developed (30 steps)")
flags, vel = st.flags, st.vel


def measure(name, **kw):
    fn = jax.jit(lambda v: prs.solve_pressure(
        vel=v, flags=flags, dom=dom, cg_accuracy=1e-4,
        cg_max_iter_fac=3.0, **kw))
    out = fn(vel)
    float(out[1].sum())
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = fn(vel)
    float(out[1].sum())
    ms = (time.time() - t0) / n * 1000.0
    iters, rn = int(out[3]), float(out[4])
    log(f"{name}: {ms:.2f} ms, iters={iters}, residual={rn:.3e}"
        + (f" -> {iters / ms * 1000:.0f} CG iters/sec" if iters > 0 else ""))


# production default: Pallas VMEM CG (auto-MG is skipped when the Pallas
# solver takes the solve — pressure.py:556-561)
measure("pallas VMEM CG @1e-4")
os.environ["MANTA_NO_PALLAS_CG"] = "1"
os.environ["MANTA_NO_AUTO_MG"] = "1"
measure("XLA CG @1e-4 (r3 metric path)")
del os.environ["MANTA_NO_AUTO_MG"]
measure("XLA path with auto-MG @1e-4")
del os.environ["MANTA_NO_PALLAS_CG"]
log("done")
