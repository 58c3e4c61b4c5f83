# Flagship fused pipeline: 128^3 smoke, whole step as one XLA program with
# in-program CFL-adaptive dt. Run: PYTHONPATH=. python scenes/smoke_fused_128.py
import numpy as np

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.core.shapes import Sphere
from mantaflow_tpu.models import smoke
from mantaflow_tpu.scene.io_api import save_checkpoint

res = 128
dom = Domain(size=(res, res, res), dim=3)
params = smoke.SmokeParams(buoyancy=(0.0, -6e-4, 0.0),
                           vorticity_confinement=0.1, window=3,
                           adaptive_dt=True, cfl=3.0, dt_max=2.0)
src = Sphere(center=(res / 2, res * 0.1, res / 2), radius=res * 0.14)
state = smoke.make_smoke_state(dom, params, source_shape=src)

for frame in range(10):
    state = smoke.smoke_run(state, dom, params, 10)
    d = np.asarray(state.density)
    print(f"frame {frame}: density sum={d.sum():.1f} max={d.max():.3f} "
          f"dt={float(state.ts.dt):.3f}")
save_checkpoint("smoke128_final.npz", state)
