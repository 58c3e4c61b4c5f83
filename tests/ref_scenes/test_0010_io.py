"""Constant-value grid IO vs reference-binary goldens.

Compact port of tools/tests/test_0010_io.py: setConst on Real/MAC/Int
grids, exact (threshold=0) comparison against the reference .uni goldens.
"""
from mantaflow_tpu import *


def scene(dtg):
    s = Solver(name='main', gridSize=vec3(10, 20, 30), dim=3)
    density = s.create(RealGrid)
    vel = s.create(MACGrid)
    flags = s.create(IntGrid)

    density.setConst(0.123)
    vel.setConst(vec3(0.1, 0.2, 0.3))
    flags.setConst(7193)

    dtg("dens", density, 0.0)
    dtg("vel", vel, 0.0)
    dtg("flag", flags, 0.0)
