"""Smoke sim with numpy-array interop (numpyconvert.cpp plugin surface).
Port of reference scenes/numpy_array_simple.py:1-50.

Run: PYTHONPATH=. python scenes/numpy_array_simple.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *
import numpy as np

res = 64
gs = vec3(res, res, 1)
s = Solver(name="main", gridSize=gs, dim=2)

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)
tmp = s.create(RealGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
setOpenBound(flags, bWidth, "yY", FlagOutflow | FlagEmpty)
source = s.create(Cylinder, center=gs * vec3(0.5, 0.1, 0.5),
                  radius=res * 0.14, z=gs * vec3(0, 0.02, 0))

npArray = np.ones([res, res], dtype=np.float32)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 400
for t in range(n_frames):
    mantaMsg("\nFrame %i" % s.frame)
    source.applyToGrid(grid=density, value=1)
    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    resetOutflow(flags=flags, real=density)

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -4e-3, 0),
                flags=flags)
    solvePressure(flags=flags, vel=vel, pressure=pressure)

    # numpyTest equivalent (test.cpp): add a constant through numpy interop
    d = density.to_numpy()
    density.from_numpy(d + 0.01 * npArray[None, :, :])

    # grid conversion from numpyconvert.cpp plugins
    copyArrayToGridReal(target=tmp, source=npArray)

    s.step()

mantaMsg("numpy_array_simple done: density max %.3f, tmp max %.3f"
         % (density.getMax(), tmp.getMax()))
