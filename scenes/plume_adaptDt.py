"""Buoyant smoke with adaptive time-stepping (CFL-3).
Port of reference scenes/plume_adaptDt.py:1-80.

Run: PYTHONPATH=. python scenes/plume_adaptDt.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

dim = 3
res = 64
gs = vec3(res, int(1.5 * res), res)
if dim == 2:
    gs = vec3(res, int(1.5 * res), 1)
s = FluidSolver(name="main", gridSize=gs, dim=dim)

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100

s.frameLength = 1.2
s.timestepMin = 0.2
s.timestepMax = 2.0
s.cfl = 3.0
s.timestep = (s.timestepMax + s.timestepMin) * 0.5

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)

noise = s.create(NoiseField, loadFromFile=True)
noise.posScale = vec3(45)
noise.clamp = True
noise.clampNeg = 0
noise.clampPos = 1
noise.valScale = 1
noise.valOffset = 0.75
noise.timeAnim = 0.2

flags.initDomain()
flags.fillGrid()
timings = Timings()

source = s.create(Cylinder, center=gs * vec3(0.5, 0.1, 0.5),
                  radius=res * 0.14, z=gs * vec3(0, 0.02, 0))

lastFrame = -1
while s.frame < frames:
    maxvel = vel.getMax()
    s.adaptTimestep(maxvel)
    mantaMsg("\nFrame %i, time-step size %f" % (s.frame, s.timestep))

    if s.timeTotal < 50.0:
        densityInflow(flags=flags, density=density, noise=noise,
                      shape=source, scale=1, sigma=0.5)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -6e-3, 0),
                flags=flags)

    solvePressure(flags=flags, vel=vel, pressure=pressure)
    setWallBcs(flags=flags, vel=vel)

    lastFrame = s.frame
    s.step()

mantaMsg("plume_adaptDt done: density max %.3f" % density.getMax())
