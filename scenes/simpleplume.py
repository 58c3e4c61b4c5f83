"""Buoyant smoke plume with a noise-textured source — the hello-world scene.
Port of reference scenes/simpleplume.py:1-56.

Run: PYTHONPATH=. python scenes/simpleplume.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

res = 64
gs = vec3(res, int(1.5 * res), res)
s = FluidSolver(name="main", gridSize=gs)

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)

noise = s.create(NoiseField, loadFromFile=True)
noise.posScale = vec3(45)
noise.clamp = True
noise.clampNeg = 0
noise.clampPos = 1
noise.valOffset = 0.75
noise.timeAnim = 0.2

source = s.create(Cylinder, center=gs * vec3(0.5, 0.1, 0.5),
                  radius=res * 0.14, z=gs * vec3(0, 0.02, 0))

flags.initDomain()
flags.fillGrid()

if GUI:
    gui = Gui()
    gui.show()

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 250
for t in range(n_frames):
    mantaMsg("\nFrame %i" % s.frame)
    if t < 100:
        densityInflow(flags=flags, density=density, noise=noise,
                      shape=source, scale=1, sigma=0.5)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2, strength=1.0)

    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -6e-4, 0),
                flags=flags)

    solvePressure(flags=flags, vel=vel, pressure=pressure)
    s.step()

mantaMsg("simpleplume done: density max %.3f" % density.getMax())
