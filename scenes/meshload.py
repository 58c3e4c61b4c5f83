"""Rasterize an obj mesh into an obstacle SDF and run smoke around it.

Port of reference scenes/meshload.py (the torus obj ships as test data at
tests/testdata_ref/test_0050_meshload.obj).

Headless: `python scenes/meshload.py [frames]` (default 60).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

meshfile = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "tests", "testdata_ref", "test_0050_meshload.obj")

res = 50
gs = vec3(res, res, res)
s = Solver(name='main', gridSize=gs, dim=3)

flags = s.create(FlagGrid)
density = s.create(RealGrid)
vel = s.create(MACGrid)
pressure = s.create(RealGrid)
phiObs = s.create(LevelsetGrid)
mesh = s.create(Mesh)

mesh.load(meshfile)
mesh.scale(vec3(res / 3.0))
mesh.offset(gs * (Vec3(0.5) + Vec3(0.1, 0.05, 0)))
mesh.computeLevelset(phiObs, 2.)

flags.initDomain()
setObstacleFlags(flags=flags, phiObs=phiObs)
flags.fillGrid()

if GUI:
    gui = Gui()
    gui.show()

source = s.create(Cylinder, center=gs * vec3(0.35, 0.2, 0.5),
                  radius=res * 0.15, z=gs * vec3(0, 0.05, 0))

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
for t in range(frames):
    source.applyToGrid(grid=density, value=1.)
    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2,
                       strength=1.0)
    setWallBcs(flags=flags, vel=vel)
    addBuoyancy(density=density, vel=vel, gravity=vec3(0, -1e-3, 0),
                flags=flags)
    solvePressure(flags=flags, vel=vel, pressure=pressure)
    s.step()
    if t % 20 == 19:
        mantaMsg("frame %d density sum %.1f" % (t + 1, density.getL1()), 0)

mantaMsg("meshload: done", 0)
