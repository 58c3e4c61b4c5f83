"""Level-set surface tracking with surface tension.

Port of reference scenes/surfaceTension.py: a centered falling liquid
block, per-step fast-march reinit with velocity transport, ghost-fluid
pressure solve with curvature-based surface tension, mesh extraction.

Headless: `python scenes/surfaceTension.py [frames]` (default 40).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

surfaceTension = 0.1
dim = 3
res = 40
gs = Vec3(res, res, res)
s = Solver(name='main', gridSize=gs, dim=dim)
s.timestep = 0.25

accuracy = 5e-4
useMarching = True
lsOrder = 1

curv = s.create(RealGrid)
flags = s.create(FlagGrid)
vel = s.create(MACGrid)
pressure = s.create(RealGrid)
mesh = s.create(Mesh)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
fluidbox = Box(parent=s, p0=gs * vec3(0.25, 0.25, 0.25),
               p1=gs * vec3(0.75, 0.75, 0.75))
phi = fluidbox.computeLevelset()
flags.updateFromLevelset(phi)

if GUI:
    gui = Gui()
    gui.show()

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
for t in range(frames):
    mantaMsg('\nFrame %i, simulation time %f' % (s.frame, s.timeTotal))

    if useMarching:
        phi.reinitMarching(flags=flags, velTransport=vel)
    else:
        extrapolateLsSimple(phi=phi, distance=5, inside=False)
        extrapolateLsSimple(phi=phi, distance=5, inside=True)
        extrapolateMACSimple(flags=flags, vel=vel, distance=5)

    advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=lsOrder)
    phi.setBoundNeumann(bWidth)
    flags.updateFromLevelset(phi)

    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    setWallBcs(flags=flags, vel=vel)

    getCurvature(curv=curv, grid=phi)
    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi,
                  curv=curv, surfTens=surfaceTension, cgAccuracy=accuracy)

    if dim == 3:
        phi.createMesh(mesh)
    s.step()

mantaMsg("surfaceTension: done, %d mesh tris" % mesh.numTris(), 0)
