"""Free-surface levelset liquid (drop into basin, ghost fluid pressure,
optional outflow). Port of reference scenes/freesurface.py:1-90 onto the
mantaflow_tpu scene API."""

import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
from mantaflow_tpu import *

dim = 3
res = 64
gs = Vec3(res, res, res if dim == 3 else 1)
s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.15

ghostFluid = True
doOpen = False
accuracy = 5e-4

phi = s.create(LevelsetGrid)
flags = s.create(FlagGrid)
vel = s.create(MACGrid)
pressure = s.create(RealGrid)
mesh = s.create(Mesh)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
basin = Box(s, p0=gs * Vec3(0, 0, 0), p1=gs * Vec3(1, 0.2, 1))
drop = Sphere(s, center=gs * Vec3(0.5, 0.5, 0.5), radius=res * 0.125)
phi.setConst(1e10)
phi.join(basin.computeLevelset())
phi.join(drop.computeLevelset())
flags.updateFromLevelset(phi)

if doOpen:
    setOpenBound(flags, bWidth, "xXzZ", FlagOutflow | FlagEmpty)

if GUI:
    gui = Gui()
    gui.show()

frames = int(os.environ.get("FRAMES", 1000))
for t in range(frames):
    mantaMsg("\nFrame %i, simulation time %f" % (s.frame, s.timeTotal))

    extrapolateLsSimple(phi=phi, distance=5, inside=False)
    extrapolateLsSimple(phi=phi, distance=5, inside=True)
    extrapolateMACSimple(flags=flags, vel=vel, distance=5)

    advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=2, clampMode=2)

    phi.setBound(bWidth, 1.0)
    if doOpen:
        resetOutflow(flags=flags, phi=phi)
    flags.updateFromLevelset(phi)

    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    addGravity(flags=flags, vel=vel, gravity=Vec3(0, -0.025, 0))

    setWallBcs(flags=flags, vel=vel)
    if ghostFluid:
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgMaxIterFac=0.5, cgAccuracy=accuracy, phi=phi)
    else:
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgMaxIterFac=0.5, cgAccuracy=accuracy)

    if dim == 3:
        phi.createMesh(mesh)

    s.step()

    if t % 10 == 9:
        fluid_cells = flags.countCells(FlagFluid)
        print("  fluid cells=%d  maxAbsVel=%.3f  mesh tris=%d" %
              (fluid_cells, np.abs(vel.to_numpy()).max(), mesh.numTris()))
