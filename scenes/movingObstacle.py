"""Smoke past a moving obstacle (re-stamped flags + obstacle velocity).

Port of reference scenes/movingObstacle.py: the obstacle sphere is
re-rasterized each step along its path for 100 steps, wall BCs take the
obstacle velocity, then it stops.

Headless: `python scenes/movingObstacle.py [frames]` (default 150).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from mantaflow_tpu import *  # noqa: E402

dim = 2
res = 50
gs = vec3(res, res, 1 if dim == 2 else res)
s = Solver(name='main', gridSize=gs, dim=dim)

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
density = s.create(RealGrid)
pressure = s.create(RealGrid)
obsVel = s.create(MACGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)
flags.fillGrid()
setOpenBound(flags, bWidth, 'yY', FlagOutflow | FlagEmpty)

source = Box(parent=s, p0=gs * vec3(0.45, 0.1, 0.1),
             p1=gs * vec3(0.55, 0.9, 0.9))
source.applyToGrid(grid=density, value=1)

obsPos = vec3(0.2, 0.4, 0.5)
obsVelVec = vec3(0.6, 0.2, 0.0) * (1. / 100.) * float(res)
obsSize = 0.1
obsVel.setConst(obsVelVec)
obsVel.setBound(value=Vec3(0.), boundaryWidth=bWidth + 1)
obs = "dummy"
phiObs = "dummy2"

if GUI:
    gui = Gui()
    gui.show(True)

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
for t in range(frames):
    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
    resetOutflow(flags=flags, real=density)

    if t <= 100:
        flags.initDomain(boundaryWidth=bWidth)
        flags.fillGrid()
        setOpenBound(flags, bWidth, 'yY', FlagOutflow | FlagEmpty)

        del obs, phiObs
        obs = Sphere(parent=s, center=gs * obsPos + float(t) * obsVelVec,
                     radius=res * obsSize)
        phiObs = obs.computeLevelset()

        setObstacleFlags(flags=flags, phiObs=phiObs)
        flags.fillGrid()
        obs.applyToGrid(grid=density, value=0.)  # clear smoke inside
    elif t == 101:
        obsVel.setConst(Vec3(0.))

    setWallBcs(flags=flags, vel=vel, phiObs=phiObs, obvel=obsVel)
    solvePressure(flags=flags, vel=vel, pressure=pressure)
    s.step()
    if t % 50 == 49:
        mantaMsg("frame %d density sum %.1f" % (t + 1, density.getL1()), 0)

mantaMsg("movingObstacle: done", 0)
