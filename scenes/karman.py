"""Karman vortex street: flow past a cylinder with inflow walls and
2nd-order (fraction) obstacle boundaries. Port of reference
scenes/karman.py:1-90 onto the mantaflow_tpu scene API."""

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
from mantaflow_tpu import *

sec_order_bc = True
dim = 2
res = 64
gs = vec3(2 * res, res, res if dim == 3 else 1)

s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 1.0

flags = s.create(FlagGrid)
density = s.create(RealGrid)
vel = s.create(MACGrid)
pressure = s.create(RealGrid)
fractions = s.create(MACGrid)
phiWalls = s.create(LevelsetGrid)

flags.initDomain(inflow="xX", phiWalls=phiWalls, boundaryWidth=0)

obstacle = Cylinder(s, center=gs * vec3(0.25, 0.5, 0.5), radius=res * 0.2,
                    z=gs * vec3(0, 0, 1.0))
phiObs = obstacle.computeLevelset()
densInflow = Cylinder(s, center=gs * vec3(0.25, 0.5, 0.5), radius=res * 0.21,
                      z=gs * vec3(0, 0, 1.0))

phiObs.join(phiWalls)
updateFractions(flags=flags, phiObs=phiObs, fractions=fractions)
setObstacleFlags(flags=flags, phiObs=phiObs, fractions=fractions)
flags.fillGrid()

velInflow = vec3(0.9, 0, 0)
vel.setConst(velInflow)

# randomize the y component a little, as the reference does
noise = s.create(NoiseField, loadFromFile=True)
noise.posScale = vec3(75)
noise.clamp = True
noise.clampNeg = -1.0
noise.clampPos = 1.0
testall = s.create(RealGrid)
testall.setConst(-1.0)
addNoise(flags=flags, density=density, noise=noise, sdf=testall, scale=0.1)
setComponent(target=vel, source=density, component=1)
density.setConst(0.0)

cgAcc = 1e-4
cgIter = 5

frames = int(__import__("os").environ.get("FRAMES", 200))
for t in range(frames):
    mantaMsg("\nFrame %i, simulation time %f" % (s.frame, s.timeTotal))

    densInflow.applyToGrid(grid=density, value=2.0)

    advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2,
                       orderSpace=1)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    if sec_order_bc:
        extrapolateMACSimple(flags=flags, vel=vel, distance=2, intoObs=True)
        setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)
        setInflowBcs(vel=vel, dir="xX", value=velInflow)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      fractions=fractions, cgAccuracy=cgAcc,
                      cgMaxIterFac=cgIter)
        extrapolateMACSimple(flags=flags, vel=vel, distance=5, intoObs=True)
        setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)
    else:
        setWallBcs(flags=flags, vel=vel)
        setInflowBcs(vel=vel, dir="xX", value=velInflow)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgAccuracy=cgAcc, cgMaxIterFac=cgIter)
        setWallBcs(flags=flags, vel=vel)

    setInflowBcs(vel=vel, dir="xX", value=velInflow)
    s.step()

    if t % 40 == 39:
        v = vel.to_numpy()
        print("  maxAbsVel=%.3f  wake u=%.3f" %
              (np.abs(v).max(), v[0][0, res // 2, res:].mean()))
        projectPpmFull(density, "/tmp/karman_%04d.ppm" % t, 0, 1.0)
