"""Very simple FLIP without level set or resampling. Port of reference
scenes/flip01_simple.py:1-75 onto the mantaflow_tpu scene API."""

import os

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
from mantaflow_tpu import *

dim = 2
particleNumber = 2
res = 64
gs = vec3(res, res, res)
if dim == 2:
    gs = vec3(res, res, 1)
    particleNumber = 3  # use more particles in 2d
s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.5

flags = s.create(FlagGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)

flags.initDomain(boundaryWidth=0)
fluidbox = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
phiInit = fluidbox.computeLevelset()
flags.updateFromLevelset(phiInit)

sampleFlagsWithParticles(flags=flags, parts=pp,
                         discretization=particleNumber, randomness=0.2)

if GUI:
    gui = Gui()
    gui.show()

frames = int(os.environ.get("FRAMES", 2500))
for t in range(frames):
    mantaMsg("\nFrame %i, simulation time %f" % (s.frame, s.timeTotal))

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)
    mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                  partVel=pVel, weight=tmpVec3)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)

    addGravity(flags=flags, vel=vel, gravity=(0, -0.002, 0))

    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure)
    setWallBcs(flags=flags, vel=vel)

    extrapolateMACSimple(flags=flags, vel=vel)

    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.97)
    s.step()

    if t % 25 == 24:
        p = pp.to_numpy()
        print("  particles=%d  mean y=%.2f  maxAbsVel=%.3f" %
              (p.shape[0], p[:, 1].mean(), np.abs(vel.to_numpy()).max()))
