"""FLIP with adaptive time stepping (flip02 pattern + CFL-1.5 adaptTimestep
and an obstacle column). Port of reference scenes/flip04_adaptDt.py:1-160
(breaking-dam setup, res scaled down for headless runs).

Run: PYTHONPATH=. python scenes/flip04_adaptDt.py [frames] [res]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

dim = 3
res = int(sys.argv[2]) if len(sys.argv) > 2 else 48
gs = vec3(res, res, res)
s = Solver(name="main", gridSize=gs, dim=dim)

frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200

s.frameLength = 0.6
s.timestepMin = 0.1
s.timestepMax = 2.0
s.cfl = 1.5
s.timestep = (s.timestepMax + s.timestepMin) * 0.5

minParticles = pow(2, dim)
timings = Timings()
radiusFactor = 1.0

flags = s.create(FlagGrid)
phi = s.create(LevelsetGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)
tstGrid = s.create(RealGrid)

pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
pTest = pp.create(PdataReal)

pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)

flags.initDomain(boundaryWidth=0)

# breaking dam (reference setup==0)
fluidbox = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
phi.copyFrom(fluidbox.computeLevelset())
flags.updateFromLevelset(phi)

# obstacle column (after updateFromLevelset)
obsBox = Box(s, p0=gs * vec3(0.7, 0.0, 0.5), p1=gs * vec3(0.8, 1.0, 0.8))
obsBox.applyToGrid(grid=flags, value=FlagObstacle)

sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                            discretization=2, randomness=0.05)
mapGridToPartsVec3(source=vel, parts=pp, target=pVel)

testInitGridWithPos(tstGrid)
pTest.setConst(0.1)

lastFrame = -1
while s.frame < frames:
    maxVel = vel.getMax()
    s.adaptTimestep(maxVel)
    mantaMsg("\nFrame %i, time-step size %f" % (s.frame, s.timestep))

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)

    mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                  partVel=pVel, weight=tmpVec3)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)

    gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
    unionParticleLevelset(pp, pindex, flags, gpi, phi, radiusFactor)
    extrapolateLsSimple(phi=phi, distance=4, inside=True)

    addGravity(flags=flags, vel=vel, gravity=(0, -0.003, 0))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
    setWallBcs(flags=flags, vel=vel)

    pVel.setSource(vel, isMAC=True)
    pTest.setSource(tstGrid)
    adjustNumber(parts=pp, vel=vel, flags=flags,
                 minParticles=1 * minParticles,
                 maxParticles=2 * minParticles, phi=phi,
                 radiusFactor=radiusFactor)

    extrapolateMACSimple(flags=flags, vel=vel,
                         distance=(int(maxVel * 1.5) + 2))

    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.97)

    s.step()
    lastFrame = s.frame

mantaMsg("flip04 done: %d particles, velmax %.4f"
         % (pp.pySize(), vel.getMaxAbs()))
