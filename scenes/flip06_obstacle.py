"""Narrow-band FLIP + 2nd-order wall BCs (fractions) + adaptive dt, with a
sphere obstacle. Port of reference scenes/flip06_obstacle.py:1-159.

Run: PYTHONPATH=. python scenes/flip06_obstacle.py [frames] [res]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

dim = 3
res = int(sys.argv[2]) if len(sys.argv) > 2 else 48
gs = vec3(res, res, res)
s = Solver(name="main", gridSize=gs, dim=dim)

narrowBand = 3
minParticles = pow(2, dim)
frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200

s.frameLength = 0.8
s.cfl = 3.0
s.timestep = s.frameLength
s.timestepMin = s.frameLength / 4.0
s.timestepMax = s.frameLength * 4.0

flags = s.create(FlagGrid)
phi = s.create(LevelsetGrid)
phiParts = s.create(LevelsetGrid)
phiObs = s.create(LevelsetGrid)

vel = s.create(MACGrid)
velOld = s.create(MACGrid)
velParts = s.create(MACGrid)

pressure = s.create(RealGrid)
fractions = s.create(MACGrid)
tmpVec3 = s.create(VecGrid)

pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
mesh = s.create(Mesh)

pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth, phiWalls=phiObs)
phi.setConst(999.0)

# standing dam
fluidbox1 = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(1.0, 0.3, 1))
phi.join(fluidbox1.computeLevelset())
fluidbox2 = Box(s, p0=gs * vec3(0.1, 0, 0), p1=gs * vec3(0.2, 0.75, 1))
phi.join(fluidbox2.computeLevelset())

sphere = Sphere(s, center=gs * vec3(0.66, 0.3, 0.5), radius=res * 0.2)
phiObs.join(sphere.computeLevelset())

flags.updateFromLevelset(phi)
phi.subtract(phiObs)
sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                            discretization=2, randomness=0.05)

updateFractions(flags=flags, phiObs=phiObs, fractions=fractions,
                boundaryWidth=bWidth)
setObstacleFlags(flags=flags, phiObs=phiObs, fractions=fractions)

lastFrame = -1
while s.frame < frames:
    maxVel = vel.getMax()
    s.adaptTimestep(maxVel)
    mantaMsg("\nFrame %i, time-step size %f" % (s.frame, s.timestep))

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False, stopInObstacle=False)
    pushOutofObs(parts=pp, flags=flags, phiObs=phiObs)

    advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=1)
    advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
    unionParticleLevelset(pp, pindex, flags, gpi, phiParts)

    phi.addConst(1.0)  # shrink slightly
    phi.join(phiParts)
    extrapolateLsSimple(phi=phi, distance=narrowBand + 2, inside=True)
    extrapolateLsSimple(phi=phi, distance=3)
    phi.setBoundNeumann(0)
    flags.updateFromLevelset(phi)

    mapPartsToMAC(vel=velParts, flags=flags, velOld=velOld, parts=pp,
                  partVel=pVel, weight=tmpVec3)
    extrapolateMACFromWeight(vel=velParts, distance=2, weight=tmpVec3)
    combineGridVel(vel=velParts, weight=tmpVec3, combineVel=vel, phi=phi,
                   narrowBand=(narrowBand - 1), thresh=0)
    velOld.copyFrom(vel)

    addGravity(flags=flags, vel=vel, gravity=(0, -0.001, 0))

    extrapolateMACSimple(flags=flags, vel=vel, distance=2, intoObs=True)
    setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)

    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi,
                  fractions=fractions)

    extrapolateMACSimple(flags=flags, vel=vel, distance=4, intoObs=True)
    setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)

    if dim == 3:
        phiParts.copyFrom(phi)
        phiParts.setBound(0.5, 0)
        phiParts.createMesh(mesh)

    pVel.setSource(vel, isMAC=True)
    adjustNumber(parts=pp, vel=vel, flags=flags,
                 minParticles=1 * minParticles,
                 maxParticles=2 * minParticles, phi=phi, exclude=phiObs,
                 narrowBand=narrowBand)
    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.97)

    s.step()
    lastFrame = s.frame

mantaMsg("flip06 done: %d particles, %d mesh tris, velmax %.4f"
         % (pp.pySize(), mesh.numTris(), vel.getMaxAbs()))
