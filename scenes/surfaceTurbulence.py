"""Surface wave turbulence on a FLIP dam (Mercier et al. SIGGRAPH Asia 2015).
Port of reference scenes/surfaceTurbulence.py:1-151.

Run: PYTHONPATH=. python scenes/surfaceTurbulence.py [frames]"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from mantaflow_tpu import *
from mantaflow_tpu.scene.papi import particleSurfaceTurbulence

dim = 3
res = 32
gs = vec3(res, res, res)
s = Solver(name="main", gridSize=gs, dim=dim)
s.timestep = 0.8
minParticles = pow(2, dim)
radiusFactor = 1.0

flags = s.create(FlagGrid)
phi = s.create(LevelsetGrid)
vel = s.create(MACGrid)
velOld = s.create(MACGrid)
pressure = s.create(RealGrid)
tmpVec3 = s.create(VecGrid)

surfacePointsDisplaced = s.create(BasicParticleSystem)
spdDummy = surfacePointsDisplaced.create(PdataVec3)

pp = s.create(BasicParticleSystem)
pVel = pp.create(PdataVec3)
pPrevPos = pp.create(PdataVec3)

surfacePoints = s.create(BasicParticleSystem)
surfaceNormal = surfacePoints.create(PdataVec3)
surfaceWaveH = surfacePoints.create(PdataReal)
surfaceWaveDtH = surfacePoints.create(PdataReal)
surfaceWaveSource = surfacePoints.create(PdataReal)
surfaceWaveSeedAmplitude = surfacePoints.create(PdataReal)
surfaceWaveSeed = surfacePoints.create(PdataReal)

pindex = s.create(ParticleIndexSystem)
gpi = s.create(IntGrid)

bWidth = 1
flags.initDomain(boundaryWidth=bWidth)

# breaking dam (reference setup==0)
fluidbox = s.create(Box, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.4, 1))
phi.copyFrom(fluidbox.computeLevelset())
flags.updateFromLevelset(phi)
sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                            discretization=2, randomness=0.35)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 500
for t in range(n_frames):
    pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                    deleteInObstacle=False)

    mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                  partVel=pVel, weight=tmpVec3)
    extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
    markFluidCells(parts=pp, flags=flags)

    gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
    unionParticleLevelset(pp, pindex, flags, gpi, phi, radiusFactor)
    resetOutflow(flags=flags, parts=pp, index=gpi, indexSys=pindex)
    extrapolateLsSimple(phi=phi, distance=4, inside=True)

    addGravity(flags=flags, vel=vel, gravity=(0, -0.001, 0))
    setWallBcs(flags=flags, vel=vel)
    solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
    setWallBcs(flags=flags, vel=vel)

    pVel.setSource(vel, isMAC=True)
    adjustNumber(parts=pp, vel=vel, flags=flags,
                 minParticles=1 * minParticles,
                 maxParticles=2 * minParticles, phi=phi,
                 radiusFactor=radiusFactor)

    extrapolateMACSimple(flags=flags, vel=vel)

    flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                       partVel=pVel, flipRatio=0.97)

    particleSurfaceTurbulence(
        flags=flags, coarseParts=pp, coarsePartsPrevPos=pPrevPos,
        surfPoints=surfacePoints, surfaceNormals=surfaceNormal,
        surfaceWaveH=surfaceWaveH, surfaceWaveDtH=surfaceWaveDtH,
        surfacePointsDisplaced=surfacePointsDisplaced,
        surfaceWaveSource=surfaceWaveSource,
        surfaceWaveSeed=surfaceWaveSeed,
        surfaceWaveSeedAmplitude=surfaceWaveSeedAmplitude, res=res,
        nbSurfaceMaintenanceIterations=6,
        surfaceDensity=12,
        outerRadius=1.0 * radiusFactor,
        dt=0.005,
        waveSpeed=32,
        waveDamping=0.05,
        waveSeedFrequency=4.0,
        waveMaxAmplitude=0.5,
        waveMaxSeedingAmplitude=0.5,
        waveMaxFrequency=128.0,
        waveSeedingCurvatureThresholdRegionCenter=0.025,
        waveSeedingCurvatureThresholdRegionRadius=0.01,
        waveSeedStepSizeRatioOfMax=0.05)

    spdDummy.setConst(vec3(1, 1, 1))
    s.step()

mantaMsg("surfaceTurbulence done: %d coarse, %d surface, %d displaced"
         % (pp.pySize(), surfacePoints.pySize(),
            surfacePointsDisplaced.pySize()))
