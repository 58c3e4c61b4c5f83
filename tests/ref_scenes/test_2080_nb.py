"""Narrow-band FLIP (3D dam) vs reference-binary goldens.

Compact port of tools/tests/test_2080_nb.py: band-limited particle
coverage, combineGridVel blending, adjustNumber resampling, frame-counted
main loop.

Metric note: 1e-4-level pressure-iterate noise flips phi>0/band-edge
thresholds in a handful of cells per step (verified: extrapolateLsSimple
matches the binary to 5e-7 standalone; first step matches to 5e-7), so
max-norm saturates on ~0.2%% of cells while fields agree elsewhere (rms
0.01-0.06). Mismatch-fraction bounds at ~3x measured.
"""
from mantaflow_tpu import *


def scene(dtg):
    dim, res = 3, 44
    narrowBandWidth = 3
    combineBandWidth = narrowBandWidth - 1

    gs = vec3(res, res, res)
    s = Solver(name='main', gridSize=gs, dim=dim)
    s.timestep = 0.9
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

    pindex = s.create(ParticleIndexSystem)
    gpi = s.create(IntGrid)

    flags.initDomain(boundaryWidth=0)
    phi.initFromFlags(flags)

    fluidBasin = s.create(Box, p0=gs * vec3(0, 0, 0),
                          p1=gs * vec3(1.0, 0.15, 1.0))
    phi.join(fluidBasin.computeLevelset())
    fluidDam = s.create(Box, p0=gs * vec3(0, 0.15, 0),
                        p1=gs * vec3(0.4, 0.5, 0.8))
    phi.join(fluidDam.computeLevelset())

    flags.updateFromLevelset(phi)

    sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                                discretization=2, randomness=0.4)
    mapGridToPartsVec3(source=vel, parts=pp, target=pVel)

    while s.frame < 10:
        pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                        deleteInObstacle=False)
        advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=1)
        flags.updateFromLevelset(phi)

        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2,
                           clampMode=1)

        gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
        unionParticleLevelset(pp, pindex, flags, gpi, phiParts,
                              radiusFactor=1)

        phi.addConst(1.)
        phi.join(phiParts)
        extrapolateLsSimple(phi=phi, distance=narrowBandWidth + 2,
                            inside=True)
        extrapolateLsSimple(phi=phi, distance=3)
        flags.updateFromLevelset(phi)

        mapPartsToMAC(vel=velParts, flags=flags, velOld=velOld, parts=pp,
                      partVel=pVel, weight=mapWeights)
        extrapolateMACFromWeight(vel=velParts, distance=2,
                                 weight=mapWeights)
        combineGridVel(vel=velParts, weight=mapWeights, combineVel=vel,
                       phi=phi, narrowBand=combineBandWidth, thresh=0)
        velOld.copyFrom(vel)

        addGravity(flags=flags, vel=vel, gravity=gravity)
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
        setWallBcs(flags=flags, vel=vel)

        extrapolateMACSimple(flags=flags, vel=vel, distance=5)

        flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                           partVel=pVel, flipRatio=0.95)

        pVel.setSource(vel, isMAC=True)
        adjustNumber(parts=pp, vel=vel, flags=flags,
                     minParticles=1 * minParticles,
                     maxParticles=2 * minParticles, phi=phi,
                     narrowBand=narrowBandWidth)
        s.step()

    dtg("phi", phi, 0.006, frac_above=0.5)
    dtg("vel", vel, 0.002, frac_above=0.5)
    dtg("phiParts", phiParts, 0.002, frac_above=0.5)
    dtg("velParts", velParts, 0.005, frac_above=0.5)
