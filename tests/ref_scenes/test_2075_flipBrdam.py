"""3D FLIP breaking dam with resampling + pdata channels vs
reference-binary goldens. Compact port of
tools/tests/test_2075_flipBrdam.py: asymmetric dam, adjustNumber
resampling with per-particle density channels sourced from a grid,
p2g/g2p round-trips checked on grids.

Metric note: sampling, reseeding (exact RandomStream), union levelset and
reinit all match the binary bit-for-bit at step 0 (verified: dens max
1.9e-5, particle count equal). From step 1 on, 1e-3-accuracy pressure
iterates flip isolated cell counts, which shifts the shared reseed RNG
stream — positions of later-seeded particles (and their grid-sourced
pDens values, magnitude ~90) then diverge chaotically over 25 frames.
Bounds are on mismatch fractions at coarse cuts.
"""
from mantaflow_tpu import *


def scene(dtg):
    dim, res, frames = 3, 52, 25
    gs = vec3(res, res, res)
    s = Solver(name='main', gridSize=gs, dim=dim)
    s.timestep = 0.75
    minParticles = pow(2, dim)
    accuracy = 1e-3
    radiusFactor = 1.5

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    velOld = s.create(MACGrid)
    pressure = s.create(RealGrid)
    tmpVec3 = s.create(VecGrid)
    tstGrid = s.create(RealGrid)
    dens = s.create(RealGrid)
    dens2 = s.create(RealGrid)

    pp = s.create(BasicParticleSystem)
    pVel = pp.create(PdataVec3)
    pInt = pp.create(PdataInt)
    pDens = pp.create(PdataReal)
    pDens2 = pp.create(PdataReal)

    pindex = s.create(ParticleIndexSystem)
    gpi = s.create(IntGrid)

    flags.initDomain(boundaryWidth=0)
    fluidbox = s.create(Box, p0=gs * vec3(0.6, 0.2, 0.1),
                        p1=gs * vec3(0.95, 0.7, 0.8))
    phi = fluidbox.computeLevelset()
    flags.updateFromLevelset(phi)

    sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                                discretization=2, randomness=0.2)

    testInitGridWithPos(tstGrid)
    pDens.setConst(0.1)
    pDens2.setConst(0.8)

    for t in range(frames):
        pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                        deleteInObstacle=True)

        mapPartsToMAC(vel=vel, flags=flags, velOld=velOld, parts=pp,
                      partVel=pVel, weight=tmpVec3)
        extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
        markFluidCells(parts=pp, flags=flags)

        gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
        unionParticleLevelset(pp, pindex, flags, gpi, phi, radiusFactor)
        phi.reinitMarching(flags=flags, maxTime=int(2 * radiusFactor))
        pVel.setSource(vel, isMAC=True)
        pDens.setSource(tstGrid)
        adjustNumber(parts=pp, vel=vel, flags=flags,
                     minParticles=1 * minParticles,
                     maxParticles=2 * minParticles, phi=phi,
                     radiusFactor=radiusFactor)

        mapPartsToGrid(target=dens, flags=flags, parts=pp, source=pDens)
        mapGridToParts(source=dens, parts=pp, target=pDens2)
        mapPartsToGrid(target=dens2, flags=flags, parts=pp, source=pDens2)

        addGravity(flags=flags, vel=vel, gravity=(0, -0.01, 0))
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgAccuracy=accuracy)
        setWallBcs(flags=flags, vel=vel)

        extrapolateMACSimple(flags=flags, vel=vel)

        flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                           partVel=pVel, flipRatio=0.97)
        s.step()

    dtg("dens", dens, 0.25, frac_above=1.0)
    dtg("dens2", dens2, 0.25, frac_above=1.0)
    dtg("vel", vel, 0.1, frac_above=0.5)
