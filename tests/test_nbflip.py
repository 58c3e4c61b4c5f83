"""Narrow-band FLIP (flip05_nbflip.py port): grid/particle velocity
combination in the band, levelset join, adjustNumber with narrowBand."""
import numpy as np

from mantaflow_tpu import *


def test_nbflip_dam():
    dim, res = 2, 40
    gs = vec3(res, res, 1)
    s = Solver(name="nb", gridSize=gs, dim=dim)
    s.timestep = 0.8
    s.cfl = 3.0
    minParticles = pow(2, dim)
    narrowBand = 3
    combineBandWidth = narrowBand - 1

    flags = s.create(FlagGrid)
    phi = s.create(LevelsetGrid)
    phiParts = s.create(LevelsetGrid)
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
    fluidDam = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.8, 1))
    phi.join(fluidDam.computeLevelset())
    flags.updateFromLevelset(phi)
    sampleLevelsetWithParticles(phi=phi, flags=flags, parts=pp,
                                discretization=2, randomness=0.1)
    mapGridToPartsVec3(source=vel, parts=pp, target=pVel)
    n0 = int(pp.parts.active_mask().sum())

    for step in range(12):
        maxVel = vel.getMaxAbs()
        s.adaptTimestep(maxVel)
        mapPartsToMAC(vel=velParts, flags=flags, velOld=velOld, parts=pp,
                      partVel=pVel, weight=mapWeights)
        extrapolateMACFromWeight(vel=velParts, distance=2, weight=mapWeights)
        combineGridVel(vel=velParts, weight=mapWeights, combineVel=vel,
                       phi=phi, narrowBand=combineBandWidth, thresh=0)
        velOld.copyFrom(vel)
        addGravity(flags=flags, vel=vel, gravity=vec3(0, -0.02, 0))
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure, phi=phi)
        setWallBcs(flags=flags, vel=vel)
        extrapolateMACSimple(flags=flags, vel=vel,
                             distance=int(maxVel * 1.25 + 2.0))
        flipVelocityUpdate(vel=vel, velOld=velOld, flags=flags, parts=pp,
                           partVel=pVel, flipRatio=0.95)
        pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                        deleteInObstacle=False)
        advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=1)
        flags.updateFromLevelset(phi)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        gridParticleIndex(parts=pp, flags=flags, indexSys=pindex, index=gpi)
        unionParticleLevelset(pp, pindex, flags, gpi, phiParts)
        phi.addConst(1.0)
        phi.join(phiParts)
        extrapolateLsSimple(phi=phi, distance=narrowBand + 2, inside=True)
        flags.updateFromLevelset(phi)
        pVel.setSource(vel, isMAC=True)
        phi.setBoundNeumann(0)
        adjustNumber(parts=pp, vel=vel, flags=flags,
                     minParticles=minParticles,
                     maxParticles=2 * minParticles, phi=phi,
                     narrowBand=narrowBand)
        s.step()

    p = pp.to_numpy()[np.asarray(pp.parts.active_mask())[:pp.pySize()]] \
        if pp.pySize() else pp.to_numpy()
    act = np.asarray(pp.parts.active_mask())
    pos = np.asarray(pp.parts.pos)[act]
    n1 = act.sum()
    assert 200 < n1 < n0  # narrow band culls interior but keeps the band
    assert np.isfinite(pos).all()
    # dam collapsed: fluid surface dropped and spread right
    d = np.asarray(phi.data)
    assert np.isfinite(d).all()
    # the dam top slumped: the cell just below the initial top surface at
    # the dam's far-left is no longer deep fluid OR fluid spread rightward
    top_dropped = d[0, 30, 2] > -0.5
    spread = (d[0, 3, 20:] < 0).any()
    assert top_dropped or spread
    # particles live only near the surface band (narrow-band property):
    from mantaflow_tpu.core.interp import interpol
    import jax.numpy as jnp
    phiv = np.asarray(interpol(phi.data, jnp.asarray(pos[:, 0]),
                               jnp.asarray(pos[:, 1]),
                               jnp.asarray(pos[:, 2])))
    assert (phiv > -narrowBand - 1.5).mean() > 0.95
