"""APIC transfers + adjustNumber resampling."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *


def test_apic01_dam_2d():
    """apic01_simple.py port: APIC dam break stays stable and collapses."""
    res = 32
    gs = vec3(res, res, 1)
    s = Solver(name="main", gridSize=gs, dim=2)
    s.timestep = 0.5

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    mass = s.create(MACGrid)
    pressure = s.create(RealGrid)
    tmpVec3 = s.create(VecGrid)
    pp = s.create(BasicParticleSystem)
    pVel = pp.create(PdataVec3)
    pCx = pp.create(PdataVec3)
    pCy = pp.create(PdataVec3)
    pCz = pp.create(PdataVec3)

    flags.initDomain(boundaryWidth=0)
    fluidbox = Box(s, p0=gs * vec3(0, 0, 0), p1=gs * vec3(0.4, 0.6, 1))
    flags.updateFromLevelset(fluidbox.computeLevelset())
    sampleFlagsWithParticles(flags=flags, parts=pp, discretization=3,
                             randomness=0.2)
    n0 = pp.pySize()

    com0 = pp.to_numpy()[:, 0].mean()
    for t in range(20):
        pp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4,
                        deleteInObstacle=False)
        apicMapPartsToMAC(flags=flags, vel=vel, parts=pp, partVel=pVel,
                          cpx=pCx, cpy=pCy, cpz=pCz, mass=mass)
        tmpVec3.copyFrom(mass)
        extrapolateMACFromWeight(vel=vel, distance=2, weight=tmpVec3)
        markFluidCells(parts=pp, flags=flags)
        addGravity(flags=flags, vel=vel, gravity=(0, -0.002, 0))
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure)
        setWallBcs(flags=flags, vel=vel)
        extrapolateMACSimple(flags=flags, vel=vel)
        apicMapMACGridToParts(partVel=pVel, cpx=pCx, cpy=pCy, cpz=pCz,
                              parts=pp, vel=vel, flags=flags)
        s.step()

    p = pp.to_numpy()
    assert pp.pySize() == n0
    assert np.isfinite(p).all()
    assert p[:, 0].mean() > com0 + 0.3  # dam collapses rightward
    assert np.abs(np.asarray(pVel.data)).max() < 5.0
    # affine matrices picked up rotation/shear info (non-zero somewhere)
    assert float(jnp.abs(pCx.data).max()) > 1e-5


def test_apic_rigid_translation_preserved():
    """APIC p2g->g2p of a constant velocity field returns that velocity
    (affine matrices zero)."""
    res = 16
    s = Solver(name="x", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    pp = s.create(BasicParticleSystem)
    ball = Sphere(s, center=vec3(8, 8, 8), radius=4)
    sampleShapeWithParticles(shape=ball, flags=flags, parts=pp,
                             discretization=2, randomness=0.3)
    pVel = pp.create(PdataVec3)
    pCx = pp.create(PdataVec3)
    pCy = pp.create(PdataVec3)
    pCz = pp.create(PdataVec3)
    pVel.data = jnp.where(pp.parts.active_mask()[:, None],
                          jnp.array([0.3, -0.2, 0.1]), 0.0)
    vel = s.create(MACGrid)
    apicMapPartsToMAC(flags=flags, vel=vel, parts=pp, partVel=pVel,
                      cpx=pCx, cpy=pCy, cpz=pCz)
    apicMapMACGridToParts(partVel=pVel, cpx=pCx, cpy=pCy, cpz=pCz,
                          parts=pp, vel=vel, flags=flags)
    act = np.asarray(pp.parts.active_mask())
    pv = np.asarray(pVel.data)[act]
    # interior particles recover the constant velocity
    pos = np.asarray(pp.parts.pos)[act]
    interior = np.linalg.norm(pos - 8, axis=1) < 2.5
    np.testing.assert_allclose(pv[interior],
                               np.tile([0.3, -0.2, 0.1], (interior.sum(), 1)),
                               atol=1e-4)


def test_adjust_number():
    """adjustNumber kills out-of-phi particles and reseeds underfull cells."""
    res = 24
    s = Solver(name="x", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    vel = s.create(MACGrid)
    # fluid = left half box
    box = Box(s, p0=vec3(1, 1, 0), p1=vec3(12, 12, 1))
    box.applyToGrid(grid=flags, value=FlagFluid, respectFlags=flags)
    phi = box.computeLevelset()

    pp = s.create(BasicParticleSystem)
    # seed sparsely (1 per cell) and also some outside the fluid
    sampleFlagsWithParticles(flags=flags, parts=pp, discretization=1,
                             randomness=0.0)
    from mantaflow_tpu.ops.flip import particle_counts
    n_before = pp.pySize()

    adjustNumber(parts=pp, vel=vel, flags=flags, minParticles=4,
                 maxParticles=9, phi=phi)
    cnts = np.asarray(particle_counts(pp.parts, s.domain))
    fl_mask = (np.asarray(flags.data) & FlagFluid) != 0
    deep = np.asarray(phi.data) <= -1.5  # away from surface band
    inside = fl_mask & deep
    assert inside.any()
    assert cnts[inside].min() >= 4  # reseeded to min
    assert cnts[inside].max() <= 9  # culled to max
    n_active = int(pp.parts.active_mask().sum())
    assert n_active > n_before  # net growth from reseeding
