"""End-to-end FLIP: port of reference scenes/flip01_simple.py (2D breaking
dam, no levelset/resampling) with physical sanity checks."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *


def test_flip01_dam_2d():
    dim = 2
    particleNumber = 3
    res = 40
    gs = vec3(res, res, 1)
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
    n0 = pp.pySize()
    assert n0 > 1000  # dam region was seeded

    com_x = []
    for t in range(25):
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
        p = pp.to_numpy()
        com_x.append(p[:, 0].mean())

    p = pp.to_numpy()
    assert pp.pySize() == n0  # no particles lost (deleteInObstacle=False)
    assert np.isfinite(p).all()
    # particles stay in the domain
    assert p[:, 0].min() >= 0 and p[:, 0].max() <= res
    assert p[:, 1].min() >= 0 and p[:, 1].max() <= res
    # the dam collapses: center of mass moves right as fluid spreads
    assert com_x[-1] > com_x[0] + 0.5
    # fluid settles toward the bottom: vertical extent shrinks below start
    assert np.percentile(p[:, 1], 95) < 0.6 * res
    # velocities bounded (no explosion)
    assert np.abs(np.asarray(pVel.data)).max() < 5.0


def test_union_particle_levelset():
    """A ball of particles produces a levelset negative inside, positive
    outside, ~0 near the surface."""
    res = 24
    s = Solver(name="x", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    pp = s.create(BasicParticleSystem)
    ball = Sphere(s, center=vec3(12, 12, 12), radius=5)
    sampleShapeWithParticles(shape=ball, flags=flags, parts=pp,
                             discretization=2, randomness=0.1)
    phi = s.create(LevelsetGrid)
    idx = s.create(IntGrid)
    isys = s.create(ParticleIndexSystem)
    gridParticleIndex(parts=pp, flags=flags, indexSys=isys, index=idx)
    unionParticleLevelset(parts=pp, indexSys=isys, flags=flags, index=idx,
                          phi=phi, radiusFactor=1.0)
    d = phi.to_numpy()
    assert d[12, 12, 12] < 0  # center is inside
    assert d[12, 12, 3] > 0  # far away is outside
    # surface within a cell of the sphere radius
    mid = d[12, 12, :]
    zero_crossings = np.where(np.diff(np.sign(mid)))[0]
    assert len(zero_crossings) >= 2
    assert abs(abs(zero_crossings[0] - 11.5) - 5.0) < 2.0


def test_mark_fluid_and_isolated():
    res = 16
    s = Solver(name="x", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    pp = s.create(BasicParticleSystem)
    box = Box(s, p0=vec3(4, 4, 0), p1=vec3(8, 8, 1))
    box.applyToGrid(grid=flags, value=FlagFluid, respectFlags=flags)
    sampleFlagsWithParticles(flags=flags, parts=pp, discretization=2,
                             randomness=0.0)
    flags2 = s.create(FlagGrid)
    flags2.initDomain()
    markFluidCells(parts=pp, flags=flags2)
    a = flags.to_numpy()
    b = flags2.to_numpy()
    np.testing.assert_array_equal((a & FlagFluid) != 0, (b & FlagFluid) != 0)

    # isolated fluid cell gets retyped
    f3 = s.create(FlagGrid)
    f3.initDomain()
    f3.data = f3.data.at[0, 8, 8].set(FlagFluid)
    markIsolatedFluidCell(flags=f3, mark=FlagEmpty)
    assert int(f3.data[0, 8, 8]) == FlagEmpty
