"""Golden-data regression tests (reference test_0100_psolve / test_1010
pattern): deterministic small sims checked against stored .uni goldens.
Regenerate with MANTA_GEN_TEST_DATA=1."""
import numpy as np

from mantaflow_tpu import *
from golden import do_test_grid


def _plume2d_sim(steps=8, res=24):
    s = Solver(name="g", gridSize=vec3(res, res, 1), dim=2)
    s.timestep = 1.0
    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    pressure = s.create(RealGrid)
    flags.initDomain(boundaryWidth=1)
    flags.fillGrid()
    source = s.create(Cylinder, center=vec3(res * 0.5, res * 0.12, 0.5),
                      radius=res * 0.14, z=vec3(0, res * 0.02, 0))
    for _ in range(steps):
        source.applyToGrid(grid=density, value=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        setWallBcs(flags=flags, vel=vel)
        addBuoyancy(density=density, vel=vel, gravity=vec3(0, -4e-3, 0),
                    flags=flags)
        solvePressure(flags=flags, vel=vel, pressure=pressure)
        s.step()
    return density, vel, pressure


def test_golden_psolve():
    """Pressure solve on a fixed divergent field (test_0100 pattern)."""
    res = 24
    s = Solver(name="g", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    rng = np.random.RandomState(42)
    vel.from_numpy((rng.rand(3, res, res, res) - 0.5).astype(np.float32))
    setWallBcs(flags=flags, vel=vel)
    pressure = s.create(RealGrid)
    solvePressure(flags=flags, vel=vel, pressure=pressure, cgAccuracy=1e-4,
                  cgMaxIterFac=4.0)
    assert do_test_grid("psolve_pressure", pressure, 1e-2)
    assert do_test_grid("psolve_vel", vel, 1e-2)


def test_golden_plume2d():
    """Short 2D plume (test_1010 pattern)."""
    density, vel, pressure = _plume2d_sim()
    assert do_test_grid("plume2d_dens", density, 1e-3)
    assert do_test_grid("plume2d_vel", vel, 1e-3)


def test_golden_advection():
    """Pure advection determinism (test_0150 pattern)."""
    res = 20
    s = Solver(name="g", gridSize=vec3(res, res, res))
    s.timestep = 0.75
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    vel.setConst(vec3(0.37, 0.21, -0.14))
    d = s.create(RealGrid)
    Sphere(s, center=vec3(8, 10, 12), radius=4).applyToGrid(grid=d, value=1.0)
    for _ in range(4):
        advectSemiLagrange(flags=flags, vel=vel, grid=d, order=2)
    assert do_test_grid("advect_maccormack", d, 1e-3)


def test_golden_karman():
    """Fraction-BC obstacle flow (karman recipe): locks in the
    KnSetWallBcsFrac free-slip projection, fraction stencils and inflow
    walls, all verified 1.5e-6 against the reference binary."""
    resx, resy = 48, 24
    s = Solver(name="g", gridSize=vec3(resx, resy, 1), dim=2)
    s.timestep = 0.5
    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    pressure = s.create(RealGrid)
    fractions = s.create(MACGrid)
    phiWalls = s.create(LevelsetGrid)
    flags.initDomain(inflow="xX", phiWalls=phiWalls, boundaryWidth=0)
    obs = Cylinder(s, center=vec3(12, 12, 0.5), radius=3, z=vec3(0, 0, 1))
    phiObs = obs.computeLevelset()
    phiObs.join(phiWalls)
    updateFractions(flags=flags, phiObs=phiObs, fractions=fractions)
    setObstacleFlags(flags=flags, phiObs=phiObs, fractions=fractions)
    flags.fillGrid()
    vin = vec3(0.9, 0, 0)
    vel.setConst(vin)
    dens_src = Cylinder(s, center=vec3(12, 12, 0.5), radius=3.2,
                        z=vec3(0, 0, 1))
    for t in range(6):
        dens_src.applyToGrid(grid=density, value=2.0)
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2,
                           orderSpace=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        extrapolateMACSimple(flags=flags, vel=vel, distance=2, intoObs=True)
        setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)
        setInflowBcs(vel=vel, dir="xX", value=vin)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      fractions=fractions, cgAccuracy=1e-4, cgMaxIterFac=5)
        setInflowBcs(vel=vel, dir="xX", value=vin)
    assert do_test_grid("karman_dens", density, 1e-3)
    assert do_test_grid("karman_vel", vel, 1e-3)
