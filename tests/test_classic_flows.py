"""Classic validation flows: Karman vortex street setup (karman.py) and
lid-driven cavity (lidDrivenCavity.py patterns)."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.scene.api import _wall_sdf


def test_karman_inflow_obstacle():
    """Flow past a cylinder with inflow BCs and 2nd-order fractions (the
    scenes/karman.py recipe): the wake behind the obstacle develops,
    velocities stay bounded, the obstacle blocks the flow."""
    resx, resy = 48, 24
    s = Solver(name="k", gridSize=vec3(resx, resy, 1), dim=2)
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

    for t in range(20):
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2,
                           orderSpace=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        extrapolateMACSimple(flags=flags, vel=vel, distance=2, intoObs=True)
        setWallBcs(flags=flags, vel=vel, fractions=fractions, phiObs=phiObs)
        setInflowBcs(vel=vel, dir="xX", value=vin)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      fractions=fractions, cgAccuracy=1e-4, cgMaxIterFac=5)
        setInflowBcs(vel=vel, dir="xX", value=vin)
        s.step()

    v = vel.to_numpy()
    assert np.isfinite(v).all()
    assert np.abs(v).max() < 10.0
    # flow is moving downstream past the obstacle
    assert v[0][0, 12, 30:40].mean() > 0.3
    # second-order BCs: no normal flux at the upstream stagnation face
    # (reference gives -0.0001 here; deep-interior values are free-slip
    # projections of extrapolated data and are not asserted)
    assert abs(v[0][0, 12, 9]) < 0.05


def test_lid_driven_cavity():
    """A driven lid sets up cavity circulation: the lid pushes flow into the
    right wall, pressure turns it down that wall, a return flow crosses the
    interior, and it rises along the left wall (inviscid variant — no
    boundary-layer viscosity, so the gyre hugs the walls)."""
    res = 32
    s = Solver(name="l", gridSize=vec3(res, res, 1), dim=2)
    s.timestep = 1.0
    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    pressure = s.create(RealGrid)
    flags.initDomain(boundaryWidth=0)
    flags.fillGrid()

    def stamp(v):
        # lid x-velocity on the top interior row, interior faces only
        # (wall-adjacent faces stay subject to setWallBcs)
        return v.at[0, 0, res - 2, 2:res - 1].set(1.0)

    for t in range(40):
        vel.data = stamp(vel.data)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        vel.data = stamp(vel.data)
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure)
        s.step()

    v = vel.to_numpy()
    assert np.isfinite(v).all()
    assert np.abs(v).max() < 5.0
    # down the right wall, up the left wall
    assert v[1][0, 8:24, res - 3].mean() < -0.1
    assert v[1][0, 8:24, 2].mean() > 0.01
    # interior return flow moves leftward (counter to the lid)
    assert v[0][0, res // 2, 8:24].mean() < -0.01
