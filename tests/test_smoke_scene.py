"""End-to-end smoke scenes in the mantaflow-style scene API:
plume_2d.py and simpleplume.py ports (reference scenes/plume_2d.py,
scenes/simpleplume.py), with physical sanity checks replacing golden data."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core import mac as macops


def _divergence_norm(vel, flags):
    """Max |div| over fluid cells with no outflow neighbor: faces into
    outflow cells are deliberately left uncorrected by knCorrectVelocity
    (reference pressure.cpp:101), so those cells keep divergence."""
    from mantaflow_tpu.core.masks import interior_mask, shift
    div = macops.neg_divergence(vel.data)
    fluid = fl.is_fluid(flags.data)
    near_out = fl.is_outflow(flags.data)
    for ax in ("x", "y", "z"):
        near_out = near_out | shift(fl.is_outflow(flags.data), 1, ax) \
            | shift(fl.is_outflow(flags.data), -1, ax)
    m = fluid & ~near_out & interior_mask(flags.dom, 1)
    return float(jnp.max(jnp.abs(jnp.where(m, div, 0.0))))


def test_plume_2d():
    res = 32
    s = Solver(name="main", gridSize=vec3(res, res, 1), dim=2)
    s.timestep = 1.0

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    pressure = s.create(RealGrid)

    bWidth = 1
    flags.initDomain(boundaryWidth=bWidth)
    flags.fillGrid()
    setOpenBound(flags, bWidth, "yY", FlagOutflow | FlagEmpty)

    source = s.create(Cylinder, center=vec3(res, res, 1) * vec3(0.5, 0.1, 0.5),
                      radius=res * 0.14, z=vec3(res, res, 1) * vec3(0, 0.02, 0))

    for t in range(15):
        source.applyToGrid(grid=density, value=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        resetOutflow(flags=flags, real=density)
        setWallBcs(flags=flags, vel=vel)
        addBuoyancy(density=density, vel=vel, gravity=vec3(0, -4e-3, 0),
                    flags=flags)
        solvePressure(flags=flags, vel=vel, pressure=pressure)
        s.step()

    d = density.to_numpy()
    assert np.all(np.isfinite(d))
    assert d.max() <= 1.0 + 1e-4
    assert d.min() >= -1e-4
    assert d.max() > 0.5  # smoke was actually emitted
    v = vel.to_numpy()
    assert np.all(np.isfinite(v))
    assert np.abs(v).max() > 1e-5  # buoyancy acted
    # post-projection incompressibility
    assert _divergence_norm(vel, flags) < 2e-3
    assert s.frame == 15


def test_simpleplume_3d():
    res = 24
    gs = vec3(res, int(1.5 * res), res)
    s = Solver(name="main", gridSize=gs)
    s.timestep = 1.0

    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    pressure = s.create(RealGrid)

    noise = s.create(NoiseField, fixedSeed=7)
    noise.posScale = vec3(45)
    noise.clamp = True
    noise.clampNeg = 0
    noise.clampPos = 1
    noise.valOffset = 0.75
    noise.timeAnim = 0.2

    source = s.create(Cylinder, center=gs * vec3(0.5, 0.1, 0.5),
                      radius=res * 0.14, z=gs * vec3(0, 0.02, 0))

    flags.initDomain()
    flags.fillGrid()

    for t in range(8):
        densityInflow(flags=flags, density=density, noise=noise,
                      shape=source, scale=1, sigma=0.5)
        advectSemiLagrange(flags=flags, vel=vel, grid=density, order=2)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2,
                           strength=1.0)
        setWallBcs(flags=flags, vel=vel)
        addBuoyancy(density=density, vel=vel, gravity=vec3(0, -6e-4, 0),
                    flags=flags)
        solvePressure(flags=flags, vel=vel, pressure=pressure)
        s.step()

    d = density.to_numpy()
    assert np.all(np.isfinite(d))
    assert d.max() > 0.3
    assert _divergence_norm(vel, flags) < 2e-3


def test_vorticity_confinement_runs():
    res = 16
    s = Solver(name="main", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    flags.initDomain()
    flags.fillGrid()
    # seed a rotational velocity
    rng = np.random.RandomState(0)
    vel.from_numpy(rng.randn(3, res, res, res).astype(np.float32) * 0.1)
    before = vel.to_numpy().copy()
    vorticityConfinement(vel=vel, flags=flags, strength=0.2)
    after = vel.to_numpy()
    assert np.all(np.isfinite(after))
    assert np.abs(after - before).max() > 0  # it did something
