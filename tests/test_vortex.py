"""Vortex particles, vortex sheets, turbulence particles."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *


def test_vortex_particles_induce_swirl():
    res = 24
    s = Solver(name="v", gridSize=vec3(res, res, res))
    s.timestep = 1.0
    vp = s.create(VortexParticleSystem)
    vp.add(pos=(12, 12, 12), vorticity=(0, 0, 2.0), sigma=3.0)

    mesh = s.create(Mesh)
    phi = Sphere(s, center=vec3(12, 12, 12), radius=4).computeLevelset()
    phi.createMesh(mesh)
    x0 = mesh.nodes.copy()
    vp.applyToMesh(mesh, scale=1.0, integrationMode=IntRK2)
    d = mesh.nodes - x0
    assert np.abs(d).max() > 1e-3  # nodes moved
    # motion is tangential: dominated by xy plane, tiny in z
    assert np.abs(d[:, 2]).mean() < 0.2 * np.abs(d[:, :2]).mean()
    # self-advection keeps particle finite
    vp.advectSelf()
    assert np.isfinite(vp.pos).all()


def test_k41_seeding_and_vic():
    res = 16
    s = Solver(name="v", gridSize=vec3(res, res, res))
    s.timestep = 1.0
    vp = s.create(VortexParticleSystem)
    ball = Sphere(s, center=vec3(8, 8, 8), radius=4)
    VPseedK41(vp, ball, strength=1.0, sigma0=0.5, sigma1=2.0, probability=1.0)
    assert vp.size() > 20
    assert (vp.sigma >= 0.5 - 1e-5).all() and (vp.sigma <= 2.0 + 1e-5).all()

    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    # vortex sheet from a sphere mesh with buoyancy-driven vorticity
    vsm = s.create(VortexSheetMesh)
    phi = ball.computeLevelset()
    phi.createMesh(vsm)
    vorticitySource(vsm, gravity=vec3(0, -0.1, 0), scale=1.0)
    assert np.abs(vsm.tri_vorticity).max() > 0
    smoothVorticity(vsm, iter=2, sigma=0.5)
    assert np.isfinite(vsm.tri_vorticity_smoothed).all()

    vel = s.create(VecGrid)
    VICintegration(vsm, sigma=1.5, vel=vel, flags=flags, cgAccuracy=1e-2,
                   scale=0.1)
    v = vel.to_numpy()
    assert np.isfinite(v).all()
    assert np.abs(v).max() > 1e-6  # the sheet induced motion

    density = s.create(RealGrid)
    densityFromLevelset(phi, density, value=1.0, sigma=1.0)
    d = density.to_numpy()
    assert d[8, 8, 8] == 1.0 and d[2, 2, 2] == 0.0


def test_turbulence_particles():
    res = 24
    s = Solver(name="t", gridSize=vec3(res, res, res))
    s.timestep = 0.5
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    noise = s.create(NoiseField, fixedSeed=5)
    tp = TurbulenceParticleSystem(s, noise)
    ball = Sphere(s, center=vec3(12, 12, 12), radius=5)
    tp.seed(ball, 200)
    assert tp.size() == 200

    k = s.create(RealGrid)
    k.setConst(1.0)
    p0 = tp.pos.copy()
    tp.synthesizeTurbulence(flags=flags, k=k, octaves=2, L0=0.2, scale=0.5,
                            kmin=0.0)
    assert np.abs(tp.pos - p0).max() > 1e-4  # turbulence moved particles
    assert np.isfinite(tp.pos).all()

    vel = s.create(MACGrid)
    vel.setConst(vec3(0.5, 0, 0))
    x0 = tp.pos[:, 0].mean()
    tp.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4)
    assert tp.pos[:, 0].mean() > x0 + 0.1

    tp.deleteInObstacle(flags)
    assert tp.size() <= 200
