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


def test_vortex_sheet_channels():
    """Circulation <-> vorticity round trip, texcoords, smoke channel."""
    from mantaflow_tpu.scene.vortex_api import (VortexSheetMesh,
                                                meshSmokeInflow,
                                                texcoordInflow)
    res = 24
    s = Solver(name="vs", gridSize=vec3(res, res, res))
    s.timestep = 1.0
    phi = Sphere(s, center=vec3(12, 12, 12), radius=6).computeLevelset()
    mesh = s.create(VortexSheetMesh)
    phi.createMesh(mesh)
    mesh._sync()

    # circulation -> vorticity -> circulation is a projection fixpoint:
    # going back and forth again reproduces the same vorticity
    rng = np.random.RandomState(3)
    mesh.tri_vorticity = rng.randn(mesh.numTris(), 3).astype(np.float32)
    mesh.calcCirculation()
    mesh.calcVorticity()
    w1 = mesh.tri_vorticity.copy()
    mesh.calcCirculation()
    mesh.calcVorticity()
    assert np.abs(mesh.tri_vorticity - w1).max() < 5e-3
    assert np.isfinite(mesh.tri_circulation).all()

    # texcoords: start at pos+0, inflow shifts them against the mean flow
    mesh.reinitTexCoords()
    assert np.allclose(mesh.tex1, mesh.nodes)
    vel = s.create(MACGrid)
    vel.setConst(vec3(1.0, 0, 0))
    src = Sphere(s, center=vec3(12, 12, 12), radius=20)  # covers all nodes
    texcoordInflow(mesh, src, vel)
    d = mesh.tex1 - mesh.nodes
    assert np.allclose(d[:, 0], -1.0, atol=1e-4)  # offset -dt*meanV
    assert np.allclose(mesh.tex2, mesh.tex1)

    # smoke stamped on faces inside the source only
    half = Sphere(s, center=vec3(12, 12, 18), radius=6)
    meshSmokeInflow(mesh, half, amount=2.0)
    assert mesh.tri_smoke.max() == 2.0
    assert (mesh.tri_smoke == 0).any()
