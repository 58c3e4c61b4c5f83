"""Breadth ops: wavelet turbulence, fire, wave equation, k-epsilon."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *


def test_wavelet_turbulence_upres():
    """Coarse smoke field up-ressed with curl noise: interpolation preserves
    large-scale structure, noise adds fluid-only detail."""
    res = 16
    up = 32
    s = Solver(name="c", gridSize=vec3(res, res, res))
    xl = Solver(name="x", gridSize=vec3(up, up, up))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    xlFlags = xl.create(FlagGrid)
    xlFlags.initDomain()
    xlFlags.fillGrid()

    density = s.create(RealGrid)
    blob = Sphere(s, center=vec3(8, 8, 8), radius=4)
    blob.applyToGrid(grid=density, value=1.0)
    xlDensity = xl.create(RealGrid)
    interpolateGrid(target=xlDensity, source=density)
    d = xlDensity.to_numpy()
    assert d[16, 16, 16] > 0.9  # blob center survives upres
    assert d[2, 2, 2] < 0.1

    vel = s.create(MACGrid)
    vel.from_numpy(np.random.RandomState(0).randn(3, res, res, res).astype(
        np.float32) * 0.2)
    xlVel = xl.create(MACGrid)
    interpolateMACGrid(target=xlVel, source=vel)
    assert np.isfinite(xlVel.to_numpy()).all()

    # energy + wavelet coefficients as up-res weight
    energy = s.create(RealGrid)
    computeEnergy(flags=flags, vel=vel, energy=energy)
    assert energy.to_numpy().max() > 0
    computeWaveletCoeffs(energy)
    assert np.isfinite(energy.to_numpy()).all()

    noise = xl.create(NoiseField, fixedSeed=11)
    before = xlVel.to_numpy().copy()
    applyNoiseVec3(flags=xlFlags, target=xlVel, noise=noise, scale=0.3)
    after = xlVel.to_numpy()
    assert np.abs(after - before).max() > 1e-5
    # curl noise is divergence-free-ish; field stays bounded
    assert np.abs(after).max() < 10.0

    # UV advection machinery
    uv = xl.create(VecGrid)
    resetUvGrid(uv)
    u = uv.to_numpy()
    assert u[0, 0, 0, 5] == 5.0  # x channel = i
    updateUvWeight(resetTime=10.0, index=0, numUvs=2, uv=uv)
    assert 0.0 <= getUvWeight(uv) <= 1.0


def test_fire():
    res = 16
    s = Solver(name="f", gridSize=vec3(res, res, res))
    s.timestep = 0.5
    fuel = s.create(RealGrid)
    density = s.create(RealGrid)
    react = s.create(RealGrid)
    heat = s.create(RealGrid)
    flame = s.create(RealGrid)
    src = Sphere(s, center=vec3(8, 4, 8), radius=3)
    src.applyToGrid(grid=fuel, value=1.0)
    src.applyToGrid(grid=react, value=1.0)

    f0 = fuel.to_numpy().sum()
    processBurn(fuel=fuel, density=density, react=react, heat=heat)
    assert fuel.to_numpy().sum() < f0          # fuel consumed
    assert density.to_numpy().max() > 0        # smoke emitted
    assert heat.to_numpy().max() > 1.0         # flame temperature set
    updateFlame(react=react, flame=flame)
    fl = flame.to_numpy()
    assert fl.max() > 0.5 and fl.min() >= 0.0


def test_wave_equation():
    res = 48
    s = Solver(name="w", gridSize=vec3(res, res, 1), dim=2)
    s.timestep = 1.0
    h = s.create(RealGrid)
    hprev = s.create(RealGrid)
    hnew = s.create(RealGrid)
    curv = s.create(RealGrid)
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    source = Box(s, p0=vec3(14, 14, 0), p1=vec3(24, 24, 1))
    source.applyToGrid(grid=h, value=2.0)
    source.applyToGrid(grid=hprev, value=2.0)
    mass = totalSum(h)
    assert mass > 0

    # implicit steps (wave speed sqrt(cSqr)~0.32 cells/step)
    for _ in range(25):
        cgSolveWE(flags=flags, ut=h, utm1=hprev, out=hnew, cSqr=0.1)
        normalizeSumTo(h, mass)
    d = h.to_numpy()
    assert np.isfinite(d).all()
    assert abs(totalSum(h) - mass) < 1e-2 * mass
    # wave spread beyond the source box
    assert np.abs(d[0, 30:, :]).max() > 1e-4

    # explicit second-derivative op is consistent with a known quadratic
    h2 = s.create(RealGrid)
    ii = np.arange(res, dtype=np.float32)
    h2.from_numpy(np.broadcast_to(ii ** 2, (1, res, res)).copy())
    calcSecDeriv2d(h2, curv)
    c = curv.to_numpy()
    np.testing.assert_allclose(c[0, 10, 10], 2.0, atol=1e-3)


def test_kepsilon():
    res = 24
    s = Solver(name="k", gridSize=vec3(res, res, res))
    s.timestep = 0.5
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    vel.from_numpy(np.random.RandomState(1).randn(3, res, res, res).astype(
        np.float32) * 0.3)
    k = s.create(RealGrid)
    eps = s.create(RealGrid)
    prod = s.create(RealGrid)
    nuT = s.create(RealGrid)
    KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=0.1, nu=0.1,
                fillArea=True)
    assert k.to_numpy().max() > 0
    KEpsilonComputeProduction(vel=vel, k=k, eps=eps, prod=prod, nuT=nuT)
    assert prod.to_numpy().max() > 0
    assert nuT.to_numpy().min() >= 0
    KEpsilonSources(k=k, eps=eps, prod=prod)
    assert np.isfinite(k.to_numpy()).all()
    assert k.to_numpy().min() >= 1.5 * 1.0 * (2e-3) ** 2 - 1e-9
    KEpsilonGradientDiffusion(k=k, eps=eps, nuT=nuT, vel=vel)
    assert np.isfinite(k.to_numpy()).all()
    assert np.isfinite(vel.to_numpy()).all()
