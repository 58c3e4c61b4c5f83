"""k-epsilon turbulence with synthesized turbulence particles vs
reference-binary goldens. Compact port of tools/tests/test_2025_turb.py:
sphere-array obstacle, file-loaded noise, per-step turbulence particle
seed/advect/synthesize and the full k-epsilon update chain.

Thresholds ~6x measured drift (k 8e-4 / eps 1e-4 / vel 5.6e-3 over 32
frames — exact turbulence-particle RNG + raw-eps clamp semantics keep the
chain tight; the remainder is the usual pressure-iterate float drift).
"""
from mantaflow_tpu import *


def scene(dtg):
    res, frames = 70, 32
    gs = vec3(res, res // 2, res // 2)
    s = Solver(name='main', gridSize=gs)
    s.timestep = 1.2

    velInflow = vec3(0.52, 0, 0)

    flags = s.create(FlagGrid)
    pressure = s.create(RealGrid)
    vel = s.create(MACGrid)

    k = s.create(RealGrid)
    eps = s.create(RealGrid)
    prod = s.create(RealGrid)
    nuT = s.create(RealGrid)
    strain = s.create(RealGrid)

    noise = s.create(NoiseField, loadFromFile=True)
    noise.timeAnim = 0

    turb = s.create(TurbulenceParticleSystem, noise=noise)

    flags.initDomain()
    flags.fillGrid()

    for i in range(4):
        for j in range(4):
            obs = s.create(Sphere,
                           center=gs * vec3(0.2, (i + 1) / 5.0, (j + 1) / 5.0),
                           radius=res * 0.025)
            obs.applyToGrid(grid=flags, value=FlagObstacle)

    box = s.create(Box, center=gs * vec3(0.05, 0.43, 0.6),
                   size=gs * vec3(0.02, 0.005, 0.07))

    L0, mult = 0.01, 0.1
    intensity, nu, prodMult = 0.1, 0.1, 2.5

    KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=intensity, nu=nu,
                fillArea=True)

    for t in range(frames):
        turb.seed(box, 500)
        turb.advectInGrid(flags=flags, vel=vel, integrationMode=IntRK4)
        turb.synthesize(flags=flags, octaves=1, k=k, switchLength=5, L0=L0,
                        scale=mult, inflowBias=velInflow)
        turb.deleteInObstacle(flags)

        KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=intensity, nu=nu,
                    fillArea=False)
        advectSemiLagrange(flags=flags, vel=vel, grid=k, order=1)
        advectSemiLagrange(flags=flags, vel=vel, grid=eps, order=1)
        KEpsilonBcs(flags=flags, k=k, eps=eps, intensity=intensity, nu=nu,
                    fillArea=False)
        KEpsilonComputeProduction(vel=vel, k=k, eps=eps, prod=prod, nuT=nuT,
                                  strain=strain, pscale=prodMult)
        KEpsilonSources(k=k, eps=eps, prod=prod)
        KEpsilonGradientDiffusion(k=k, eps=eps, vel=vel, nuT=nuT,
                                  sigmaU=10.0)

        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2,
                           clampMode=1)
        setWallBcs(flags=flags, vel=vel)
        setInflowBcs(vel=vel, dir='xXyYzZ', value=velInflow)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgMaxIterFac=0.5)
        setWallBcs(flags=flags, vel=vel)
        setInflowBcs(vel=vel, dir='xXyYzZ', value=velInflow)

        s.step()

    dtg("k", k, 5e-3)
    dtg("eps", eps, 1e-3)
    dtg("vel", vel, 2e-2)
