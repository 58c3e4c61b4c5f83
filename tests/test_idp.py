"""Implicit density projection (Correct19, zflip.py:51-95 pattern):
the position solve spreads clumped particles toward uniform density."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *


def _density_error(s, flags, pp, phiObs, deltaX, density, dt):
    mapMassToGrid(flags=flags, density=density, parts=pp, source=None,
                  deltaX=deltaX, phiObs=phiObs, dt=dt,
                  particleMass=1.0 / 4.0)  # 4 ppc in 2d (sres=2)
    return density


def test_correct19_spreads_clumped_particles():
    res = 32
    s = Solver(name="idp", gridSize=vec3(res, res, 1), dim=2)
    dt = 1.0
    s.timestep = dt

    flags = s.create(FlagGrid)
    flags.initDomain()
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    Lambda = s.create(RealGrid)
    deltaX = s.create(MACGrid)
    phiObs = s.create(LevelsetGrid)
    # obstacle SDF: positive inside domain, negative in walls
    from mantaflow_tpu.scene.api import _wall_sdf
    phiObs.data = _wall_sdf(s.domain, 0, "xXyYzZ")

    # clumped particles: all 8x8x4 particles squeezed into a quarter box
    pp = s.create(BasicParticleSystem)
    box = Box(s, p0=vec3(8, 8, 0), p1=vec3(16, 16, 1))
    box.applyToGrid(grid=flags, value=FlagFluid, respectFlags=flags)
    sampleFlagsWithParticles(flags=flags, parts=pp, discretization=4,
                             randomness=0.3)  # 16 ppc = 4x overfull vs sres=2
    pVel = pp.create(PdataVec3)

    p0 = pp.to_numpy()
    spread0 = p0.std(axis=0)[:2].mean()

    errs = []
    for it in range(10):
        mapMassToGrid(flags=flags, density=density, parts=pp, source=None,
                      deltaX=deltaX, phiObs=phiObs, dt=dt, particleMass=0.25)
        errs.append(float(jnp.abs(density.data).mean()) * dt)
        solvePressureSystem(rhs=density, vel=vel, pressure=Lambda,
                            flags=flags, cgAccuracy=1e-3, precondition=True,
                            cgMaxIterFac=4.0)
        computeDeltaX(deltaX=deltaX, Lambda=Lambda, flags=flags)
        mapMACToPartPositions(flags=flags, deltaX=deltaX, parts=pp, dt=dt)

    p1 = pp.to_numpy()
    spread1 = p1.std(axis=0)[:2].mean()
    assert np.isfinite(p1).all()
    assert spread1 > spread0 * 1.1     # the clump expanded
    assert errs[-1] < errs[0] * 0.9    # density error decreased
    # particles stay inside the domain
    assert p1[:, 0].min() >= 1.0 and p1[:, 0].max() <= res - 1.0


def test_resample_overfull_and_fork_extras():
    res = 16
    s = Solver(name="x", gridSize=vec3(res, res, 1), dim=2)
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    vel = s.create(MACGrid)
    density = s.create(RealGrid)
    pp = s.create(BasicParticleSystem)
    # many particles in one cell
    import numpy as onp
    from mantaflow_tpu.core import particles as cp
    pts = onp.full((20, 3), 5.5, onp.float32)
    pts[:, 2] = 0.5
    pp._replace(cp.make_particles(pts))
    pVel = pp.create(PdataVec3)
    density.data = density.data.at[0, 5, 5].set(-2.0)
    idx = s.create(IntGrid)
    isys = s.create(ParticleIndexSystem)
    resampeOverfullCells(vel=vel, density=density, index=idx, indexSys=isys,
                         part=pp, pVel=pVel, dt=1.0)
    p = pp.to_numpy()
    # particles spread to distinct subcell positions inside cell (5,5)
    assert len(onp.unique(onp.round(p[:, :2] * 8) / 8, axis=0)) > 3
    assert (p[:, 0] >= 5).all() and (p[:, 0] <= 6).all()
    assert float(density.data[0, 5, 5]) == -1.0

    # fork extras
    obvel = s.create(MACGrid)
    obvel.setConst(vec3(0.3, 0, 0))
    set_wall_bcs2(flags=flags, vel=vel, obvel=obvel)
    assert np.isfinite(vel.to_numpy()).all()
    markSurfaceCells(flags)
    assert int((flags.data & 128).sum()) > 0
    clampNorm(vel, 0.1)
    v = vel.to_numpy()
    assert np.sqrt((v ** 2).sum(0)).max() <= 0.1 + 1e-5
