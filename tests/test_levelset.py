"""Levelset redistancing + free-surface liquid scene (freesurface.py port)."""
import numpy as np
import jax.numpy as jnp

from mantaflow_tpu import *
from mantaflow_tpu.ops import levelset as lso


def test_reinit_recovers_distance():
    """A badly-scaled sphere levelset redistances to |grad phi| ~= 1 within
    the band, preserving the interface location."""
    res = 32
    s = Solver(name="x", gridSize=vec3(res, res, res))
    flags = s.create(FlagGrid)
    flags.initDomain()
    flags.fillGrid()
    phi = s.create(LevelsetGrid)
    ball = Sphere(s, center=vec3(16, 16, 16), radius=6)
    sdf = ball.shape.compute_levelset(s.domain)
    # garbage away from the interface; near-interface values stay valid
    # (the fast march trusts first-layer values, and so does our redistancer)
    phi.data = jnp.where(jnp.abs(sdf) > 1.0, sdf * 7.0, sdf)

    phi.reinitMarching(flags=flags, maxTime=4.0)
    d = phi.to_numpy()

    # interface location preserved: sign changes near radius 6 on the midline
    line = d[16, 16, :]
    zc = np.where(np.diff(np.sign(line)))[0]
    assert len(zc) == 2
    assert abs(abs(zc[0] - 15.5) - 6.0) < 1.5

    # |grad phi| ~ 1 in the band around the surface
    gz, gy, gx = np.gradient(d)
    gm = np.sqrt(gx**2 + gy**2 + gz**2)
    band = (np.abs(d) > 1.0) & (np.abs(d) < 3.0)
    assert abs(gm[band].mean() - 1.0) < 0.15

    # far field saturates near maxTime+1
    assert d[16, 16, 2] > 4.0


def test_csg_and_fillholes():
    res = 24
    s = Solver(name="x", gridSize=vec3(res, res, 1), dim=2)
    a = Sphere(s, center=vec3(10, 12, 0.5), radius=5).computeLevelset()
    b = Sphere(s, center=vec3(14, 12, 0.5), radius=5).computeLevelset()
    u = s.create(LevelsetGrid)
    u.copyFrom(a)
    u.join(b)
    d = u.to_numpy()
    assert d[0, 12, 10] < 0 and d[0, 12, 14] < 0  # both centers inside
    u2 = s.create(LevelsetGrid)
    u2.copyFrom(a)
    u2.subtract(b)
    d2 = u2.to_numpy()
    assert d2[0, 12, 14] > 0  # b's center removed

    # hole filling: annulus (a minus smaller inner) -> hole filled
    ring = s.create(LevelsetGrid)
    ring.copyFrom(a)
    inner = Sphere(s, center=vec3(10, 12, 0.5), radius=2).computeLevelset()
    ring.subtract(inner)
    assert float(ring.data[0, 12, 10]) > 0  # hole present
    ring.fillHoles(maxDepth=10)
    assert float(ring.data[0, 12, 10]) < 0  # hole filled


def test_freesurface_drop():
    """freesurface.py port: a drop falls into a basin; levelset stays a sane
    signed field, fluid volume stays bounded, sim is stable."""
    dim, res = 3, 24
    gs = Vec3(res, res, res)
    s = Solver(name="main", gridSize=gs, dim=dim)
    s.timestep = 0.15

    phi = s.create(LevelsetGrid)
    flags = s.create(FlagGrid)
    vel = s.create(MACGrid)
    pressure = s.create(RealGrid)

    bWidth = 1
    flags.initDomain(boundaryWidth=bWidth)
    basin = Box(s, p0=gs * Vec3(0, 0, 0), p1=gs * Vec3(1, 0.2, 1))
    drop = Sphere(s, center=gs * Vec3(0.5, 0.5, 0.5), radius=res * 0.125)
    phi.setConst(1e10)
    phi.join(basin.computeLevelset())
    phi.join(drop.computeLevelset())
    flags.updateFromLevelset(phi)

    vol0 = int((phi.to_numpy() < 0).sum())

    for t in range(12):
        extrapolateLsSimple(phi=phi, distance=5, inside=False)
        extrapolateLsSimple(phi=phi, distance=5, inside=True)
        extrapolateMACSimple(flags=flags, vel=vel, distance=5)
        advectSemiLagrange(flags=flags, vel=vel, grid=phi, order=2,
                           clampMode=2)
        phi.setBound(1.0, bWidth)
        flags.updateFromLevelset(phi)
        advectSemiLagrange(flags=flags, vel=vel, grid=vel, order=2)
        addGravity(flags=flags, vel=vel, gravity=Vec3(0, -0.025, 0))
        setWallBcs(flags=flags, vel=vel)
        solvePressure(flags=flags, vel=vel, pressure=pressure,
                      cgMaxIterFac=0.5, cgAccuracy=5e-4, phi=phi)
        setWallBcs(flags=flags, vel=vel)
        s.step()

    d = phi.to_numpy()
    assert np.isfinite(d).all()
    vol = int((d < 0).sum())
    # volume roughly conserved (levelset advection is not strictly
    # conservative; allow generous bounds)
    assert 0.5 * vol0 < vol < 2.0 * vol0
    # the drop fell: fluid at mid-height center is gone, basin still full
    assert d[2, 2, res // 2] < 0  # basin bottom
    v = vel.to_numpy()
    assert np.isfinite(v).all()
    assert np.abs(v).max() < 10.0


def test_value_transport_matches_native_fmm():
    """The data-parallel FMM velocity transport (lso.value_transport_mac,
    event-replay weights) must track the reference-exact serial heap
    (native/fastmarch.cpp) on a basin+drop levelset: same upwind-weight
    interpolation, so agreement is near-exact away from heap tie-order
    ambiguities."""
    import pytest
    from mantaflow_tpu import native
    from mantaflow_tpu.core.domain import Domain

    if native.get_lib() is None:
        pytest.skip("native fastmarch unavailable")

    res = 24
    gs = vec3(res, res, res)
    s = Solver(name="vt", gridSize=gs)
    flags = s.create(FlagGrid)
    phi = s.create(LevelsetGrid)
    flags.initDomain(boundaryWidth=1)
    basin = Box(s, p0=gs * Vec3(0, 0, 0), p1=gs * Vec3(1, 0.25, 1))
    drop = Sphere(s, center=gs * Vec3(0.5, 0.6, 0.5), radius=res * 0.15)
    phi.setConst(1e10)
    phi.join(basin.computeLevelset())
    phi.join(drop.computeLevelset())
    flags.updateFromLevelset(phi)

    t = np.arange(res, dtype=np.float32)
    zz, yy, xx = np.meshgrid(t, t, t, indexing="ij")
    vel0 = np.stack([np.sin(0.4 * xx) * np.cos(0.3 * yy),
                     np.cos(0.25 * zz) * np.sin(0.35 * xx),
                     np.sin(0.3 * yy) * np.cos(0.2 * zz)]).astype(np.float32)

    phi_ref, vel_ref = native.reinit_march(
        np.asarray(phi.data), np.asarray(flags.data), vel0.copy(),
        max_time=4.0)

    dom = Domain(size=(res, res, res), dim=3)
    got = np.asarray(lso.value_transport_mac(
        jnp.asarray(phi_ref), flags.data, jnp.asarray(vel0), dom, 4.0))

    band = (phi_ref > 0) & (phi_ref <= 4.0)
    band[[0, -1], :, :] = band[:, [0, -1], :] = band[:, :, [0, -1]] = False
    d = np.abs(got - vel_ref)[:, band]
    assert float(d.mean()) < 5e-3
    assert float((d > 0.05).mean()) < 0.02
