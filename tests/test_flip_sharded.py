"""Sharded FLIP: the fused liquid step under a multi-device mesh.

VERDICT r1 item 3: shard_flip_state + a sharded-vs-single-device equality
test for the FLIP model WITH an obstacle and a free surface (ghost-fluid
pressure). Runs on the 8-virtual-CPU-device mesh from conftest.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.core.shapes import Sphere
from mantaflow_tpu.models import flip
from mantaflow_tpu.parallel import sharding as shd


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_flip_sharded_matches_single_device():
    res = 32
    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                             cg_accuracy=1e-4)
    obs = Sphere(center=(res * 0.7, res * 0.3, res * 0.5), radius=res * 0.15)
    state0 = flip.make_dam_state(dom, params, discretization=2,
                                 obstacle=obs)

    # single-device reference
    step = jax.jit(lambda s: flip.flip_step(s, dom, params))
    ref = state0
    for _ in range(3):
        ref = step(ref)

    # sharded: same initial state placed on the mesh
    mesh = shd.make_mesh(8)
    sh = shd.shard_flip_state(state0, mesh)
    for _ in range(3):
        sh = step(sh)

    np.testing.assert_allclose(np.asarray(ref.vel), np.asarray(sh.vel),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.phi), np.asarray(sh.phi),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.parts.pos),
                               np.asarray(sh.parts.pos), atol=2e-5)
    # obstacle actually participates: some obstacle cells exist and no
    # particle sits inside the sphere
    fl = np.asarray(sh.flags)
    assert (fl & 2).sum() > 0
    p = np.asarray(sh.parts.pos)
    act = np.asarray(sh.parts.active_mask())
    d = ((p[:, 0] - res * 0.7) ** 2 + (p[:, 1] - res * 0.3) ** 2
         + (p[:, 2] - res * 0.5) ** 2) ** 0.5
    assert (d[act] < res * 0.15 - 1.5).sum() == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_flip_bucketed_sharded_matches_single_device():
    """Bucketed pipeline under the mesh: bucket arrays T-sharded (z-slabs),
    grids z/y-decomposed; equality vs the single-device bucketed step."""
    res = 16
    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                             cg_accuracy=1e-4, ring_only_obstacles=True)
    state0 = flip.make_dam_state_bucketed(dom, params, discretization=2,
                                          ppc=14)

    step = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    ref = state0
    for _ in range(3):
        ref = step(ref)

    mesh = shd.make_mesh(8)
    sh = shd.shard_flip_bucket_state(state0, mesh)
    for _ in range(3):
        sh = step(sh)

    assert int(sh.buckets.dropped) == 0
    assert int(sh.buckets.count()) == int(ref.buckets.count())
    np.testing.assert_allclose(np.asarray(ref.vel), np.asarray(sh.vel),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.phi), np.asarray(sh.phi),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.flags),
                                  np.asarray(sh.flags))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_flip_bucketed_zshard_pallas_matches_single_device():
    """Production FLIP kernels multi-chip (VERDICT r3 item 6): the fused
    advect+blend runs as the z-sharded Pallas kernel with explicit
    lax.ppermute halo exchange (interpret mode on the CPU mesh), the rest
    under GSPMD; equality vs the single-device bucketed step, WITH an
    interior obstacle (general flags-at-position probing through the
    sharded obstacle halos)."""
    from jax.sharding import Mesh

    res = 16
    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                             cg_accuracy=1e-4)
    obs = Sphere(center=(res * 0.7, res * 0.3, res * 0.5),
                 radius=res * 0.2)
    state0 = flip.make_dam_state_bucketed(dom, params, discretization=2,
                                          obstacle=obs, ppc=14)

    step = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    ref = state0
    for _ in range(2):
        ref = step(ref)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("z",))
    sh = shd.shard_flip_bucket_state(state0, mesh)
    zstep = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params,
                                                      zshard=(mesh, "z")))
    for _ in range(2):
        sh = zstep(sh)

    assert int(sh.buckets.dropped) == 0
    assert int(sh.buckets.count()) == int(ref.buckets.count())
    np.testing.assert_allclose(np.asarray(ref.vel), np.asarray(sh.vel),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ref.phi), np.asarray(sh.phi),
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(ref.flags),
                                  np.asarray(sh.flags))
    for f in ("px", "py", "pz"):
        np.testing.assert_allclose(np.asarray(getattr(ref.buckets, f)),
                                   np.asarray(getattr(sh.buckets, f)),
                                   atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_rebin_and_p2gunion_zshard_match_unsharded():
    """Unit equality for the round-5 sharded kernels (VERDICT r4 item 4):
    rebin_zshard_spmd == flip_bucket.rebin and p2g_union_zshard_spmd ==
    p2g_union_pallas(interpret) on an 8-device z mesh, with particles
    displaced across slab boundaries."""
    from jax.sharding import Mesh

    from mantaflow_tpu.ops import flip_bucket as fb
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2

    res = 16
    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    st = flip.make_dam_state_bucketed(dom, params, discretization=2, ppc=12)
    bk = st.buckets

    # deterministic sub-cell displacements that cross z-slab boundaries
    rng = np.random.default_rng(7)
    d = rng.uniform(-0.9, 0.9, size=(3,) + bk.px.shape).astype(np.float32)
    import dataclasses
    bk = dataclasses.replace(
        bk,
        px=jnp.clip(bk.px + jnp.where(bk.valid, d[0], 0.0), 1.01,
                    res - 1.01),
        py=jnp.clip(bk.py + jnp.where(bk.valid, d[1], 0.0), 1.01,
                    res - 1.01),
        pz=jnp.clip(bk.pz + jnp.where(bk.valid, d[2], 0.0), 1.01,
                    res - 1.01))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("z",))

    ref = fb.rebin(bk, dom)
    sh = jax.jit(lambda b: fbp.rebin_zshard_spmd(b, dom, mesh))(bk)
    # the random displacement overflows a few cells past ppc=12 — both
    # paths must agree on the drops (and on everything else, below)
    assert int(sh.dropped) == int(ref.dropped)
    assert int(sh.count()) == int(ref.count())
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(sh, f)), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(sh.valid))

    vel_r, w_r, phi_r = fbp2.p2g_union_pallas(ref, dom, 1.0,
                                              interpret=True)
    vel_s, w_s, phi_s = jax.jit(lambda b: fbp2.p2g_union_zshard_spmd(
        b, dom, 1.0, mesh))(sh)
    np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vel_r), np.asarray(vel_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(phi_r), np.asarray(phi_s),
                               atol=1e-5)
