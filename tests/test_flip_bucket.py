"""Bucketed particle pipeline (ops/flip_bucket.py) vs the flat path.

The bucket layout computes the same per-particle math as the flat ops
(plugin/flip.cpp ports) with different summation order, so fields must agree
to float-accumulation tolerance, and structural invariants (binning, count
conservation, zero drops) must hold exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core import particles as cp
from mantaflow_tpu.models import flip
from mantaflow_tpu.ops import flip as fo
from mantaflow_tpu.ops import flip_bucket as fb


@pytest.fixture(scope="module")
def dam16():
    dom = Domain(size=(16, 16, 16), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True,
                             cg_accuracy=1e-3)
    st = flip.make_dam_state(dom, params, discretization=2)
    bk = fb.bin_from_particles(st.parts, st.pvel, dom, ppc=14)
    return dom, params, st, bk


def test_bin_roundtrip(dam16):
    dom, _, st, bk = dam16
    assert int(bk.dropped) == 0
    assert int(bk.count()) == int(st.parts.count)
    # every valid particle sits inside its bucket cell
    cx, cy, cz = fb._cell_coords(dom)
    for p, c in ((bk.px, cx), (bk.py, cy), (bk.pz, cz)):
        assert int(jnp.sum(bk.valid
                           & (p.astype(jnp.int32) != c[None, :]))) == 0
    # position multiset preserved
    parts2, _ = fb.to_particles(bk, dom)
    a = np.sort(np.asarray(st.parts.pos[: int(st.parts.count)]).round(5),
                axis=0)
    b = np.sort(np.asarray(parts2.pos[: int(parts2.count)]).round(5), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_counts_match_flat(dam16):
    dom, _, st, bk = dam16
    flat_counts = fo.particle_counts(st.parts, dom)
    np.testing.assert_array_equal(np.asarray(fb.counts_bucketed(bk, dom)),
                                  np.asarray(flat_counts))


def test_p2g_matches_flat(dam16):
    dom, _, st, bk = dam16
    pvel = jnp.where(st.parts.active_mask()[:, None],
                     st.parts.pos * 0.01 - 0.05, 0.0)
    bk2 = fb.Buckets(px=bk.px, py=bk.py, pz=bk.pz,
                     vx=jnp.where(bk.valid, bk.px * 0.01 - 0.05, 0.0),
                     vy=jnp.where(bk.valid, bk.py * 0.01 - 0.05, 0.0),
                     vz=jnp.where(bk.valid, bk.pz * 0.01 - 0.05, 0.0),
                     valid=bk.valid, dropped=bk.dropped)
    vel_f, w_f = fo.map_parts_to_mac(st.parts, pvel, st.flags, dom)
    vel_b, w_b = fb.p2g_mac(bk2, dom)
    np.testing.assert_allclose(np.asarray(vel_f), np.asarray(vel_b),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_b), atol=2e-5)


def test_union_levelset_matches_flat(dam16):
    dom, _, st, bk = dam16
    phi_f = fo.union_particle_levelset(st.parts, st.flags, dom, 1.0)
    phi_b = fb.union_levelset_bucketed(bk, dom, 1.0)
    np.testing.assert_allclose(np.asarray(phi_f), np.asarray(phi_b),
                               atol=1e-5)


def test_full_step_matches_flat(dam16):
    dom, params, st, _ = dam16
    st_bk = flip.make_dam_state_bucketed(dom, params, discretization=2,
                                         ppc=14)
    step_f = jax.jit(lambda s: flip.flip_step(s, dom, params))
    step_b = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    for i in range(6):
        st = step_f(st)
        st_bk = step_b(st_bk)
    assert int(st_bk.buckets.dropped) == 0
    assert int(st_bk.buckets.count()) == int(st.parts.count)
    np.testing.assert_array_equal(np.asarray(st.flags),
                                  np.asarray(st_bk.flags))
    np.testing.assert_allclose(np.asarray(st.vel), np.asarray(st_bk.vel),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.phi), np.asarray(st_bk.phi),
                               atol=1e-4)
    # rebin invariant after several steps
    bk = st_bk.buckets
    cx, cy, cz = fb._cell_coords(dom)
    for p, c in ((bk.px, cx), (bk.py, cy), (bk.pz, cz)):
        assert int(jnp.sum(bk.valid
                           & (p.astype(jnp.int32) != c[None, :]))) == 0


def test_rebin_moves_particles():
    """Force a known migration: one particle pushed across a cell border."""
    dom = Domain(size=(8, 8, 8), dim=3)
    pos = np.array([[3.2, 3.5, 3.5], [3.8, 3.5, 3.5]], np.float32)
    parts = cp.make_particles(pos, capacity=16)
    pvel = jnp.zeros((16, 3), jnp.float32)
    bk = fb.bin_from_particles(parts, pvel, dom, ppc=4)
    # manually displace: +0.9 in x moves particle 1 to cell 4
    bk = fb.Buckets(px=jnp.where(bk.valid, bk.px + 0.9, bk.px), py=bk.py,
                    pz=bk.pz, vx=bk.vx, vy=bk.vy, vz=bk.vz, valid=bk.valid,
                    dropped=bk.dropped)
    bk = fb.rebin(bk, dom)
    assert int(bk.dropped) == 0
    assert int(bk.count()) == 2
    counts = np.asarray(fb.counts_bucketed(bk, dom))
    assert counts[3, 3, 4] == 2  # both now in cell x=4 (4.1 and 4.7)


def test_pallas_transfer_kernels_match_xla(dam16):
    """Pallas p2g / union levelset / FLIP blend (ops/flip_bucket_pallas2.py,
    interpret mode off-TPU) match the XLA bucket forms."""
    import dataclasses
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    dom, _, st, bk = dam16
    bk = dataclasses.replace(
        bk, vx=jnp.where(bk.valid, bk.px * 0.01, 0.0),
        vy=jnp.where(bk.valid, bk.py * 0.02 - 0.05, 0.0),
        vz=jnp.where(bk.valid, bk.pz * 0.005, 0.0))

    v_ref, w_ref = fb.p2g_mac(bk, dom)
    v_pl, w_pl = fbp2.p2g_mac_pallas(bk, dom, interpret=True)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_pl),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_ref), np.asarray(w_pl),
                               atol=1e-5)

    phi_ref = fb.union_levelset_bucketed(bk, dom)
    phi_pl = fbp2.union_levelset_pallas(bk, dom, interpret=True)
    np.testing.assert_allclose(np.asarray(phi_ref), np.asarray(phi_pl),
                               atol=1e-6)

    rng = np.random.RandomState(0)
    vel = jnp.asarray(rng.randn(3, *dom.shape).astype(np.float32)) * 0.01
    vold = jnp.asarray(rng.randn(3, *dom.shape).astype(np.float32)) * 0.01
    b_ref = fb.flip_update_bucketed(bk, vel, vold, 0.97, dom)
    b_pl = fbp2.flip_update_pallas(bk, vel, vold, 0.97, dom, interpret=True)
    for f in ("vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(b_ref, f)),
                                   np.asarray(getattr(b_pl, f)), atol=1e-6)


def test_union_levelset_wide_radius(dam16):
    """radius_factor > ~1.14 needs a 2-cell window: bucketed (XLA + Pallas)
    must match the flat path's widened neighborhood."""
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    dom, _, st, bk = dam16
    phi_f = fo.union_particle_levelset(st.parts, st.flags, dom, 1.5)
    phi_b = fb.union_levelset_bucketed(bk, dom, 1.5)
    np.testing.assert_allclose(np.asarray(phi_f), np.asarray(phi_b),
                               atol=1e-5)
    phi_p = fbp2.union_levelset_pallas(bk, dom, 1.5, interpret=True)
    np.testing.assert_allclose(np.asarray(phi_b), np.asarray(phi_p),
                               atol=1e-6)


def test_bucketed_guards():
    """apic and cfl>1 configs are rejected; CFL-contract violations are
    surfaced through buckets.dropped."""
    import pytest
    dom = Domain(size=(12, 12, 12), dim=3)
    p_apic = flip.FlipParams(apic=True)
    st = flip.make_dam_state_bucketed(dom, flip.FlipParams())
    with pytest.raises(ValueError, match="FLIP blend"):
        flip.flip_step_bucketed(st, dom, p_apic)
    with pytest.raises(ValueError, match="cfl"):
        flip.flip_step_bucketed(st, dom,
                                flip.FlipParams(adaptive_dt=True, cfl=3.0))
    # violate the contract at runtime: huge grid velocity, fixed dt
    st2 = flip.make_dam_state_bucketed(dom, flip.FlipParams())
    st2 = flip.FlipBucketState(
        flags=st2.flags, vel=st2.vel + 10.0, vel_old=st2.vel_old,
        pressure=st2.pressure, phi=st2.phi, buckets=st2.buckets, ts=st2.ts)
    out = flip.flip_step_bucketed(st2, dom, flip.FlipParams(ghost_fluid=True))
    assert int(out.buckets.dropped) >= 1_000_000


@pytest.fixture(scope="module")
def corner24():
    """Corner dam in a 24^3 box: most (z, y-block) tiles hold NO particles,
    so the Pallas kernels' empty-tile skip branches (tile_occupancy +
    pl.when pass-through) are exercised against the skip-free XLA forms."""
    dom = Domain(size=(24, 24, 24), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    st = flip.make_dam_state(dom, params, dam_frac=(0.3, 0.3, 0.35),
                             discretization=2)
    bk = fb.bin_from_particles(st.parts, st.pvel, dom, ppc=12)
    rng = np.random.RandomState(7)
    # gentle enough that no bucket overflows after one advect+rebin
    vel = jnp.asarray(rng.randn(3, *dom.shape).astype(np.float32)) * 0.25
    return dom, st.flags, bk, vel


def test_pallas_advect_rebin_match_xla(corner24):
    """Pallas advect + rebin (ops/flip_bucket_pallas.py, interpret mode)
    match the XLA bucket forms, skip branches included."""
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    dom, flags, bk, vel = corner24
    from mantaflow_tpu.ops.flip_bucket_pallas import tile_occupancy
    occ = np.asarray(tile_occupancy(bk.valid, dom, 8))
    assert (occ == 0).any() and (occ == 1).any()  # both branches exercised

    ref = fb.advect_bucketed(bk, flags, vel, 0.5, dom, 2)
    got = fbp.advect_pallas(bk, flags, vel, 0.5, dom, 2, interpret=True)
    for f in ("px", "py", "pz"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(got, f)), atol=1e-6)

    ref2 = fb.rebin(ref, dom)
    got2 = fbp.rebin_pallas(ref, dom, interpret=True)
    assert int(got2.dropped) == int(ref2.dropped) == 0
    np.testing.assert_array_equal(np.asarray(ref2.valid),
                                  np.asarray(got2.valid))
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(ref2, f)),
                                   np.asarray(getattr(got2, f)), atol=1e-6)


def test_pallas_transfer_kernels_match_xla_sparse(corner24):
    """p2g / union levelset / blend Pallas kernels on the mostly-empty
    corner dam: the y-tiled skip path must not change results."""
    import dataclasses
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    dom, flags, bk, vel = corner24
    bk = dataclasses.replace(
        bk, vx=jnp.where(bk.valid, bk.px * 0.01, 0.0),
        vy=jnp.where(bk.valid, bk.py * 0.02 - 0.05, 0.0),
        vz=jnp.where(bk.valid, bk.pz * 0.005, 0.0))

    v_ref, w_ref = fb.p2g_mac(bk, dom)
    v_pl, w_pl = fbp2.p2g_mac_pallas(bk, dom, interpret=True)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_pl),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_ref), np.asarray(w_pl),
                               atol=1e-5)

    phi_ref = fb.union_levelset_bucketed(bk, dom)
    phi_pl = fbp2.union_levelset_pallas(bk, dom, interpret=True)
    np.testing.assert_allclose(np.asarray(phi_ref), np.asarray(phi_pl),
                               atol=1e-6)
    phi_w = fbp2.union_levelset_pallas(bk, dom, 1.5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fb.union_levelset_bucketed(bk, dom, 1.5)),
        np.asarray(phi_w), atol=1e-6)

    b_ref = fb.flip_update_bucketed(bk, vel, vel * 0.9, 0.97, dom)
    b_pl = fbp2.flip_update_pallas(bk, vel, vel * 0.9, 0.97, dom,
                                   interpret=True)
    for f in ("vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(b_ref, f)),
                                   np.asarray(getattr(b_pl, f)), atol=1e-6)


def test_rebin_fused_matches_xla(corner24):
    """Single-kernel streaming rebin (rebin_fused) == 3-pass XLA rebin on
    the mostly-empty corner dam (plane-skip + ring-buffer edges included)."""
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    dom, flags, bk, vel = corner24
    moved = fb.advect_bucketed(bk, flags, vel, 0.5, dom, 2)
    ref = fb.rebin(moved, dom)
    got = fbp.rebin_fused(moved, dom, interpret=True)
    assert int(got.dropped) == int(ref.dropped) == 0
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(got, f)), atol=1e-6)


def test_rebin_fused_overflow_drops_match():
    """Bucket overflow: both forms drop the same (merge-order-last)
    particles and report the same dropped count."""
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    dom = Domain(size=(8, 8, 8), dim=3)
    # 5 particles converging into cell (3,3,3) with ppc=4 -> 1 drop
    pos = np.array([[3.5, 3.5, 3.5], [2.6, 3.5, 3.5], [4.4, 3.5, 3.5],
                    [3.5, 2.7, 3.5], [3.5, 3.5, 4.3]], np.float32)
    parts = cp.make_particles(pos, capacity=8)
    pvel = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3) * 0.01
    bk = fb.bin_from_particles(parts, pvel, dom, ppc=4)
    # pull everyone toward the center cell
    tgt = np.array([3.5, 3.5, 3.5], np.float32)
    import dataclasses
    bk = dataclasses.replace(
        bk,
        px=jnp.where(bk.valid, bk.px + 0.9 * (tgt[0] - bk.px), bk.px),
        py=jnp.where(bk.valid, bk.py + 0.9 * (tgt[1] - bk.py), bk.py),
        pz=jnp.where(bk.valid, bk.pz + 0.9 * (tgt[2] - bk.pz), bk.pz))
    ref = fb.rebin(bk, dom)
    got = fbp.rebin_fused(bk, dom, interpret=True)
    assert int(ref.dropped) == int(got.dropped) == 1
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(got.valid))
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(got, f)), atol=1e-6)


def test_fused_advect_blend_matches_sequence(corner24):
    """advect_blend_pallas == flip_update_bucketed followed by
    advect_bucketed (pending=True), and == plain advect with velocities
    untouched when pending=False."""
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    dom, flags, bk, vel = corner24
    vold = vel * 0.85

    ref = fb.flip_update_bucketed(bk, vel, vold, 0.97, dom)
    ref = fb.advect_bucketed(ref, flags, vel, 0.5, dom, 2)
    got = fbp.advect_blend_pallas(bk, flags, vel, vold, 0.5,
                                  jnp.ones((), jnp.bool_), 0.97, dom, 2,
                                  interpret=True)
    for f in ("px", "py", "pz", "vx", "vy", "vz"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(got, f)), atol=1e-6,
                                   err_msg=f)

    ref0 = fb.advect_bucketed(bk, flags, vel, 0.5, dom, 2)
    got0 = fbp.advect_blend_pallas(bk, flags, vel, vold, 0.5,
                                   jnp.zeros((), jnp.bool_), 0.97, dom, 2,
                                   interpret=True)
    for f in ("px", "py", "pz"):
        np.testing.assert_allclose(np.asarray(getattr(ref0, f)),
                                   np.asarray(getattr(got0, f)), atol=1e-6)
    for f in ("vx", "vy", "vz"):  # pending=False: velocities pass through
        np.testing.assert_array_equal(np.asarray(getattr(bk, f)),
                                      np.asarray(getattr(got0, f)))


def test_finalize_buckets_closes_blend_lag():
    """N bucketed steps + finalize == the same sequence with the blend
    applied at each step's tail (i.e. particle velocities match the flat
    path's convention after finalize)."""
    dom = Domain(size=(16, 16, 16), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    st = flip.make_dam_state_bucketed(dom, params, discretization=2, ppc=14)
    step = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    for _ in range(3):
        st = step(st)
    assert bool(st.blend_pending)
    fin = flip.finalize_buckets(st, dom, params)
    assert not bool(fin.blend_pending)
    # finalize == applying flip_update_bucketed by hand
    ref = fb.flip_update_bucketed(st.buckets, st.vel, st.vel_old,
                                  params.flip_ratio, dom)
    for f in ("vx", "vy", "vz"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(fin.buckets, f)))
    # idempotent
    fin2 = flip.finalize_buckets(fin, dom, params)
    np.testing.assert_array_equal(np.asarray(fin.buckets.vx),
                                  np.asarray(fin2.buckets.vx))


def test_full_step_matches_flat_with_obstacle():
    """Bucketed-vs-flat equality WITH an interior sphere obstacle + ghost
    fluid at a non-toy grid: the fast path must be a full capability, not
    a ring-only shortcut (flip06_obstacle.py pattern, pushOutofObs /
    obstacle-aware advection flip.cpp:599)."""
    from mantaflow_tpu.core.shapes import Sphere
    res = 48
    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(gravity=(0.0, -0.003, 0.0), ghost_fluid=True)
    obs = Sphere(center=(res * 0.7, res * 0.28, res * 0.5),
                 radius=res * 0.15)
    st = flip.make_dam_state(dom, params, discretization=2, obstacle=obs)
    st_bk = flip.make_dam_state_bucketed(dom, params, discretization=2,
                                         obstacle=obs, ppc=14)
    step_f = jax.jit(lambda s: flip.flip_step(s, dom, params))
    step_b = jax.jit(lambda s: flip.flip_step_bucketed(s, dom, params))
    for _ in range(4):
        st = step_f(st)
        st_bk = step_b(st_bk)
    assert int(st_bk.buckets.dropped) == 0
    assert int(st_bk.buckets.count()) == int(st.parts.count)
    np.testing.assert_array_equal(np.asarray(st.flags),
                                  np.asarray(st_bk.flags))
    np.testing.assert_allclose(np.asarray(st.vel), np.asarray(st_bk.vel),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.phi), np.asarray(st_bk.phi),
                               atol=2e-4)
    # no particle ended up inside the obstacle
    from mantaflow_tpu.core import flags as fl
    bk = st_bk.buckets
    obs_cells = np.asarray(fl.is_obstacle(st_bk.flags)).reshape(-1)
    occupied = np.asarray(bk.valid).any(axis=0)
    assert not (obs_cells & occupied).any()


def test_pallas_kernels_with_interior_obstacle():
    """Pallas advect (interpret) == XLA advect with a stamped interior
    obstacle: the flags-at-position probes and bisection pushout read the
    obstacle planes, not just the bounds test."""
    from mantaflow_tpu.core import flags as fl
    from mantaflow_tpu.core.shapes import Sphere
    from mantaflow_tpu.ops import flip_bucket_pallas as fbp
    res = 24
    dom = Domain(size=(res, res, res), dim=3)
    params = flip.FlipParams(ghost_fluid=True)
    obs = Sphere(center=(res * 0.6, res * 0.4, res * 0.5), radius=res * 0.2)
    st = flip.make_dam_state(dom, params, dam_frac=(0.5, 0.7, 1.0),
                             discretization=2, obstacle=obs)
    bk = fb.bin_from_particles(st.parts, st.pvel, dom, ppc=12)
    rng = np.random.RandomState(3)
    vel = jnp.asarray(rng.randn(3, *dom.shape).astype(np.float32)) * 0.4
    ref = fb.advect_bucketed(bk, st.flags, vel, 0.8, dom, 2)
    got = fbp.advect_pallas(bk, st.flags, vel, 0.8, dom, 2, interpret=True)
    for f in ("px", "py", "pz"):
        np.testing.assert_allclose(np.asarray(getattr(ref, f)),
                                   np.asarray(getattr(got, f)), atol=1e-6)


def test_fused_p2g_union_matches_separate(corner24):
    """p2g_union_pallas == (p2g_mac, union_levelset_bucketed) pair."""
    from mantaflow_tpu.ops import flip_bucket_pallas2 as fbp2
    dom, flags, bk, vel = corner24
    v_ref, w_ref = fb.p2g_mac(bk, dom)
    phi_ref = fb.union_levelset_bucketed(bk, dom, 1.0)
    v, w, phi = fbp2.p2g_union_pallas(bk, dom, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w_ref), np.asarray(w), atol=2e-5)
    np.testing.assert_allclose(np.asarray(phi_ref), np.asarray(phi),
                               atol=2e-5)
