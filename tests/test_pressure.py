"""Pressure solver: CG convergence, MG-accelerated path, ghost fluid."""
import numpy as np
import jax
import jax.numpy as jnp

from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ops import pressure as prs


def _setup(res=32):
    from mantaflow_tpu.ops.extforces import set_wall_bcs
    dom = Domain(size=(res, res, res), dim=3)
    flags = fl.fill_grid(fl.init_domain(dom, 1), fl.TypeFluid)
    key = jax.random.PRNGKey(0)
    vel = jax.random.uniform(key, (3,) + dom.shape, jnp.float32, -0.5, 0.5)
    # wall BCs make the rhs compatible (no net boundary flux), as every
    # reference scene does before solvePressure
    vel = set_wall_bcs(flags, vel, dom)
    return dom, flags, vel


def _post_div(flags, vel, dom):
    from mantaflow_tpu.core.mac import neg_divergence
    from mantaflow_tpu.core.masks import interior_mask
    d = neg_divergence(vel)
    m = fl.is_fluid(flags) & interior_mask(dom, 1)
    return float(jnp.max(jnp.abs(jnp.where(m, d, 0.0))))


def test_cg_reaches_tolerance():
    dom, flags, vel = _setup()
    new_vel, p, rhs, iters, rn = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-3, cg_max_iter_fac=4.0)
    assert float(rn) < 1e-3
    assert _post_div(flags, new_vel, dom) < 2e-3


def test_mg_converges_in_few_iterations():
    dom, flags, vel = _setup()
    _, _, _, it_cg, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-3, cg_max_iter_fac=4.0)
    new_vel, p, rhs, it_mg, rn = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-3, preconditioner=prs.PcMGDynamic,
        cg_max_iter_fac=4.0)
    assert float(rn) < 1e-3
    assert int(it_mg) <= 12  # V-cycles converge ~0.2-0.5x per cycle
    assert int(it_mg) < int(it_cg) / 3
    assert _post_div(flags, new_vel, dom) < 2e-3


def test_ghost_fluid_free_surface():
    """With a levelset half-filling the domain, projection keeps the fluid
    region near divergence-free and the surface BC produces finite fields."""
    res = 24
    dom = Domain(size=(res, res, res), dim=3)
    flags = fl.init_domain(dom, 1)
    sz, sy, sx = dom.shape
    # interface strictly between cell centers: phi==0 exactly at a center is
    # the degenerate gfClamp case where the reference replaces surface-face
    # velocities outright (knReplaceClampedGhostFluidVels)
    y = jnp.arange(sy).reshape(1, sy, 1)
    phi = jnp.broadcast_to((y - sy / 2 + 0.3).astype(jnp.float32), dom.shape)
    flags = fl.update_from_levelset(fl.fill_grid(flags, fl.TypeEmpty), phi,
                                    1e10)
    key = jax.random.PRNGKey(1)
    vel = jax.random.uniform(key, (3,) + dom.shape, jnp.float32, -0.3, 0.3)
    new_vel, p, rhs, iters, rn = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-3, phi=phi, cg_max_iter_fac=8.0)
    assert np.isfinite(np.asarray(new_vel)).all()
    assert float(rn) < 1e-3
    # surface cells keep extra divergence from the ghost-fluid clamp
    # (gfClamp floor, pressure.cpp:126-131) — looser bound there
    assert _post_div(flags, new_vel, dom) < 2e-2


def test_mg_prebuilt_hierarchy_matches_rebuild():
    """PcMGStatic parity (pressure.cpp:250 caches GridMg per solver): a
    hierarchy built once at state-creation time and passed through
    mg_hierarchy= must give the identical solve as the in-call rebuild."""
    from mantaflow_tpu.ops.multigrid import build_mg_hierarchy
    dom, flags, vel = _setup()
    stencil = prs.make_laplace_stencil(flags, dom)
    hier = build_mg_hierarchy(flags, dom, stencil)
    v_dyn, p_dyn, _, it_dyn, rn_dyn = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-3, preconditioner=prs.PcMGStatic,
        cg_max_iter_fac=4.0)
    v_pre, p_pre, _, it_pre, rn_pre = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-3, preconditioner=prs.PcMGStatic,
        cg_max_iter_fac=4.0, mg_hierarchy=hier)
    assert int(it_pre) == int(it_dyn)
    np.testing.assert_array_equal(np.asarray(p_pre), np.asarray(p_dyn))
    np.testing.assert_array_equal(np.asarray(v_pre), np.asarray(v_dyn))


def test_auto_mg_at_tight_tolerance(monkeypatch):
    """Out-of-the-box tight-tolerance solves select the MG-accelerated path
    (reference parity: solvePressure defaults to a preconditioned solve,
    pressure.cpp:404-434) without a hand-set preconditioner flag. The
    production size gate (>=96, where MG wins and plain-CG budgets balloon)
    is lowered via MANTA_AUTO_MG_MIN_SIZE so the selection logic runs on a
    test-sized grid."""
    monkeypatch.setenv("MANTA_AUTO_MG_MIN_SIZE", "16")
    dom, flags, vel = _setup()
    # default call at 1e-4 == explicit PcMGDynamic call, bit for bit
    v_auto, p_auto, _, it_auto, rn_auto = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-4, cg_max_iter_fac=4.0)
    v_mg, p_mg, _, it_mg, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-4, preconditioner=prs.PcMGDynamic,
        cg_max_iter_fac=4.0)
    assert float(rn_auto) < 1e-4
    assert int(it_auto) == int(it_mg)
    np.testing.assert_array_equal(np.asarray(p_auto), np.asarray(p_mg))

    # kill switch restores plain CG (more iterations for the same target)
    monkeypatch.setenv("MANTA_NO_AUTO_MG", "1")
    _, _, _, it_plain, rn_plain = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=1e-4, cg_max_iter_fac=8.0)
    assert float(rn_plain) < 1e-4
    assert int(it_plain) > int(it_auto)
