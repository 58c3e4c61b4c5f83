"""Whole-solve-in-VMEM Pallas CG (ops/pressure_pallas.py) vs the XLA CG.

Runs the kernel in interpret mode (CPU backend); asserts the solved
pressure matches solve_pressure_system's to solver tolerance on a
free-surface + obstacle system, in both stencil modes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mantaflow_tpu.core import flags as fl
from mantaflow_tpu.core.domain import Domain
from mantaflow_tpu.ops import pressure as prs
from mantaflow_tpu.ops import pressure_pallas as prp


def _free_surface_system(n=24, with_obstacle=True):
    """Basin + drop levelset system with ghost-fluid diagonal terms."""
    dom = Domain(size=(n, n, n), dim=3)
    flags = fl.init_domain(dom, 1)
    zc, yc, xc = jnp.meshgrid(jnp.arange(n) + 0.5, jnp.arange(n) + 0.5,
                              jnp.arange(n) + 0.5, indexing="ij")
    basin = yc - 0.4 * n
    drop = jnp.sqrt((xc - n / 2) ** 2 + (yc - 0.7 * n) ** 2
                    + (zc - n / 2) ** 2) - 0.15 * n
    phi = jnp.minimum(basin, drop).astype(jnp.float32)
    flags = fl.update_from_levelset(flags, phi, 1e10)
    if with_obstacle:
        obs = (jnp.sqrt((xc - 0.3 * n) ** 2 + (yc - 0.2 * n) ** 2
                        + (zc - 0.5 * n) ** 2) < 0.12 * n)
        flags = jnp.where(obs, jnp.int32(fl.TypeObstacle), flags)

    rng = np.random.RandomState(7)
    vel = jnp.asarray(rng.randn(3, n, n, n).astype(np.float32) * 0.1)
    rhs = prs.make_rhs(flags, vel, dom, phi=phi)
    stencil = prs.make_laplace_stencil(flags, dom, phi=phi)
    return dom, flags, rhs, stencil


def test_pallas_cg_matches_xla_unit_stencil():
    dom, flags, rhs, stencil = _free_surface_system()
    acc = 1e-4
    max_iter = int(1.5 * max(dom.size)) * 12  # PcMIC-parity budget
    p_ref, it_ref, rn_ref = prs.solve_pressure_system(
        rhs, flags, dom, stencil, cg_accuracy=acc, max_iter=max_iter)
    p_pl, it_pl, rn_pl = prp.cg_solve_pallas(
        rhs, stencil, dom, acc, max_iter,
        fluid=fl.is_fluid(flags), unit_stencil=True, interpret=True)
    assert float(rn_ref) < acc and float(rn_pl) < acc
    # block-wise vs flat reduction order shifts the ghost-fluid CG
    # trajectory near tolerance; both must land within a few iterations
    assert abs(int(it_pl) - int(it_ref)) <= 10
    scale = float(jnp.max(jnp.abs(p_ref))) + 1e-30
    assert float(jnp.max(jnp.abs(p_pl - p_ref))) / scale < 5e-3


def test_pallas_cg_full_stencil_matches_unit():
    dom, flags, rhs, stencil = _free_surface_system()
    acc = 1e-4
    max_iter = int(1.5 * max(dom.size)) * 12
    p_u, it_u, rn_u = prp.cg_solve_pallas(
        rhs, stencil, dom, acc, max_iter,
        fluid=fl.is_fluid(flags), unit_stencil=True, interpret=True)
    p_f, it_f, rn_f = prp.cg_solve_pallas(
        rhs, stencil, dom, acc, max_iter, unit_stencil=False,
        interpret=True)
    # same coefficients, same reduction order -> same trajectory (up to
    # ulp-level fusion differences in the derived-stencil arithmetic)
    assert int(it_u) == int(it_f)
    scale = float(jnp.max(jnp.abs(p_u))) + 1e-30
    assert float(jnp.max(jnp.abs(p_u - p_f))) / scale < 1e-5


def test_pallas_cg_fixed_pressure_stencil():
    """Closed-domain (no empty cells) system after zero-pressure fixing:
    full-stencil mode must handle the pinned row."""
    n = 16
    dom = Domain(size=(n, n, n), dim=3)
    flags = fl.init_domain(dom, 1)
    flags = fl.fill_grid(flags, fl.TypeFluid)
    rng = np.random.RandomState(3)
    vel = jnp.asarray(rng.randn(3, n, n, n).astype(np.float32) * 0.1)
    rhs = prs.make_rhs(flags, vel, dom)
    stencil = prs.make_laplace_stencil(flags, dom)
    rhs, stencil = prs._fix_pressure(flags, rhs, stencil, dom)
    acc = 1e-4
    max_iter = int(1.5 * n) * 12
    p_ref, it_ref, _ = prs.solve_pressure_system(
        rhs, flags, dom, stencil, cg_accuracy=acc, max_iter=max_iter)
    p_pl, it_pl, rn_pl = prp.cg_solve_pallas(
        rhs, stencil, dom, acc, max_iter, unit_stencil=False,
        interpret=True)
    assert float(rn_pl) < acc
    scale = float(jnp.max(jnp.abs(p_ref))) + 1e-30
    assert float(jnp.max(jnp.abs(p_pl - p_ref))) / scale < 5e-3


def test_supported_gate():
    # 7 fields @ 128^3 = 56 MB, 10 @ 128^3 = 86 MB: both under the 96 MB
    # budget; 10 @ 160^3 = 166 MB is not
    assert prp.pallas_cg_supported(Domain(size=(128, 128, 128), dim=3), True)
    assert prp.pallas_cg_supported(Domain(size=(128, 128, 128), dim=3), False)
    assert not prp.pallas_cg_supported(Domain(size=(160, 160, 160), dim=3),
                                       False)
    assert not prp.pallas_cg_supported(Domain(size=(64, 64, 1), dim=2), True)
    assert prp.pallas_cg_supported(Domain(size=(96, 96, 96), dim=3), False)
