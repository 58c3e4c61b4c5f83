"""2D wave equation (height field), explicit and implicit (CG) integration.

Behavioral port of ``source/plugin/waves.cpp``: knCalcSecDeriv2d (:39),
totalSum/normalizeSumTo (:50/:56), MakeRhsWE (:70) + cgSolveWE (:87-150) —
the implicit solve reuses the matrix-free CG of ops/pressure.py on the
(I + s L) operator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.masks import interior_mask, shift
from .pressure import apply_laplace, make_laplace_stencil


def calc_sec_deriv_2d(v, dom: Domain):
    """5-point Laplacian (sign per reference: -4v + neighbors)."""
    lap = (-4.0 * v + shift(v, 1, "x") + shift(v, -1, "x")
           + shift(v, 1, "y") + shift(v, -1, "y"))
    return jnp.where(interior_mask(dom, 1), lap, 0.0)


def total_sum(h, dom: Domain):
    return jnp.sum(jnp.where(interior_mask(dom, 1), h, 0.0))


def normalize_sum_to(h, dom: Domain, target: float):
    s = total_sum(h, dom)
    return h * (target / s)


def cg_solve_wave_eq(flags, ut, utm1, dt, dom: Domain,
                     crank_nic: bool = False, c_sqr: float = 0.25,
                     cg_max_iter_fac: float = 1.5,
                     cg_accuracy: float = 1e-5):
    """Implicit wave-equation step: solve (I + s*L) u_{t+1} = rhs.
    Returns (ut_new, utm1_new, iterations, resnorm) with the reference's
    swap semantics (utm1 <- ut, ut <- solution)."""
    s = dt * dt * c_sqr * 0.5
    a0, ai, aj, ak = make_laplace_stencil(flags, dom)
    stencil = (a0 * s + 1.0, ai * s, aj * s, ak * s)

    rhs = 2.0 * ut - utm1
    if crank_nic:
        rhs = rhs + s * calc_sec_deriv_2d(ut, dom)
    rhs = jnp.where(interior_mask(dom, 1), rhs, 0.0)

    max_iter = int(cg_max_iter_fac * max(dom.size)) * (1 if dom.is3d else 4)
    dot = lambda a, b: jnp.sum(a * b, dtype=jnp.float32)

    def cond(c):
        _, _, _, _, it, rn, done = c
        return (it < max_iter) & (~done)

    def body(c):
        x, r, srch, sigma, it, _, _ = c
        tmp = apply_laplace(flags, srch, stencil, dom)
        dp = dot(tmp, srch)
        alpha = jnp.where(jnp.abs(dp) > 0, sigma / dp, 0.0)
        x = x + alpha * srch
        r = r - alpha * tmp
        # this fork's GridCgInterface defaults mUseL2Norm=true
        # (conjugategrad.h:31), and cgSolveWE never overrides it: the
        # convergence metric is GridSumSqr (sum of squares, NO sqrt)
        rn = dot(r, r)
        done = rn < cg_accuracy
        sigma_new = dot(r, r)
        beta = sigma_new / jnp.maximum(sigma, 1e-30)
        srch = jnp.where(done, srch, r + beta * srch)
        sigma = jnp.where(done, sigma, sigma_new)
        return (x, r, srch, sigma, it + 1, rn, done)

    x0 = jnp.zeros_like(rhs)
    init = (x0, rhs, rhs, dot(rhs, rhs), jnp.int32(0),
            dot(rhs, rhs), jnp.array(False))
    x, r, srch, sigma, iters, rn, _ = jax.lax.while_loop(cond, body, init)
    return x, ut, iters, rn


def explicit_wave_step(flags, ut, utm1, vel_grid, dt, dom: Domain,
                       c_sqr: float = 0.25):
    """Explicit leapfrog update used by waveEquation.py:
    u_{t+1} = 2 u_t - u_{t-1} + dt^2 c^2 L u_t (via calcSecDeriv2d)."""
    curv = calc_sec_deriv_2d(ut, dom)
    new = 2.0 * ut - utm1 + dt * dt * c_sqr * curv
    new = jnp.where(interior_mask(dom, 1) & ~fl.is_obstacle(flags), new, ut)
    return new, ut
