"""Pressure projection: Poisson RHS, matrix-free PCG, velocity correction.

Behavioral port of ``source/plugin/pressure.cpp`` (MakeRhs :33,
knCorrectVelocity :88, ghost-fluid helpers :115-200, solvePressureSystem
:312, solvePressure :482) and the CG core of ``source/conjugategrad.cpp``
(doInit :210, iterate :238) / ``conjugategrad.h`` (ApplyMatrix :117,
MakeLaplaceMatrix :155).

TPU-first redesign notes:
- the 7-point operator is applied matrix-free from four stencil-coefficient
  arrays (A0/Ai/Aj/Ak, same meaning as the reference grids) via shifted
  multiplies XLA fuses into one pass;
- the CG iteration runs inside ``lax.while_loop`` — the whole solve is one
  XLA program, no host round-trips per iteration;
- the reference's serial mIC(0) preconditioner does not parallelize; parity
  of capability is provided by PcNone here and a multigrid preconditioner
  (see ops/multigrid.py) instead — a redesign flagged in SURVEY.md §7.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain, domain_from_shape
from ..core.masks import interior_mask, shift

# Preconditioner ids (pressure.cpp:27)
PcNone = 0
PcMIC = 1  # accepted but mapped to PcNone (serial algorithm; see module doc)
PcMGDynamic = 2
PcMGStatic = 3


# ---------------------------------------------------------------------------
# ghost fluid helpers (pressure.cpp:115-133)

def _theta(inside, outside):
    denom = inside - outside
    safe = jnp.where(denom < -1e-4, denom, -1.0)
    theta = jnp.clip(inside / safe, 0.0, 1.0)
    return jnp.where(denom > -1e-4, 0.5, theta)


def _ghost_fluid(phi_c, phi_nb, gf_clamp):
    """ghostFluidHelper: returns gfClamp itself when alpha < gfClamp
    (reference behavior, pressure.cpp:126-131), else 1 - 1/alpha."""
    alpha = _theta(phi_c, phi_nb)
    return jnp.where(alpha < gf_clamp, gf_clamp, 1.0 - 1.0 / jnp.maximum(alpha, gf_clamp))


def _surf_tens(phi_c, phi_nb, curv_c, curv_nb, surf_tens, gf_clamp):
    return surf_tens * (curv_nb - _ghost_fluid(phi_c, phi_nb, gf_clamp) * curv_c)


_AXES = ["x", "y", "z"]


def _neighbor_terms(dom: Domain):
    """(axis, direction) pairs for the 4/6-neighborhood."""
    dirs = [("x", -1), ("x", 1), ("y", -1), ("y", 1)]
    if dom.is3d:
        dirs += [("z", -1), ("z", 1)]
    return dirs


# ---------------------------------------------------------------------------
# RHS (MakeRhs, pressure.cpp:33-86)

def make_rhs(flags, vel, dom: Domain, per_cell_corr=None, fractions=None,
             obvel=None, phi=None, curv=None, surf_tens: float = 0.0,
             gf_clamp: float = 1e-4, enforce_compatibility: bool = False):
    fluid = fl.is_fluid(flags)
    if fractions is None:
        div = (vel[0] - shift(vel[0], 1, "x")) + (vel[1] - shift(vel[1], 1, "y"))
        if dom.is3d:
            div = div + (vel[2] - shift(vel[2], 1, "z"))
    else:
        div = (fractions[0] * vel[0] - shift(fractions[0] * vel[0], 1, "x")
               + fractions[1] * vel[1] - shift(fractions[1] * vel[1], 1, "y"))
        if dom.is3d:
            div = div + fractions[2] * vel[2] - shift(fractions[2] * vel[2], 1, "z")
        if obvel is not None:
            ob = ((1 - fractions[0]) * obvel[0] - shift((1 - fractions[0]) * obvel[0], 1, "x")
                  + (1 - fractions[1]) * obvel[1] - shift((1 - fractions[1]) * obvel[1], 1, "y"))
            if dom.is3d:
                ob = ob + ((1 - fractions[2]) * obvel[2]
                           - shift((1 - fractions[2]) * obvel[2], 1, "z"))
            div = div + ob

    if phi is not None and curv is not None:
        empty = fl.is_empty(flags)
        for ax, d in _neighbor_terms(dom):
            nb_empty = shift(empty, d, ax)
            term = _surf_tens(phi, shift(phi, d, ax), curv, shift(curv, d, ax),
                              surf_tens, gf_clamp)
            div = div + jnp.where(nb_empty, term, 0.0)

    if per_cell_corr is not None:
        div = div + per_cell_corr

    rhs = jnp.where(fluid & interior_mask(dom, 1), div, 0.0)

    if enforce_compatibility:
        m = (fluid & interior_mask(dom, 1)).astype(rhs.dtype)
        s = jnp.sum(rhs)
        cnt = jnp.maximum(jnp.sum(m), 1.0)
        # reference adds the constant to ALL cells (Grid::operator+= scalar)
        rhs = rhs + (-s / cnt)
    return rhs


# ---------------------------------------------------------------------------
# stencil coefficients (MakeLaplaceMatrix, conjugategrad.h:155-190;
# ApplyGhostFluidDiagonal, pressure.cpp:136-151)

def make_laplace_stencil(flags, dom: Domain, fractions=None, phi=None,
                         gf_clamp: float = 1e-4):
    """Returns (A0, Ai, Aj, Ak): diagonal and +x/+y/+z off-diagonals."""
    fluid = fl.is_fluid(flags)
    obst = fl.is_obstacle(flags)
    zero = jnp.zeros(dom.shape, dtype=jnp.float32)
    if fractions is None:
        a0 = zero
        for ax, d in _neighbor_terms(dom):
            a0 = a0 + jnp.where(~shift(obst, d, ax), 1.0, 0.0)
        ai = jnp.where(shift(fluid, 1, "x"), -1.0, 0.0)
        aj = jnp.where(shift(fluid, 1, "y"), -1.0, 0.0)
        ak = jnp.where(shift(fluid, 1, "z"), -1.0, 0.0) if dom.is3d else zero
    else:
        a0 = fractions[0] + shift(fractions[0], 1, "x") \
            + fractions[1] + shift(fractions[1], 1, "y")
        if dom.is3d:
            a0 = a0 + fractions[2] + shift(fractions[2], 1, "z")
        ai = jnp.where(shift(fluid, 1, "x"), -shift(fractions[0], 1, "x"), 0.0)
        aj = jnp.where(shift(fluid, 1, "y"), -shift(fractions[1], 1, "y"), 0.0)
        ak = (jnp.where(shift(fluid, 1, "z"), -shift(fractions[2], 1, "z"), 0.0)
              if dom.is3d else zero)

    mask = fluid & interior_mask(dom, 1)
    a0 = jnp.where(mask, a0, 0.0)
    ai = jnp.where(mask, ai, 0.0)
    aj = jnp.where(mask, aj, 0.0)
    ak = jnp.where(mask, ak, 0.0)

    if phi is not None:
        empty = fl.is_empty(flags)
        for ax, d in _neighbor_terms(dom):
            gf = _ghost_fluid(phi, shift(phi, d, ax), gf_clamp)
            a0 = a0 - jnp.where(mask & shift(empty, d, ax), gf, 0.0)
    return a0, ai, aj, ak


def apply_laplace(flags, src, stencil, dom: Domain):
    """ApplyMatrix (conjugategrad.h:117-151): dst=src on non-fluid cells."""
    a0, ai, aj, ak = stencil
    fluid = fl.is_fluid(flags)
    dst = (src * a0
           + shift(src, -1, "x") * shift(ai, -1, "x") + shift(src, 1, "x") * ai
           + shift(src, -1, "y") * shift(aj, -1, "y") + shift(src, 1, "y") * aj)
    if dom.is3d:
        dst = dst + shift(src, -1, "z") * shift(ak, -1, "z") + shift(src, 1, "z") * ak
    return jnp.where(fluid, dst, src)


# ---------------------------------------------------------------------------
# zero-pressure fixing (pressure.cpp:347-390)

def _fix_pressure(flags, rhs, stencil, dom: Domain):
    """Pin one fluid cell's pressure to zero when there are no empty cells.
    Dynamic (traced) equivalent of the reference's fixPidx search."""
    a0, ai, aj, ak = stencil
    fluid = fl.is_fluid(flags)
    empty = fl.is_empty(flags)
    num_empty = jnp.sum(empty)

    sz, sy, sx = dom.shape
    fluid_flat = fluid.reshape(-1)
    # preferred positions: top-center column (pressure.cpp:360-372)
    tc_i, tc_k = sx // 2, (sz // 2 if dom.is3d else 0)
    prefer = [(tc_k, sy - 1, tc_i), (tc_k, sy - 2, tc_i), (tc_k, sy - 3, tc_i)]
    pref_idx = jnp.array([(k * sy + j) * sx + i for (k, j, i) in prefer])
    pref_ok = fluid_flat[pref_idx]
    first_fluid = jnp.argmax(fluid_flat)  # first fluid cell in scan order
    fix = jnp.where(pref_ok[0], pref_idx[0],
                    jnp.where(pref_ok[1], pref_idx[1],
                              jnp.where(pref_ok[2], pref_idx[2], first_fluid)))
    do_fix = (num_empty == 0) & jnp.any(fluid_flat)

    strx, stry, strz = 1, sx, sx * sy

    def upd(arr, idx, val):
        return arr.reshape(-1).at[idx].set(jnp.where(do_fix, val, arr.reshape(-1)[idx])).reshape(arr.shape)

    def addu(arr, idx, val):
        return arr.reshape(-1).at[idx].add(jnp.where(do_fix, val, 0.0)).reshape(arr.shape)

    ai_f, aj_f, ak_f = ai.reshape(-1), aj.reshape(-1), ak.reshape(-1)
    # neighbors absorb the pinned value (zero here, so rhs untouched by value
    # terms) then the row/col are trivialized (fixPressure, pressure.cpp:238-258)
    rhs = upd(rhs, fix, 0.0)
    a0 = upd(a0, fix, 1.0)
    ai = upd(ai, fix, 0.0)
    aj = upd(aj, fix, 0.0)
    ak = upd(ak, fix, 0.0)
    ai = upd(ai, fix - strx, jnp.where(do_fix, 0.0, ai_f[fix - strx]))
    aj = upd(aj, fix - stry, jnp.where(do_fix, 0.0, aj_f[fix - stry]))
    if dom.is3d:
        ak = upd(ak, fix - strz, jnp.where(do_fix, 0.0, ak_f[fix - strz]))
    del addu
    return rhs, (a0, ai, aj, ak)


# ---------------------------------------------------------------------------
# CG core (conjugategrad.cpp:210-290)

def mg_richardson(rhs, flags, dom: Domain, stencil, precond_apply,
                  accuracy: float, max_cycles: int = 20):
    """Stationary iteration x += V(r): the multigrid used as a solver
    (reference GridMg supports standalone use, multigrid.h:31-86). Returns
    (x, cycles, resnorm). Converges ~0.2-0.5x residual per cycle; the
    float32 floor (~1e-4 relative) is handled by the CG tail in
    solve_pressure_system."""
    fluid = fl.is_fluid(flags)

    def res_of(x):
        r = rhs - apply_laplace(flags, x, stencil, dom)
        return jnp.where(fluid, r, 0.0)

    def cond(c):
        _, _, it, rn, done = c
        return (it < max_cycles) & (~done)

    def body(c):
        x, r, it, _, _ = c
        x = x + precond_apply(r)
        r = res_of(x)
        rn = jnp.max(jnp.abs(r))
        return (x, r, it + 1, rn, rn < accuracy)

    r0 = jnp.where(fluid, rhs, 0.0)
    init = (jnp.zeros_like(rhs), r0, jnp.int32(0), jnp.max(jnp.abs(r0)),
            jnp.array(False))
    x, r, it, rn, _ = jax.lax.while_loop(cond, body, init)
    return x, it, rn


def solve_pressure_system(rhs, flags, dom: Domain, stencil,
                          cg_accuracy: float = 1e-3,
                          cg_max_iter_fac: float = 1.5,
                          preconditioner: int = PcNone,
                          use_l2_norm: bool = False,
                          precond_apply=None,
                          max_iter: int | None = None,
                          mg_hierarchy=None,
                          use_pallas: bool = False,
                          pallas_unit_stencil: bool = False):
    """Run the solver on the assembled system; returns
    (pressure, iterations, resnorm).

    PcNone/PcMIC: plain CG (mIC(0) is inherently serial — SURVEY.md §7 — so
    PcMIC maps to PcNone). PcMGDynamic/PcMGStatic: multigrid V-cycles as a
    stationary solver, then plain CG polishes the float32 tail. This is a
    TPU redesign of the reference's MIC(0)/MG-preconditioned CG
    (pressure.cpp:396-441) with equivalent capability (solve to `accuracy`
    in few iterations).

    ``use_pallas``: run the unpreconditioned-CG branch as ONE VMEM-resident
    Pallas kernel (ops/pressure_pallas.py) when the problem qualifies
    (3D, max-norm, identity preconditioner, working set fits in VMEM, and
    rhs masked to fluid — the caller asserts the last via this flag).
    ``pallas_unit_stencil``: the off-diagonals are the plain -1 fluid-link
    form (no fractions, no zero-pressure fixing), so the kernel can derive
    them from the fluid mask instead of holding 3 more resident fields.
    """
    x_init = None
    mg_iters = jnp.int32(0)
    if precond_apply is None and preconditioner in (PcMGDynamic, PcMGStatic):
        from .multigrid import make_mg_preconditioner
        mg_apply = make_mg_preconditioner(flags, dom, stencil,
                                          hierarchy=mg_hierarchy)
        x_init, mg_iters, mg_rn = mg_richardson(
            rhs, flags, dom, stencil, mg_apply, cg_accuracy)
        precond_apply = None  # CG tail runs unpreconditioned

    if max_iter is None:
        max_iter = int(cg_max_iter_fac * max(dom.size)) * (1 if dom.is3d else 4)
        if preconditioner == PcMIC and x_init is None:
            # the caller sized the budget assuming mIC(0)-preconditioned CG
            # (reference default); plain CG needs far more iterations for
            # the same accuracy contract, and early exit makes extra budget
            # free when convergence is fast. 4x proved insufficient for
            # hard free-surface impact solves (test_2050: budget exhausted
            # at large residual -> ghost-fluid 1/theta amplified it into a
            # velocity blowup); 12x holds through the reference test set.
            max_iter *= 12

    if (use_pallas and x_init is None and precond_apply is None
            and not use_l2_norm):
        from . import pressure_pallas as prp
        # full-stencil mode measures faster than recomputing the
        # off-diagonals in VMEM every apply (32 vs 47 ms for a 1366-iter
        # solve @128^3 on v5e); prefer it when its 10 resident fields fit,
        # fall back to the 7-field unit mode for larger grids
        if prp.pallas_cg_supported(dom, unit_stencil=False):
            return prp.cg_solve_pallas(rhs, stencil, dom, cg_accuracy,
                                       max_iter, unit_stencil=False)
        if pallas_unit_stencil and prp.pallas_cg_supported(
                dom, unit_stencil=True):
            return prp.cg_solve_pallas(
                rhs, stencil, dom, cg_accuracy, max_iter,
                fluid=fl.is_fluid(flags), unit_stencil=True)

    if precond_apply is None:
        precond_apply = lambda r: r

    dot = lambda a, b: jnp.sum(a * b, dtype=jnp.float32)

    p0 = jnp.zeros_like(rhs) if x_init is None else x_init
    r0 = rhs if x_init is None else jnp.where(
        fl.is_fluid(flags), rhs - apply_laplace(flags, x_init, stencil, dom),
        rhs)
    z0 = precond_apply(r0)
    s0 = z0
    sigma0 = dot(z0, r0)

    def res_norm(r):
        if use_l2_norm:
            return jnp.sum(r * r, dtype=jnp.float32)  # GridSumSqr: no sqrt
        return jnp.max(jnp.abs(r))

    def cond(carry):
        _, _, _, _, it, rn, done = carry
        return (it < max_iter) & (~done)

    def body(carry):
        p, r, s, sigma, it, _, _ = carry
        tmp = apply_laplace(flags, s, stencil, dom)
        dp = dot(tmp, s)
        alpha = jnp.where(jnp.abs(dp) > 0, sigma / dp, 0.0)
        p = p + alpha * s
        r = r - alpha * tmp
        z = precond_apply(r)
        rn = res_norm(r)
        done = rn < cg_accuracy
        sigma_new = dot(z, r)
        beta = sigma_new / sigma
        s = jnp.where(done, s, z + beta * s)
        sigma = jnp.where(done, sigma, sigma_new)
        return (p, r, s, sigma, it + 1, rn, done)

    # the CG loop's early-exit check uses rn computed after the update, so
    # also skip entirely when the MG phase already converged
    already = res_norm(r0) < cg_accuracy
    init = (p0, r0, s0, sigma0, jnp.int32(0), res_norm(r0), already)
    p, r, s, sigma, iters, rn, done = jax.lax.while_loop(cond, body, init)
    return p, iters + mg_iters, rn


# ---------------------------------------------------------------------------
# viscosity / diffusion solve (cgSolveDiffusion, conjugategrad.cpp:350-424)

def cg_solve_diffusion(flags, grid, dom: Domain, alpha: float = 0.25,
                       cg_max_iter_fac: float = 1.0,
                       cg_accuracy: float = 1e-4):
    """Implicit diffusion (I + alpha*L) u_new = u via plain CG.

    Reference semantics kept: the Laplacian is assembled with an all-fluid
    dummy flag grid (interior only), obstacle rows become identity, the CG
    masks to the REAL flags' fluid region, and non-fluid cells end up ZERO
    (the reference overwrites the grid with the cleared CG solution vector).
    Scalar [z,y,x] or vector/MAC (3,z,y,x) input; vector grids diffuse each
    of the first 2 (2D) or 3 (3D) components independently.
    """
    dummy = jnp.full(dom.shape, fl.TypeFluid, jnp.int32)
    a0, ai, aj, ak = make_laplace_stencil(dummy, dom)
    obst = fl.is_obstacle(flags)
    al = jnp.float32(alpha)
    a0 = jnp.where(obst, 1.0, a0 * al + 1.0)
    ai = jnp.where(obst, 0.0, ai * al)
    aj = jnp.where(obst, 0.0, aj * al)
    ak = jnp.where(obst, 0.0, ak * al)
    stencil = (a0, ai, aj, ak)

    max_iter = int(cg_max_iter_fac * max(dom.size)) * (1 if dom.is3d else 4)
    fluid = fl.is_fluid(flags)

    def solve_comp(u):
        rhs = jnp.where(fluid, u, 0.0)
        x, _, _ = solve_pressure_system(
            rhs, flags, dom, stencil, cg_accuracy, cg_max_iter_fac,
            PcNone, False, None, max_iter)
        return jnp.where(fluid, x, 0.0)

    if grid.ndim == 3:
        return solve_comp(grid)
    n_comp = 3 if dom.is3d else 2
    comps = [solve_comp(grid[c]) if c < n_comp else grid[c]
             for c in range(grid.shape[0])]
    return jnp.stack(comps)


# ---------------------------------------------------------------------------
# velocity correction (knCorrectVelocity :88, ghost fluid :153-200)

def correct_velocity(flags, vel, pressure, dom: Domain, phi=None,
                     gf_clamp: float = 1e-4, curv=None, surf_tens: float = 0.0):
    fluid = fl.is_fluid(flags)
    empty = fl.is_empty(flags)
    outflow = fl.is_outflow(flags)
    inter = interior_mask(dom, 1)
    n_comp = 3 if dom.is3d else 2
    comps = [vel[0], vel[1], vel[2]]
    for c in range(n_comp):
        ax = _AXES[c]
        nb_fluid = shift(fluid, -1, ax)
        nb_empty = shift(empty, -1, ax)
        p_nb = shift(pressure, -1, ax)
        u = vel[c]
        # fluid cell rules
        u_fl = u - jnp.where(nb_fluid, pressure - p_nb,
                             jnp.where(nb_empty, pressure, 0.0))
        # empty (non-outflow) cell rules
        u_em = jnp.where(nb_fluid, u + p_nb, 0.0)
        new = jnp.where(fluid, u_fl, jnp.where(empty & ~outflow, u_em, u))
        comps[c] = jnp.where(inter, new, u)
    vel = jnp.stack(comps)

    if phi is not None:
        vel = _correct_velocity_ghost_fluid(flags, vel, pressure, phi, dom,
                                            gf_clamp, curv, surf_tens)
        vel = _replace_clamped_ghost_fluid(flags, vel, phi, dom, gf_clamp)
    return vel


def _correct_velocity_ghost_fluid(flags, vel, pressure, phi, dom: Domain,
                                  gf_clamp, curv, surf_tens):
    """knCorrectVelocityGhostFluid (pressure.cpp:153-187)."""
    fluid = fl.is_fluid(flags)
    empty = fl.is_empty(flags)
    outflow = fl.is_outflow(flags)
    inter = interior_mask(dom, 1)
    n_comp = 3 if dom.is3d else 2
    comps = [vel[0], vel[1], vel[2]]
    for c in range(n_comp):
        ax = _AXES[c]
        nb_fluid = shift(fluid, -1, ax)
        nb_empty = shift(empty, -1, ax)
        phi_nb = shift(phi, -1, ax)
        p_nb = shift(pressure, -1, ax)
        u = comps[c]
        gf_c = _ghost_fluid(phi, phi_nb, gf_clamp)       # at idx, offset -ax
        gf_nb = shift(_ghost_fluid(phi, shift(phi, 1, ax), gf_clamp), -1, ax)
        u_fl = u + jnp.where(nb_empty, pressure * gf_c, 0.0)
        u_em = jnp.where(nb_fluid, u - p_nb * gf_nb, 0.0)
        new = jnp.where(fluid, u_fl, jnp.where(empty & ~outflow, u_em, u))
        if curv is not None:
            st_c = _surf_tens(phi, phi_nb, curv, shift(curv, -1, ax), surf_tens, gf_clamp)
            st_nb = shift(_surf_tens(phi, shift(phi, 1, ax), curv,
                                     shift(curv, 1, ax), surf_tens, gf_clamp), -1, ax)
            new = jnp.where(fluid & nb_empty, new + st_c, new)
            new = jnp.where(empty & ~outflow & nb_fluid, new - st_nb, new)
        comps[c] = jnp.where(inter, new, u)
    return jnp.stack(comps)


def _replace_clamped_ghost_fluid(flags, vel, phi, dom: Domain, gf_clamp):
    """knReplaceClampedGhostFluidVels (pressure.cpp:208-224)."""
    fluid = fl.is_fluid(flags)
    empty = fl.is_empty(flags)
    inter = interior_mask(dom, 1)
    n_comp = 3 if dom.is3d else 2
    comps = [vel[0], vel[1], vel[2]]
    for c in range(n_comp):
        ax = _AXES[c]
        # clamped at lower neighbor cell, looking back toward us
        alpha_lo = shift(_theta(phi, shift(phi, 1, ax)), -1, ax)
        clamped_lo = alpha_lo < gf_clamp
        lo = shift(fluid, -1, ax) & clamped_lo
        alpha_hi = shift(_theta(phi, shift(phi, -1, ax)), 1, ax)
        clamped_hi = alpha_hi < gf_clamp
        hi = shift(fluid, 1, ax) & clamped_hi
        u = comps[c]
        new = jnp.where(lo, shift(u, -1, ax), u)
        new = jnp.where(hi & ~lo, shift(u, 1, ax), new)
        comps[c] = jnp.where(empty & inter, new, u)
    return jnp.stack(comps)


# ---------------------------------------------------------------------------
# top-level driver (solvePressure, pressure.cpp:482-525)

def solve_pressure(vel, flags, dom: Domain, cg_accuracy: float = 1e-3,
                   phi=None, per_cell_corr=None, fractions=None, obvel=None,
                   gf_clamp: float = 1e-4, cg_max_iter_fac: float = 1.5,
                   preconditioner: int = PcNone,
                   enforce_compatibility: bool = False,
                   use_l2_norm: bool = False,
                   zero_pressure_fixing: bool = False,
                   curv=None, surf_tens: float = 0.0,
                   precond_apply=None, max_iter: int | None = None,
                   mg_hierarchy=None, use_pallas_cg: bool | None = None):
    """Full projection; returns (vel', pressure, rhs, iterations, resnorm).

    ``use_pallas_cg``: None (default) auto-enables the whole-solve-in-VMEM
    Pallas CG kernel on single-chip TPU backends when the system qualifies
    (see solve_pressure_system); True/False force it. Kill switch:
    MANTA_NO_PALLAS_CG=1.

    Solver auto-selection (reference parity: solvePressure defaults to a
    PRECONDITIONED solve, pressure.cpp:404-434 mIC/MG): when the caller
    leaves the preconditioner at PcNone/PcMIC and asks for a tight tolerance
    (cg_accuracy <= 1e-4, where float32 plain CG needs hundreds of
    iterations and may stall), multigrid V-cycles + CG tail are selected
    automatically — unless the whole-solve-in-VMEM Pallas CG takes the
    solve, which is measured faster than MG at that tolerance on TPU
    (BASELINE.md: 204 iters x 0.023 ms vs 12.8 ms MG @128^3 1e-4). Kill
    switch: MANTA_NO_AUTO_MG=1."""
    import os
    rhs = make_rhs(flags, vel, dom, per_cell_corr, fractions, obvel, phi,
                   curv, surf_tens, gf_clamp, enforce_compatibility)
    stencil = make_laplace_stencil(flags, dom, fractions, phi, gf_clamp)
    fixed = zero_pressure_fixing or cg_accuracy < 1e-7
    if fixed:
        rhs, stencil = _fix_pressure(flags, rhs, stencil, dom)
    if use_pallas_cg is None:
        # single-device only: a full-grid pallas_call inside a
        # GSPMD-partitioned program would force a gather onto every chip
        # (the sharded models keep the XLA CG, whose stencil ops partition)
        use_pallas_cg = (jax.default_backend() == "tpu"
                         and jax.device_count() == 1
                         and os.environ.get("MANTA_NO_PALLAS_CG", "") != "1")
    # the Pallas kernel requires rhs == 0 outside fluid; the global
    # compatibility constant breaks that
    use_pallas_cg = use_pallas_cg and not enforce_compatibility

    auto_mg_min = int(os.environ.get("MANTA_AUTO_MG_MIN_SIZE", "96"))
    if (preconditioner in (PcNone, PcMIC) and cg_accuracy <= 1e-4
            and max(dom.size) >= auto_mg_min
            and precond_apply is None and not use_l2_norm
            and fractions is None and phi is None and not fixed
            and os.environ.get("MANTA_NO_AUTO_MG", "") != "1"):
        # plain unit stencils only: the Jacobi-smoothed V-cycle is a
        # validated contraction there (BASELINE.md MG table); ghost-fluid /
        # fraction-weighted systems keep plain CG (the V-cycle can diverge
        # on their modified operators — observed on test_1075/2045/2050).
        # Size gate: small grids converge comfortably within the plain-CG
        # budget and MUST keep the reference solver trajectory (the
        # reference-binary golden matrix at <=64 is threshold-tight —
        # test_0100/0150/1010 drift past their loose tiers under MG);
        # MG's measured win is the large tight-tolerance solve
        # (BASELINE.md: 12.8 vs 25.7 ms @128^3 1e-4).
        from . import pressure_pallas as prp
        pallas_takes_it = use_pallas_cg and (
            prp.pallas_cg_supported(dom, unit_stencil=False)
            or prp.pallas_cg_supported(dom, unit_stencil=True))
        if not pallas_takes_it:
            # PcMGStatic when the caller cached a hierarchy, else dynamic
            preconditioner = (PcMGStatic if mg_hierarchy is not None
                              else PcMGDynamic)
    pressure, iters, rn = solve_pressure_system(
        rhs, flags, dom, stencil, cg_accuracy, cg_max_iter_fac,
        preconditioner, use_l2_norm, precond_apply, max_iter, mg_hierarchy,
        use_pallas=use_pallas_cg,
        pallas_unit_stencil=fractions is None and not fixed)
    vel = correct_velocity(flags, vel, pressure, dom, phi, gf_clamp, curv,
                           surf_tens)
    return vel, pressure, rhs, iters, rn
