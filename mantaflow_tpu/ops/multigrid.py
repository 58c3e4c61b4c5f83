"""Geometric multigrid V-cycle, used as the CG preconditioner.

Capability port of the reference GridMg (``source/multigrid.h/.cpp``:
Galerkin-coarsened operator, serial Gauss-Seidel smoothing, coarse-grid CG)
re-designed for TPU data parallelism, as SURVEY.md §7 flags: Gauss-Seidel
and mIC(0) are inherently sequential, so smoothing here is damped Jacobi
(whole-grid fused ops, fori_loop), coarsening rediscretizes the 7-point
operator on obstacle-priority pooled flags, and transfers are trilinear
prolongation with its exact adjoint as restriction — both renormalized by
the fluid mask so corrections near Neumann walls are not damped by zero
leakage from non-fluid cells (the naive pair stalls at convergence factor
~0.9; renormalized it reaches ~0.2-0.5 per cycle). The P = c R^T pairing
keeps the preconditioner symmetric positive for CG. Everything is
static-shaped and jit-safe; the hierarchy is rebuilt per solve inside the
same XLA program (PcMGDynamic semantics, pressure.cpp:27).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.masks import interior_mask, shift
from .pressure import apply_laplace, make_laplace_stencil


def _coarsen_flags(flags, dom: Domain):
    """Obstacle-priority pooling: coarse cell is obstacle if ANY child is
    (preserves Neumann walls on coarse levels), else fluid if any child is,
    else empty."""
    sz, sy, sx = dom.shape
    if dom.is3d:
        f = flags.reshape(sz // 2, 2, sy // 2, 2, sx // 2, 2)
    else:
        f = flags.reshape(1, 1, sy // 2, 2, sx // 2, 2)
    axes = (1, 3, 5)
    obst = jnp.any((f & fl.TypeObstacle) != 0, axis=axes)
    fluid = jnp.any((f & fl.TypeFluid) != 0, axis=axes) & ~obst
    out = jnp.where(obst, fl.TypeObstacle,
                    jnp.where(fluid, fl.TypeFluid, fl.TypeEmpty))
    return out.astype(jnp.int32)


def _axis_blend(x, adjoint: bool):
    """Per-axis trilinear blend on a doubled grid: even cells mix 1/4 of the
    minus neighbor, odd cells 1/4 of the plus neighbor (or the adjoint)."""
    for ax in ("z", "y", "x"):
        n = {"z": 0, "y": 1, "x": 2}[ax]
        if x.shape[n] == 1:
            continue
        lo = shift(x, -1, ax)
        hi = shift(x, 1, ax)
        ii = jnp.arange(x.shape[n])
        shp = [1, 1, 1]
        shp[n] = -1
        even = (ii % 2 == 0).reshape(shp)
        if adjoint:
            x = 0.75 * x + 0.25 * jnp.where(even, hi, lo)
        else:
            x = jnp.where(even, 0.75 * x + 0.25 * lo, 0.75 * x + 0.25 * hi)
    return x


def _p0(xc, dom_f: Domain):
    """Trilinear prolongation (unnormalized)."""
    if dom_f.is3d:
        x = jnp.repeat(jnp.repeat(jnp.repeat(xc, 2, 0), 2, 1), 2, 2)
    else:
        x = jnp.repeat(jnp.repeat(xc, 2, 1), 2, 2)
    return _axis_blend(x, adjoint=False)


def _p0t(r, dom_f: Domain):
    """Adjoint of _p0: blend-adjoint then child sum."""
    x = _axis_blend(r, adjoint=True)
    sz, sy, sx = x.shape
    if dom_f.is3d:
        return x.reshape(sz // 2, 2, sy // 2, 2, sx // 2, 2).sum(axis=(1, 3, 5))
    return x.reshape(1, 1, sy // 2, 2, sx // 2, 2).sum(axis=(1, 3, 5))


def _jacobi(flags_l, x, b, stencil, dom: Domain, n: int, omega: float = 0.86):
    a0 = stencil[0]
    fluid_i = fl.is_fluid(flags_l) & interior_mask(dom, 1)
    diag = jnp.where(fluid_i & (a0 > 0), a0, 1.0)

    def body(_, x):
        r = b - apply_laplace(flags_l, x, stencil, dom)
        return x + omega * jnp.where(fluid_i, r / diag, 0.0)

    return jax.lax.fori_loop(0, n, body, x)


def _levels(dom: Domain, min_size: int = 8):
    doms = [dom]
    while True:
        sx, sy, sz = doms[-1].size
        dims = (sx, sy, sz) if dom.is3d else (sx, sy)
        if min(dims) <= min_size or any(d % 2 for d in dims):
            break
        nsz = sz // 2 if dom.is3d else 1
        doms.append(Domain(size=(sx // 2, sy // 2, nsz), dim=dom.dim))
    return doms


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MgHierarchy:
    """Per-level flags/stencils/masks — everything make_mg_preconditioner
    derives from the fine flags + stencil. Building it is itself a chain of
    full-grid ops, so solvers whose flags (and stencil) are static across
    steps should build it ONCE at state-creation time and thread it through
    the step as state (the reference's PcMGStatic 'cached per solver'
    semantics, pressure.cpp:250) instead of paying the rebuild inside every
    jitted solve."""
    level_flags: tuple
    level_stencils: tuple
    masks: tuple
    denoms: tuple


def build_mg_hierarchy(flags, dom: Domain, fine_stencil,
                       min_size: int = 8) -> MgHierarchy:
    doms = _levels(dom, min_size)
    level_flags = [flags]
    level_stencils = [tuple(fine_stencil)]
    for i in range(1, len(doms)):
        cf = _coarsen_flags(level_flags[-1], doms[i - 1])
        level_flags.append(cf)
        level_stencils.append(tuple(make_laplace_stencil(cf, doms[i])))
    masks = [(fl.is_fluid(level_flags[l]) & interior_mask(doms[l], 1)
              ).astype(jnp.float32) for l in range(len(doms))]
    # prolongation weight mass of fluid coarse parents, for renormalization
    denoms = [jnp.maximum(_p0(masks[l + 1], doms[l]), 1e-6)
              for l in range(len(doms) - 1)]
    return MgHierarchy(level_flags=tuple(level_flags),
                       level_stencils=tuple(level_stencils),
                       masks=tuple(masks), denoms=tuple(denoms))


def make_mg_preconditioner(flags, dom: Domain, fine_stencil,
                           n_pre: int = 2, n_post: int = 2,
                           n_coarse: int = 40, min_size: int = 8,
                           scale: float = 4.0, hierarchy=None):
    """Returns precond_apply(r) -> z performing one V-cycle. The fine level
    uses the CG's stencil (incl. ghost-fluid/fractions terms); coarser
    levels rediscretize on pooled flags. Pass a prebuilt ``hierarchy``
    (build_mg_hierarchy) to skip the per-call rebuild."""
    doms = _levels(dom, min_size)
    if hierarchy is None:
        hierarchy = build_mg_hierarchy(flags, dom, fine_stencil, min_size)
    level_flags = hierarchy.level_flags
    level_stencils = hierarchy.level_stencils
    masks = hierarchy.masks
    denoms = hierarchy.denoms

    def prolong(l, xc):
        return masks[l] * _p0(masks[l + 1] * xc, doms[l]) / denoms[l]

    def restrict(l, r):
        return (scale / (8.0 if dom.is3d else 4.0)) * masks[l + 1] \
            * _p0t(masks[l] * r / denoms[l], doms[l])

    def vcycle(l, r):
        fg, st, dm = level_flags[l], level_stencils[l], doms[l]
        if l == len(doms) - 1:
            return _jacobi(fg, jnp.zeros_like(r), r, st, dm, n_coarse)
        x = _jacobi(fg, jnp.zeros_like(r), r, st, dm, n_pre)
        res = r - apply_laplace(fg, x, st, dm)
        res = jnp.where(masks[l] > 0, res, 0.0)
        xc = vcycle(l + 1, restrict(l, res))
        x = x + prolong(l, xc)
        return _jacobi(fg, x, r, st, dm, n_post)

    def apply(r):
        z = vcycle(0, r)
        # act as identity off the fluid region, matching ApplyMatrix's
        # dst=src convention there
        return jnp.where(fl.is_fluid(flags), z, r)

    return apply
