"""Levelset operations: redistancing, CSG, flag init.

The reference reinitializes signed distance with a serial heap-based fast
march (``source/fastmarch.cpp:133-258``, ``levelset.cpp:120-232``). That
algorithm is inherently sequential, so this module implements the same
*contract* — phi becomes a signed distance within ``maxTime`` cells of the
interface, interface cells keep their values, farther cells saturate at
±(maxTime+1) — with an iterative parallel Eikonal solver (Rouy-Tourin /
fast-iterative style): each Jacobi sweep is one fused whole-grid pass and
propagates the front one cell, so ``ceil(maxTime)+2`` sweeps suffice. This
is the redesign SURVEY.md §7 prescribes for TPU.

Velocity transport during the march (FastMarch's FmValueTransport) is
replaced by BFS-layer MAC extrapolation over the same distance
(ops/extrapolation.py), which the reference itself offers as the
alternative path (scenes/freesurface.py:57-62).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.masks import interior_mask, shift
from . import extrapolation as xtr

InvalidTime = lambda max_time: 4.0 * max_time  # FastMarch invalid marker


def _eikonal_update(d, frozen, dom: Domain, big: float):
    """One Jacobi sweep of the Eikonal equation |grad d| = 1 on unsigned
    distances; frozen cells keep their values."""
    ax_mins = []
    for ax in (["x", "y", "z"] if dom.is3d else ["x", "y"]):
        ax_mins.append(jnp.minimum(shift(d, 1, ax), shift(d, -1, ax)))
    if dom.is3d:
        a = jnp.minimum(ax_mins[0], jnp.minimum(ax_mins[1], ax_mins[2]))
        c = jnp.maximum(ax_mins[0], jnp.maximum(ax_mins[1], ax_mins[2]))
        b = ax_mins[0] + ax_mins[1] + ax_mins[2] - a - c
    else:
        a = jnp.minimum(ax_mins[0], ax_mins[1])
        b = jnp.maximum(ax_mins[0], ax_mins[1])
        c = jnp.full_like(a, big)

    x1 = a + 1.0
    disc2 = 2.0 - (a - b) ** 2
    x2 = 0.5 * (a + b + jnp.sqrt(jnp.maximum(disc2, 0.0)))
    x = jnp.where((x1 > b) & (disc2 > 0), x2, x1)
    if dom.is3d:
        s = a + b + c
        q = s * s - 3.0 * (a * a + b * b + c * c - 1.0)
        x3 = (s + jnp.sqrt(jnp.maximum(q, 0.0))) / 3.0
        x = jnp.where((x > c) & (q > 0), x3, x)
    new = jnp.minimum(d, x)
    inter = interior_mask(dom, 1)
    return jnp.where(frozen | ~inter, d, new)


def reinit(phi, flags, dom: Domain, max_time: float = 4.0,
           ignore_walls: bool = False,
           obstacle_type: int = fl.TypeObstacle):
    """Parallel redistancing with reinitMarching's contract
    (levelset.cpp:120-232). Returns the new phi."""
    big = max_time * 8.0
    inter = interior_mask(dom, 1)
    skip = jnp.zeros(dom.shape, dtype=bool)
    if ignore_walls:
        skip = (flags & obstacle_type) != 0

    neg = phi < 0.0
    at_if = jnp.zeros(dom.shape, dtype=bool)
    for ax in (["x", "y", "z"] if dom.is3d else ["x", "y"]):
        for dd in (1, -1):
            nb_neg = shift(neg, dd, ax)
            at_if = at_if | (nb_neg != neg)
    at_if = at_if & inter & ~skip

    # unsigned distance: interface cells keep |phi| (their values are valid
    # near-distances, as FMM assumes); others start at big
    d = jnp.where(at_if, jnp.abs(phi), big)
    d = jnp.where(skip, big, d)

    n_sweeps = int(math.ceil(max_time)) + 2
    for _ in range(n_sweeps):
        d = _eikonal_update(d, at_if, dom, big)

    # saturate beyond maxTime at +/-(maxTime+1) (SetUninitialized semantics)
    d = jnp.minimum(d, max_time + 1.0)
    new_phi = jnp.where(neg, -d, d)
    # untouched regions (walls when ignoreWalls, boundary ring) keep phi sign
    # structure but reference leaves ring values from SetUninitialized; keep
    # original values outside the interior to stay conservative
    new_phi = jnp.where(inter & ~skip, new_phi, phi)
    return new_phi


def reinit_marching(phi, flags, dom: Domain, vel=None, max_time: float = 4.0,
                    ignore_walls: bool = False,
                    correct_outer_layer: bool = True,
                    obstacle_type: int = fl.TypeObstacle):
    """reinitMarching equivalent; optionally extrapolates `vel` outward over
    the same distance (velTransport). Returns (phi, vel)."""
    del correct_outer_layer  # interface cells always kept (non-distorting)
    new_phi = reinit(phi, flags, dom, max_time, ignore_walls, obstacle_type)
    if vel is not None:
        vel = xtr.extrapolate_mac_simple(flags, vel, dom,
                                         distance=int(math.ceil(max_time)) + 1)
    return new_phi, vel


def join(phi_a, phi_b):
    """CSG union (levelset.cpp join): min."""
    return jnp.minimum(phi_a, phi_b)


def subtract(phi_a, phi_b):
    """CSG difference: max(a, -b)."""
    return jnp.maximum(phi_a, -phi_b)


def init_from_flags(flags, dom: Domain, ignore_walls: bool = False):
    """LevelsetGrid::initFromFlags: -0.5 in fluid, +0.5 elsewhere."""
    inside = fl.is_fluid(flags)
    if ignore_walls:
        inside = inside | fl.is_obstacle(flags)
    return jnp.where(inside, -0.5, 0.5)


def fill_holes(phi, dom: Domain, max_depth: int = 10):
    """LevelsetGrid::fillHoles (levelset.cpp): fill enclosed positive pockets
    whose straight-line rays in all 6 directions hit negative phi within
    maxDepth cells."""
    inside = phi < 0.0
    hit_all = jnp.ones(dom.shape, dtype=bool)
    for ax in (["x", "y", "z"] if dom.is3d else ["x", "y"]):
        for dd in (1, -1):
            hit = jnp.zeros(dom.shape, dtype=bool)
            cur = inside
            for _ in range(max_depth):
                cur = shift(cur, dd, ax)
                hit = hit | cur
            hit_all = hit_all & hit
    fill = (~inside) & hit_all & interior_mask(dom, 1)
    return jnp.where(fill, -0.5, phi)
