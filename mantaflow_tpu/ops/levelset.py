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

Velocity transport during the march (FastMarch's FmValueTransport,
``fastmarch.h:63-90``) is reproduced data-parallel by value_transport_mac:
the march's per-cell update events are a static function of the final phi
field (pops happen in phi order), so the <=7 tentative updates each cell
receives are replayed in parallel and the last accepted one supplies the
reference's upwind interpolation weights. Validated against the reference
binary (BASELINE.md): mean |diff| 6.6e-4, 99.8% of transported faces
within 0.05 on a basin+drop 32^3 input. The scene API prefers the exact
serial heap in native/fastmarch.cpp; this path serves fused jitted
pipelines.
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


def value_transport_mac(phi, flags, vel, dom: Domain, max_time: float = 4.0,
                        ignore_walls: bool = False,
                        obstacle_type: int = fl.TypeObstacle):
    """FastMarch velocity transport during the outward march
    (FmValueTransportVec3, ``fastmarch.h:63-90`` + the weight computation
    in ``fastmarch.cpp:35-125``), recast data-parallel.

    The transported value is written by ``transpTouch`` from ``addToList``
    — i.e. at the cell's LAST ACCEPTED tentative update, not at pop — so
    the weight set depends on the march's event order. But that order is
    itself a static function of the final phi field: pops happen in
    increasing phi, so cell c receives one update event per upwind
    neighbor pop (at time ``t = phi(nb)``, discarded when ``t > maxTime``,
    fastmarch.cpp:141) plus a seed event at t=0 when an adjacent interface
    value lies in [-2,0) (levelset.cpp correctOuterLayer). At each event
    the per-axis choice is calcWeights' "+1 inited, else -1 inited" with
    inited == ``phi(nb) <= t``, the tentative value is the 3-case clamped
    update of calculateDistance, and the update is ACCEPTED iff not worse
    than the running best (``COMP::compare``, ties accept). We replay the
    <=7 events per cell in parallel and take the last accepted one; its
    weights are ``|ret - phi(nb)|`` normalized when >=2 axes contribute
    (the single-axis case keeps the 0/1 indicator, fastmarch.cpp case 2).
    Only the VALUE resolution order remains sequential; it follows
    strictly increasing phi with steps >= 1/3 per hop, so
    ``3*maxTime + O(1)`` Jacobi rounds reach the fixpoint. Per Vec3
    semantics a component is written only where the axis-adjacent lower
    cell is empty (fastmarch.h:81-84); non-empty popped cells still
    become sources with their unchanged values."""
    import jax

    big = jnp.float32(3.4e38)
    inter = interior_mask(dom, 1)
    axes = ["x", "y", "z"] if dom.is3d else ["x", "y"]
    n_comp = len(axes)
    empty = (flags & fl.TypeEmpty) != 0
    wall = (flags & obstacle_type) != 0

    # popped set of the outward march: outside cells reached within maxTime
    touch = (phi > 0.0) & (phi <= max_time) & inter
    if ignore_walls:
        touch = touch & ~wall

    php = [shift(phi, 1, ax) for ax in axes]
    phm = [shift(phi, -1, ax) for ax in axes]
    if ignore_walls:  # wall neighbors are never inited / never pop
        php = [jnp.where(shift(wall, 1, ax), big, p)
               for p, ax in zip(php, axes)]
        phm = [jnp.where(shift(wall, -1, ax), big, p)
               for p, ax in zip(phm, axes)]

    # event times: one per upwind-popping neighbor, plus the t=0 seed
    nb_all = php + phm
    ev = [jnp.where((p > 0.0) & (p < phi) & (p <= max_time), p, big)
          for p in nb_all]
    ev = jnp.sort(jnp.stack(ev), axis=0)
    seed = jnp.zeros(dom.shape, dtype=bool)
    for p in nb_all:
        seed = seed | ((p > -2.0) & (p < 0.0))
    times = [jnp.where(seed, 0.0, big)] + [ev[j] for j in range(len(nb_all))]

    def event_update(t):
        """calcWeights + calculateDistance at event time t (see docstring):
        returns (ret, per-axis use_plus/use_minus masks)."""
        ups, ums, vax, oks = [], [], [], []
        for a in range(n_comp):
            up = php[a] <= t
            um = (~up) & (phm[a] <= t)
            ups.append(up)
            ums.append(um)
            vax.append(jnp.where(up, php[a], phm[a]))
            oks.append(up | um)
        okcnt = sum(o.astype(jnp.int32) for o in oks)
        s = sum(jnp.where(o, v, 0.0) for o, v in zip(oks, vax))
        ssq = sum(jnp.where(o, v * v, 0.0) for o, v in zip(oks, vax))
        # case 2 (one value): ret = v + 1
        ret1 = s + 1.0
        # case 1 (two values): 0.5*(v0+v1+sqrt(max(0, 2-(v1-v0)^2)))
        d2 = 2.0 * ssq - s * s  # == (v1-v0)^2 for exactly two values
        ret2 = 0.5 * (s + jnp.sqrt(jnp.maximum(2.0 - d2, 0.0)))
        # case 0 (three): (a+b+c+sqrt(max(0, 3-2*(a^2+b^2-bc+c^2-a(b+c)))))/3
        if n_comp == 3:
            pairsum = 0.5 * (s * s - ssq)  # ab+bc+ca
            q = 3.0 - 2.0 * (ssq - pairsum)
            ret3 = (s + jnp.sqrt(jnp.maximum(q, 0.0))) / 3.0
        else:
            ret3 = ret2
        ret = jnp.where(okcnt == 1, ret1,
                        jnp.where(okcnt == 2, ret2, ret3))
        ret = jnp.where((okcnt > 0) & (t < big * 0.5), ret, big)
        return ret, ups, ums, vax, oks

    # replay: last event with ret <= running best wins (ties accept,
    # addToList's compare rejects only strictly-worse updates)
    best = jnp.full(dom.shape, big, jnp.float32)
    sel_up = [jnp.zeros(dom.shape, dtype=bool) for _ in range(n_comp)]
    sel_um = [jnp.zeros(dom.shape, dtype=bool) for _ in range(n_comp)]
    sel_ret = jnp.full(dom.shape, big, jnp.float32)
    for t in times:
        ret, ups, ums, vax, oks = event_update(t)
        acc = ret <= best
        best = jnp.where(acc, ret, best)
        sel_ret = jnp.where(acc, ret, sel_ret)
        for a in range(n_comp):
            sel_up[a] = jnp.where(acc, ups[a], sel_up[a])
            sel_um[a] = jnp.where(acc, ums[a], sel_um[a])

    use_plus, use_minus = sel_up, sel_um
    vax = [jnp.where(up, p, m)
           for up, p, m in zip(use_plus, php, phm)]
    oks = [up | um for up, um in zip(use_plus, use_minus)]
    okcnt = sum(o.astype(jnp.int32) for o in oks)
    w_axis = [jnp.where(o, jnp.abs(sel_ret - v), 0.0)
              for o, v in zip(oks, vax)]
    wsum = sum(w_axis)
    w_axis = [jnp.where(okcnt >= 2, w / jnp.maximum(wsum, 1e-30),
                        o.astype(jnp.float32))
              for w, o in zip(w_axis, oks)]

    touch = touch & (okcnt > 0) & (best < big * 0.5)
    # component write gates: adjacent lower cell empty (fastmarch.h:81-84)
    comp_gate = [shift(empty, -1, ax) for ax in axes]

    n_rounds = 3 * int(math.ceil(max_time)) + 4

    def round_(_, carry):
        v, valid = carry
        ready = jnp.zeros(dom.shape, dtype=bool)
        val = [jnp.zeros(dom.shape, jnp.float32) for _ in range(n_comp)]
        nb_ok = jnp.ones(dom.shape, dtype=bool)
        for a, ax in enumerate(axes):
            vp = jnp.where(use_plus[a], shift(valid, 1, ax),
                           jnp.where(use_minus[a], shift(valid, -1, ax),
                                     True))
            nb_ok = nb_ok & vp
            for c in range(n_comp):
                nbv = jnp.where(use_plus[a], shift(v[c], 1, ax),
                                shift(v[c], -1, ax))
                val[c] = val[c] + w_axis[a] * nbv
        ready = touch & ~valid & nb_ok
        new_v = []
        for c in range(n_comp):
            wr = ready & empty & comp_gate[c]
            new_v.append(jnp.where(wr, val[c], v[c]))
        return tuple(new_v), valid | ready

    v0 = tuple(vel[c] for c in range(n_comp))
    valid0 = ~touch
    (vout, valid) = jax.lax.fori_loop(0, n_rounds, round_, (v0, valid0))
    comps = list(vout) + ([vel[2]] if not dom.is3d else [])
    return jnp.stack(comps)


def reinit_marching(phi, flags, dom: Domain, vel=None, max_time: float = 4.0,
                    ignore_walls: bool = False,
                    correct_outer_layer: bool = True,
                    obstacle_type: int = fl.TypeObstacle):
    """reinitMarching equivalent; optionally transports `vel` outward during
    the march (velTransport) with the FastMarch upwind-weight semantics.
    Returns (phi, vel)."""
    del correct_outer_layer  # interface cells always kept (non-distorting)
    new_phi = reinit(phi, flags, dom, max_time, ignore_walls, obstacle_type)
    if vel is not None:
        vel = value_transport_mac(new_phi, flags, vel, dom, max_time,
                                  ignore_walls, obstacle_type)
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
