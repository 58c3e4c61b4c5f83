"""Layer-by-layer (BFS) extrapolation of velocities and level sets.

Behavioral port of ``source/fastmarch.cpp:337-556``: extrapolateMACSimple
(:337), knExtrapolateMACSimple (:299), knExtrapolateIntoBnd (:366),
extrapolateMACFromWeight (:378-432), extrapolateLsSimple (:437-490),
extrapolateVec3Simple (:492-556).

Each distance layer is one fused whole-grid pass; the d-loop is a static
Python loop (distance is small and fixed per call site).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.masks import axis_index, interior_mask, shift

_AXES = ["x", "y", "z"]


def _nb_avg(val, marker, d, dom: Domain):
    """Average of 4/6-neighbor values whose marker == d; returns (avg, nbs)."""
    nbs = jnp.zeros(val.shape, jnp.float32)
    acc = jnp.zeros(val.shape, jnp.float32)
    dirs = [("x", 1), ("x", -1), ("y", 1), ("y", -1)]
    if dom.is3d:
        dirs += [("z", 1), ("z", -1)]
    for ax, dd in dirs:
        hit = (shift(marker, dd, ax) == d).astype(jnp.float32)
        acc = acc + hit * shift(val, dd, ax)
        nbs = nbs + hit
    avg = acc / jnp.maximum(nbs, 1.0)
    return avg, nbs


def extrapolate_mac_simple(flags, vel, dom: Domain, distance: int = 4,
                           phi_obs=None, into_obs: bool = False):
    """extrapolateMACSimple: per component, flood velocity outward from
    faces adjacent to fluid, then copy tangential values into domain sides."""
    inter = interior_mask(dom, 1)
    fluid = fl.is_fluid(flags)
    obst = fl.is_obstacle(flags)
    n_comp = 3 if dom.is3d else 2
    comps = [vel[0], vel[1], vel[2]]
    marks = []
    for c in range(n_comp):
        ax = _AXES[c]
        mark = fluid | shift(fluid, -1, ax)
        if into_obs:
            mark = mark & ~obst & ~shift(obst, -1, ax)
        marks.append(jnp.where(mark & inter, 1, 0).astype(jnp.int32))
    from .extrapolation_pallas import extrap_layers_pallas, pallas_extrap_ok
    if n_comp == 3 and pallas_extrap_ok(dom):
        comps, _ = extrap_layers_pallas(
            comps, [m.astype(jnp.float32) for m in marks], dom, 1, distance)
    else:
        for c in range(n_comp):
            tmp, v = marks[c], comps[c]
            for d in range(1, 1 + distance):
                avg, nbs = _nb_avg(v, tmp, d, dom)
                upd = (tmp == 0) & (nbs > 0) & inter
                v = jnp.where(upd, avg, v)
                tmp = jnp.where(upd, d + 1, tmp)
            comps[c] = v
    vel = jnp.stack(comps)
    if phi_obs is not None:
        vel = _unproject_normal_comp(flags, vel, phi_obs, dom, distance)
    return _extrapolate_into_bnd(flags, vel, dom)


def _unproject_normal_comp(flags, vel, phi_obs, dom: Domain, max_dist: int):
    """knUnprojectNormalComp: remove the obstacle-normal velocity component
    near the obstacle surface (fastmarch.cpp, used with phiObs)."""
    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))

    gx, gy = d1(phi_obs, "x"), d1(phi_obs, "y")
    gz = d1(phi_obs, "z") if dom.is3d else jnp.zeros_like(gx)
    n2 = gx * gx + gy * gy + gz * gz
    inv = jnp.where(n2 > 1e-12, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-12)), 0.0)
    nx, ny, nz = gx * inv, gy * inv, gz * inv
    dotp = vel[0] * nx + vel[1] * ny + vel[2] * nz
    near = (phi_obs < 0.5 * max_dist) & (dotp > 0)
    near = near & interior_mask(dom, 1)
    return jnp.stack([
        jnp.where(near, vel[0] - dotp * nx, vel[0]),
        jnp.where(near, vel[1] - dotp * ny, vel[1]),
        jnp.where(near, vel[2] - dotp * nz, vel[2]),
    ])


def _extrapolate_into_bnd(flags, vel, dom: Domain):
    """knExtrapolateIntoBnd (fastmarch.cpp:366-410): domain-side cells take
    the averaged inward-neighbor velocity, zeroing the into-wall normal
    component on obstacles."""
    sz, sy, sx = dom.shape
    obst = fl.is_obstacle(flags)
    # note the reference quirk: v is OVERWRITTEN per matching side while the
    # count accumulates, so corner cells get (last side's value) / count
    last = jnp.zeros_like(vel)
    cnt = jnp.zeros(dom.shape, jnp.float32)

    sides = [("x", 0), ("x", sx - 1), ("y", 0), ("y", sy - 1)]
    if dom.is3d:
        sides += [("z", 0), ("z", sz - 1)]
    for ax, pos_idx in sides:
        idx = axis_index(dom, ax)
        on_side = idx == pos_idx
        inward = 1 if pos_idx == 0 else -1
        v = shift(vel, inward, ax)
        comp = {"x": 0, "y": 1, "z": 2}[ax]
        bad_sign = v[comp] < 0.0 if pos_idx == 0 else v[comp] > 0.0
        vc = jnp.where(obst & bad_sign, 0.0, v[comp])
        v = v.at[comp].set(vc)
        last = jnp.where(on_side[None], v, last)
        cnt = cnt + on_side.astype(jnp.float32)
    out = jnp.where((cnt[None] > 0), last / jnp.maximum(cnt[None], 1.0), vel)
    return out


def extrapolate_mac_from_weight(vel, weight, dom: Domain, distance: int = 2):
    """extrapolateMACFromWeight (fastmarch.cpp:378-432): weight>0 marks
    initialized faces; weight grid is consumed. Returns (vel, weight)."""
    inter = interior_mask(dom, 1)
    n_comp = 3 if dom.is3d else 2
    vcomps = [vel[0], vel[1], vel[2]]
    # note: reference only rewrites interior weights; ring keeps raw values
    wcomps = [jnp.where(inter & (weight[c] > 0.0), 1.0,
                        jnp.where(inter, 0.0, weight[c]))
              if c < n_comp else weight[c] for c in range(3)]
    from .extrapolation_pallas import extrap_layers_pallas, pallas_extrap_ok
    if n_comp == 3 and pallas_extrap_ok(dom):
        # the kernel's int-cast marker compare reproduces the float-ring
        # quirk: a ring weight in [d, d+1) counts as a layer-d neighbor
        vcomps, wcomps = extrap_layers_pallas(vcomps, wcomps, dom, 1,
                                              distance)
        return jnp.stack(vcomps), jnp.stack(wcomps)
    for c in range(n_comp):
        w, v = wcomps[c], vcomps[c]
        for d in range(1, 1 + distance):
            avg, nbs = _nb_avg(v, w.astype(jnp.int32), d, dom)
            upd = (w == 0.0) & (nbs > 0) & inter
            v = jnp.where(upd, avg, v)
            w = jnp.where(upd, float(d + 1), w)
        vcomps[c] = v
        wcomps[c] = w
    return jnp.stack(vcomps), jnp.stack(wcomps)


def extrapolate_ls_simple(phi, dom: Domain, distance: int = 4,
                          inside: bool = False, include_walls: bool = False):
    """extrapolateLsSimple (fastmarch.cpp:437-490)."""
    inter = interior_mask(dom, 1)
    init_region = interior_mask(dom, 0 if include_walls else 1)
    if not inside:
        direction = 1.0
        tmp = jnp.where(inter & (phi < 0.0), 1, 0)
    else:
        direction = -1.0
        tmp = jnp.where(init_region & (phi > 0.0), 1, 0)
    tmp = tmp.astype(jnp.int32)

    from .extrapolation_pallas import extrap_ls_layers_pallas, \
        pallas_extrap_ok
    if pallas_extrap_ok(dom):
        phi, tmpf = extrap_ls_layers_pallas(phi, tmp.astype(jnp.float32),
                                            dom, direction, distance)
        tmp = tmpf.astype(jnp.int32)
    else:
        # first layer: neighbors of the initial region (phi unchanged)
        _, nbs = _nb_avg(jnp.zeros_like(phi), tmp, 1, dom)
        first = (tmp == 0) & (nbs > 0) & inter
        tmp = jnp.where(first, 2, tmp)

        for d in range(2, 1 + distance):
            avg, nbs = _nb_avg(phi, tmp, d, dom)
            upd = (tmp == 0) & (nbs > 0) & inter
            phi = jnp.where(upd, avg + direction, phi)
            tmp = jnp.where(upd, d + 1, tmp)

    # remaining cells to max distance (knSetRemaining, bnd=1)
    phi = jnp.where((tmp == 0) & inter, direction * (distance + 2), phi)
    return phi


def extrapolate_vec3_simple(vel, phi, dom: Domain, distance: int = 4,
                            inside: bool = False):
    """extrapolateVec3Simple (fastmarch.cpp:492-556): flood a cell-centered
    Vec3 field outward from the phi<0 (or >0) region."""
    inter = interior_mask(dom, 1)
    if not inside:
        tmp0 = jnp.where(inter & (phi < 0.0), 1, 0)
    else:
        tmp0 = jnp.where(inter & (phi > 0.0), 1, 0)
    tmp0 = tmp0.astype(jnp.int32)
    _, nbs = _nb_avg(jnp.zeros(dom.shape), tmp0, 1, dom)
    first = (tmp0 == 0) & (nbs > 0) & inter
    tmp0 = jnp.where(first, 2, tmp0)

    comps = [vel[c] for c in range(3)]
    tmp = tmp0
    for d in range(2, 1 + distance):
        upd = None
        new_comps = []
        for c in range(3):
            avg, nbs = _nb_avg(comps[c], tmp, d, dom)
            if upd is None:
                upd = (tmp == 0) & (nbs > 0) & inter
            new_comps.append(jnp.where(upd, avg, comps[c]))
        comps = new_comps
        tmp = jnp.where(upd, d + 1, tmp)
    return jnp.stack(comps)
