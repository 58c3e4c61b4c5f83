"""FLIP: particle-grid transfers, fluid marking, particle level sets.

Behavioral port of ``source/plugin/flip.cpp`` re-designed for TPU: the
reference's serial per-particle scatter kernels (knMapLinearVec3ToMACGrid
:619, marked ``single`` because they race otherwise) become vectorized
scatter-adds over (8, N) corner/weight arrays — one XLA scatter per
component; the cell-indexed neighbor searches (ComputeUnionLevelsetPindex
:300) become bounded-window scatter-min/add, removing the
ParticleIndexSystem sort entirely.

Covered: mapPartsToMAC (:637), mapPartsToGrid[Vec3] (:682), mapGridToParts
(:699), mapMACToParts (:717), flipVelocityUpdate (:738), markFluidCells
(:166), unionParticleLevelset (:356), averagedParticleLevelset (:477),
combineGridVel (:773), getLaplacian/getCurvature (:779), setPartType
(ptsplugins.cpp:62), addForcePvel/eulerStep/updateVelocityFromDeltaPos
(ptsplugins.cpp:26-59), markIsolatedFluidCell (grid.cpp:988-1011).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.interp import (_axis_weights, _base_and_weights, interpol,
                           interpol_fast, interpol_mac, interpol_mac_fast,
                           mac_corner_tables, scatter_rows, scatter_rows2)
from ..core.masks import interior_mask, shift
from ..core.particles import PDELETE, PNEW, Particles

VECTOR_EPSILON = 1e-6


# ---------------------------------------------------------------------------
# scatter core

def _corner_arrays(xi, yi, zi, s1, t1, f1, shape):
    """(8,N) corner flat-indices and trilinear weights; upper indices clamp
    (n==1 axes collapse as in interpol)."""
    sz, sy, sx = shape
    x1 = jnp.minimum(xi + 1, sx - 1)
    y1 = jnp.minimum(yi + 1, sy - 1)
    z1 = jnp.minimum(zi + 1, sz - 1)
    s0, t0, f0 = 1.0 - s1, 1.0 - t1, 1.0 - f1
    corners = [
        (zi, yi, xi, f0 * t0 * s0), (zi, yi, x1, f0 * t0 * s1),
        (zi, y1, xi, f0 * t1 * s0), (zi, y1, x1, f0 * t1 * s1),
        (z1, yi, xi, f1 * t0 * s0), (z1, yi, x1, f1 * t0 * s1),
        (z1, y1, xi, f1 * t1 * s0), (z1, y1, x1, f1 * t1 * s1),
    ]
    flat = jnp.stack([(z * sy + y) * sx + x for (z, y, x, _) in corners])
    w = jnp.stack([w for (_, _, _, w) in corners])
    return flat, w


def _scatter_weighted(shape, flat, w, val):
    """Accumulate (value*w, w) at flat indices; returns (acc, wsum) grids."""
    n = shape[0] * shape[1] * shape[2]
    acc = jnp.zeros((n,), jnp.float32).at[flat.reshape(-1)].add(
        (w * val).reshape(-1))
    wsum = jnp.zeros((n,), jnp.float32).at[flat.reshape(-1)].add(w.reshape(-1))
    return acc.reshape(shape), wsum.reshape(shape)


def _mac_axis_weights(parts_pos, shape, c: int):
    """Per-component MAC weights: own axis unshifted (setInterpolMAC /
    BUILD_INDEX_SHIFT semantics)."""
    sz, sy, sx = shape
    px, py, pz = parts_pos[:, 0], parts_pos[:, 1], parts_pos[:, 2]
    xi, s1 = _axis_weights(px - (0.0 if c == 0 else 0.5), sx)
    yi, t1 = _axis_weights(py - (0.0 if c == 1 else 0.5), sy)
    zi, f1 = _axis_weights(pz - (0.0 if c == 2 else 0.5), sz)
    return xi, yi, zi, s1, t1, f1


# ---------------------------------------------------------------------------
# p2g / g2p

def map_parts_to_mac(parts: Particles, pvel, flags, dom: Domain, ptype=None,
                     exclude: int = 0):
    """mapPartsToMAC (flip.cpp:637-662): weighted scatter of particle
    velocities to faces, then safe divide. Returns (vel, weight)."""
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    af = active.astype(jnp.float32)
    n_comp = 3 if dom.is3d else 2
    px, py, pz = parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2]
    face_pos = [(px, py - 0.5, pz - 0.5), (px - 0.5, py, pz - 0.5),
                (px - 0.5, py - 0.5, pz)]
    vels, weights = [], []
    for c in range(3):
        if c >= n_comp and not dom.is3d and c == 2:
            # z component still scattered in the reference (values are 0);
            # skip the work, keep zero grids
            vels.append(jnp.zeros(dom.shape, jnp.float32))
            weights.append(jnp.zeros(dom.shape, jnp.float32))
            continue
        # row-packed scatter: one fused scatter for value + weight
        base, w = _base_and_weights(dom.shape, *face_pos[c])
        w = w * af[:, None]
        acc, wsum = scatter_rows2(dom.shape, base, w, pvel[:, c])
        vels.append(acc.reshape(dom.shape))
        weights.append(wsum.reshape(dom.shape))
    weight = jnp.stack(weights)
    vel_acc = jnp.stack(vels)
    # stomp tiny weights to zero, then safe divide (flip.cpp:653-655).
    # The STOMPED weight grid is what the caller receives — downstream
    # extrapolateMACFromWeight treats weight>0 as "initialized", so
    # returning raw sub-epsilon weights would mark noise faces initialized.
    weight_st = jnp.where(weight < VECTOR_EPSILON, 0.0, weight)
    vel = jnp.where(weight_st > 0, vel_acc / jnp.maximum(weight_st, 1e-30), 0.0)
    return vel, weight_st


def map_parts_to_grid(parts: Particles, psource, flags, dom: Domain):
    """mapPartsToGrid (flip.cpp:682): cell-centered weighted scatter of a
    scalar (or per-component vector) channel."""
    active = parts.active_mask().astype(jnp.float32)
    px, py, pz = parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2]
    sz, sy, sx = dom.shape
    xi, s1 = _axis_weights(px - 0.5, sx)
    yi, t1 = _axis_weights(py - 0.5, sy)
    zi, f1 = _axis_weights(pz - 0.5, sz)
    flat, w = _corner_arrays(xi, yi, zi, s1, t1, f1, dom.shape)
    w = w * active[None, :]
    if psource.ndim == 1:
        acc, wsum = _scatter_weighted(dom.shape, flat, w, psource[None, :])
        return jnp.where(wsum < VECTOR_EPSILON, 0.0, acc / jnp.maximum(wsum, 1e-30))
    outs = []
    for c in range(psource.shape[1]):
        acc, wsum = _scatter_weighted(dom.shape, flat, w, psource[:, c][None, :])
        outs.append(jnp.where(wsum < VECTOR_EPSILON, 0.0,
                              acc / jnp.maximum(wsum, 1e-30)))
    return jnp.stack(outs)


def map_grid_to_parts(grid, parts: Particles):
    """mapGridToParts (flip.cpp:699): cell-centered interpolation."""
    px, py, pz = parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2]
    if grid.ndim == 3:
        return interpol_fast(grid, px, py, pz)
    return jnp.stack([interpol_fast(grid[c], px, py, pz)
                      for c in range(grid.shape[0])], axis=-1)


def map_mac_to_parts(vel, parts: Particles, ptype=None, exclude: int = 0,
                     old_pvel=None):
    """mapMACToParts / PIC update (flip.cpp:709-723)."""
    u, v, w = interpol_mac_fast(vel, parts.pos[:, 0], parts.pos[:, 1],
                                parts.pos[:, 2])
    new = jnp.stack([u, v, w], axis=-1)
    if old_pvel is None:
        return new
    keep = ~parts.active_mask()
    if ptype is not None:
        keep = keep | ((ptype & exclude) != 0)
    return jnp.where(keep[:, None], old_pvel, new)


def flip_velocity_update(parts: Particles, pvel, flags, vel, vel_old,
                         flip_ratio: float, ptype=None, exclude: int = 0):
    """flipVelocityUpdate (flip.cpp:727-744): blend FLIP delta with PIC."""
    from ..core.interp import build_mac_pack, interpol_mac_packed
    px, py, pz = parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2]
    # one gather for both fields: concatenate the packed tables
    pack = jnp.concatenate([build_mac_pack(vel_old), build_mac_pack(vel)],
                           axis=1)
    half = pack.shape[1] // 2
    u1, w1, z1 = interpol_mac_packed(pack[:, :half], vel.shape[-3:], px, py, pz)
    u2, w2, z2 = interpol_mac_packed(pack[:, half:], vel.shape[-3:], px, py, pz)
    v1 = jnp.stack([u1, w1, z1], axis=-1)
    v2 = jnp.stack([u2, w2, z2], axis=-1)
    new = flip_ratio * (pvel + (v2 - v1)) + (1.0 - flip_ratio) * v2
    keep = ~parts.active_mask()
    if ptype is not None:
        keep = keep | ((ptype & exclude) != 0)
    return jnp.where(keep[:, None], pvel, new)


# ---------------------------------------------------------------------------
# flags from particles

def _cell_of(parts: Particles, dom: Domain):
    sz, sy, sx = dom.shape
    i = parts.pos[:, 0].astype(jnp.int32)
    j = parts.pos[:, 1].astype(jnp.int32)
    k = parts.pos[:, 2].astype(jnp.int32)
    inb = ((i >= 0) & (i < sx) & (j >= 0) & (j < sy))
    if dom.is3d:
        inb &= (k >= 0) & (k < sz)
    i = jnp.clip(i, 0, sx - 1)
    j = jnp.clip(j, 0, sy - 1)
    k = jnp.clip(k, 0, sz - 1)
    return (k * sy + j) * sx + i, inb


def particle_counts(parts: Particles, dom: Domain, ptype=None,
                    exclude: int = 0):
    """Per-cell particle counts (the counter grid of gridParticleIndex,
    flip.cpp:274-300)."""
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    flat, inb = _cell_of(parts, dom)
    n = dom.shape[0] * dom.shape[1] * dom.shape[2]
    cnt = jnp.zeros((n,), jnp.int32).at[flat].add(
        (active & inb).astype(jnp.int32))
    return cnt.reshape(dom.shape)


def mark_fluid_cells(parts: Particles, flags, dom: Domain, ptype=None,
                     exclude: int = 0, phi_obs=None):
    """markFluidCells (flip.cpp:166-190): clear fluid flags, re-mark cells
    containing particles; with phiObs, additionally run knSetNbObstacle
    (flip.cpp:149-164) — empty cells inside the obstacle band (phiObs<=0)
    that sit between a fluid neighbor on one side and obstacle interior on
    the opposite side become fluid (second-order obstacle BCs)."""
    cleared = jnp.where(fl.is_fluid(flags),
                        (flags | fl.TypeEmpty) & ~fl.TypeFluid, flags)
    occupied = particle_counts(parts, dom, ptype, exclude) > 0
    mark = occupied & fl.is_empty(cleared)
    flags = jnp.where(mark, (cleared | fl.TypeFluid) & ~fl.TypeEmpty, cleared)
    if phi_obs is not None:
        from ..core.masks import interior_mask, shift
        fluid = fl.is_fluid(flags)
        obs_in = phi_obs <= 0.0
        set_nb = jnp.zeros(dom.shape, bool)
        axes = ["x", "y"] + (["z"] if dom.is3d else [])
        for ax in axes:
            set_nb = set_nb | (shift(fluid, -1, ax) & shift(obs_in, 1, ax))
            set_nb = set_nb | (shift(fluid, 1, ax) & shift(obs_in, -1, ax))
        hit = (interior_mask(dom, 1) & (phi_obs <= 0.0)
               & fl.is_empty(flags) & set_nb)
        flags = jnp.where(hit, (flags | fl.TypeFluid) & ~fl.TypeEmpty, flags)
    return flags


def mark_isolated_fluid_cell(flags, dom: Domain, mark: int):
    """markIsolatedFluidCell (grid.cpp:988-1011): fluid cells with no fluid
    4/6-neighbor are retyped to `mark` wholesale."""
    fluid = fl.is_fluid(flags)
    has_nb = (shift(fluid, 1, "x") | shift(fluid, -1, "x")
              | shift(fluid, 1, "y") | shift(fluid, -1, "y"))
    if dom.is3d:
        has_nb = has_nb | shift(fluid, 1, "z") | shift(fluid, -1, "z")
    return jnp.where(fluid & ~has_nb, jnp.int32(mark), flags)


def set_part_type(parts: Particles, ptype, mark: int, stype: int, flags,
                  dom: Domain, cflag: int):
    """setPartType (ptsplugins.cpp:56-66)."""
    flat, inb = _cell_of(parts, dom)
    cell_flag = flags.reshape(-1)[flat]
    hit = inb & ((cell_flag & cflag) != 0) & ((ptype & stype) != 0)
    return jnp.where(hit, jnp.int32(mark), ptype)


# ---------------------------------------------------------------------------
# particle level sets

def _radius_factor(dom: Domain, factor: float) -> float:
    """calculateRadiusFactor (flip.cpp:198): cell diagonal + 1% safety."""
    return (math.sqrt(3.0) if dom.is3d else math.sqrt(2.0)) * (factor + 0.01)


def union_particle_levelset(parts: Particles, flags, dom: Domain,
                            radius_factor: float = 1.0, ptype=None,
                            exclude: int = 0):
    """unionParticleLevelset (flip.cpp:300-363): per-cell min over nearby
    particles of |cellCenter - p| - radius, computed as a bounded-window
    scatter-min instead of the reference's cell-index search."""
    radius = 0.5 * _radius_factor(dom, radius_factor)
    r = int(1.0 * radius) + 1
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)

    pi = parts.pos[:, 0].astype(jnp.int32)
    pj = parts.pos[:, 1].astype(jnp.int32)
    pk = parts.pos[:, 2].astype(jnp.int32)

    big = jnp.float32(1e10)
    zrange = list(range(-r, r + 1)) if dom.is3d else [0]
    offs = [(dz, dy, dx) for dz in zrange
            for dy in range(-r, r + 1) for dx in range(-r, r + 1)]

    if r == 1:
        # row-packed scatter-min: ONE scatter writes a (27|9)-wide row of
        # neighbor-cell distances keyed by the particle's own cell, then a
        # roll/mask fold distributes the mins (3x faster than 27 separate
        # scatter-mins at ~0.5M particles — same trick as scatter_rows)
        inb = active & (pi >= 0) & (pi < sx) & (pj >= 0) & (pj < sy)
        if dom.is3d:
            inb = inb & (pk >= 0) & (pk < sz)
        pkc = pk if dom.is3d else jnp.zeros_like(pi)
        base = ((jnp.clip(pkc, 0, sz - 1) * sy + jnp.clip(pj, 0, sy - 1))
                * sx + jnp.clip(pi, 0, sx - 1))
        pxf, pyf, pzf = parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2]
        cols = []
        for (dz, dy, dx) in offs:
            gx = (pi + dx).astype(jnp.float32) + 0.5
            gy = (pj + dy).astype(jnp.float32) + 0.5
            d2 = (gx - pxf) ** 2 + (gy - pyf) ** 2
            if dom.is3d:
                gz = (pkc + dz).astype(jnp.float32) + 0.5
                d2 = d2 + (gz - pzf) ** 2
            cols.append(jnp.sqrt(d2) - radius)
        rows = jnp.stack(cols, axis=1)
        rows = jnp.where(inb[:, None], rows, big)
        aux = jnp.full((n, len(offs)), big, jnp.float32).at[base].min(rows)

        from ..core.masks import axis_index
        ix = jnp.broadcast_to(axis_index(dom, "x"), dom.shape).reshape(-1)
        iy = jnp.broadcast_to(axis_index(dom, "y"), dom.shape).reshape(-1)
        iz = jnp.broadcast_to(axis_index(dom, "z"), dom.shape).reshape(-1)
        phi_flat = jnp.full((n,), radius, jnp.float32)
        for c, (dz, dy, dx) in enumerate(offs):
            o = (dz * sy + dy) * sx + dx
            contrib = jnp.roll(aux[:, c], o)
            valid = (ix - dx >= 0) & (ix - dx < sx) \
                & (iy - dy >= 0) & (iy - dy < sy)
            if dom.is3d:
                valid = valid & (iz - dz >= 0) & (iz - dz < sz)
            phi_flat = jnp.minimum(phi_flat,
                                   jnp.where(valid, contrib, big))
    else:
        phi_flat = jnp.full((n,), radius, jnp.float32)
        for (dz, dy, dx) in offs:
            ci, cj, ck = pi + dx, pj + dy, pk + dz
            ok = active & (ci >= 0) & (ci < sx) & (cj >= 0) & (cj < sy)
            if dom.is3d:
                ok &= (ck >= 0) & (ck < sz)
            cik = jnp.clip(ci, 0, sx - 1)
            cjk = jnp.clip(cj, 0, sy - 1)
            ckk = jnp.clip(ck, 0, sz - 1) if dom.is3d else jnp.zeros_like(cik)
            gx = cik.astype(jnp.float32) + 0.5
            gy = cjk.astype(jnp.float32) + 0.5
            gz = ckk.astype(jnp.float32) + 0.5
            d = jnp.sqrt((gx - parts.pos[:, 0]) ** 2
                         + (gy - parts.pos[:, 1]) ** 2
                         + ((gz - parts.pos[:, 2]) ** 2 if dom.is3d else 0.0)
                         ) - radius
            d = jnp.where(ok, d, big)
            flat = (ckk * sy + cjk) * sx + cik
            phi_flat = phi_flat.at[flat].min(d)
    phi = phi_flat.reshape(dom.shape)
    # phi.setBound(0.5, 0): outermost layer
    inter = interior_mask(dom, 1)
    return jnp.where(inter, phi, 0.5)


def averaged_particle_levelset(parts: Particles, flags, dom: Domain,
                               radius_factor: float = 1.0, smoothen: int = 1,
                               smoothen_neg: int = 1, ptype=None,
                               exclude: int = 0):
    """averagedParticleLevelset (flip.cpp:367-477), Zhu & Bridson style:
    weighted-average particle position/radius then smoothing."""
    radius = 0.5 * _radius_factor(dom, radius_factor)
    r = int(1.0 * radius) + 1
    sradius_inv = 1.0 / (4.0 * radius * radius)
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)

    wacc = jnp.zeros((n,), jnp.float32)
    pacc = jnp.zeros((n, 3), jnp.float32)

    pi = parts.pos[:, 0].astype(jnp.int32)
    pj = parts.pos[:, 1].astype(jnp.int32)
    pk = parts.pos[:, 2].astype(jnp.int32)
    zrange = range(-r, r + 1) if dom.is3d else [0]
    for dz in zrange:
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                ci, cj, ck = pi + dx, pj + dy, pk + dz
                ok = active & (ci >= 0) & (ci < sx) & (cj >= 0) & (cj < sy)
                if dom.is3d:
                    ok &= (ck >= 0) & (ck < sz)
                cik = jnp.clip(ci, 0, sx - 1)
                cjk = jnp.clip(cj, 0, sy - 1)
                ckk = jnp.clip(ck, 0, sz - 1) if dom.is3d else jnp.zeros_like(cik)
                gx = cik.astype(jnp.float32) + 0.5
                gy = cjk.astype(jnp.float32) + 0.5
                gz = ckk.astype(jnp.float32) + 0.5
                s = ((gx - parts.pos[:, 0]) ** 2 + (gy - parts.pos[:, 1]) ** 2
                     + ((gz - parts.pos[:, 2]) ** 2 if dom.is3d else 0.0)
                     ) * sradius_inv
                w = jnp.maximum(0.0, 1.0 - s)
                w = jnp.where(ok, w, 0.0)
                flat = (ckk * sy + cjk) * sx + cik
                wacc = wacc.at[flat].add(w)
                pacc = pacc.at[flat].add(w[:, None] * parts.pos)
    have = wacc > VECTOR_EPSILON
    pavg = pacc / jnp.maximum(wacc, 1e-30)[:, None]
    racc = radius  # racc/wacc == radius (all particles share one radius)
    gx = (jnp.arange(sx, dtype=jnp.float32) + 0.5).reshape(1, 1, sx)
    gy = (jnp.arange(sy, dtype=jnp.float32) + 0.5).reshape(1, sy, 1)
    gz = (jnp.arange(sz, dtype=jnp.float32) + 0.5).reshape(sz, 1, 1)
    px = pavg[:, 0].reshape(dom.shape)
    py = pavg[:, 1].reshape(dom.shape)
    pz = pavg[:, 2].reshape(dom.shape)
    dist = jnp.sqrt((gx - px) ** 2 + (gy - py) ** 2
                    + ((gz - pz) ** 2 if dom.is3d else 0.0)) - racc
    phi = jnp.where(have.reshape(dom.shape), dist, radius)

    factor = 1.0 / (1.0 + 2.0 * dom.dim)
    return _smooth_postprocess(phi, dom, smoothen, smoothen_neg, factor)


def improved_particle_levelset(parts: Particles, flags, dom: Domain,
                               radius_factor: float = 1.0, smoothen: int = 1,
                               smoothen_neg: int = 1, t_low: float = 0.4,
                               t_high: float = 3.5, ptype=None,
                               exclude: int = 0):
    """improvedParticleLevelset (flip.cpp:503-581, Solenthaler'07): averaged
    particle levelset with a deformation-aware radius correction from the
    largest eigenvalue of the jacobian of averaged positions, using the
    reference's Cardano cubic solver verbatim (matrixbase.h:184 — including
    its quirk of reporting 0 for the complex pair when only one real root
    exists, which biases maxEV toward >= 0)."""
    import jax
    radius = 0.5 * _radius_factor(dom, radius_factor)
    # recompute averaged weights, keeping pAcc (averaged positions)
    r = int(1.0 * radius) + 1
    sradius_inv = 1.0 / (4.0 * radius * radius)
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    wacc = jnp.zeros((n,), jnp.float32)
    pacc = jnp.zeros((n, 3), jnp.float32)
    pi = parts.pos[:, 0].astype(jnp.int32)
    pj = parts.pos[:, 1].astype(jnp.int32)
    pk = parts.pos[:, 2].astype(jnp.int32)
    zrange = range(-r, r + 1) if dom.is3d else [0]
    for dz in zrange:
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                ci, cj, ck = pi + dx, pj + dy, pk + dz
                ok = active & (ci >= 0) & (ci < sx) & (cj >= 0) & (cj < sy)
                if dom.is3d:
                    ok &= (ck >= 0) & (ck < sz)
                cik = jnp.clip(ci, 0, sx - 1)
                cjk = jnp.clip(cj, 0, sy - 1)
                ckk = jnp.clip(ck, 0, sz - 1) if dom.is3d else jnp.zeros_like(cik)
                gx = cik.astype(jnp.float32) + 0.5
                gy = cjk.astype(jnp.float32) + 0.5
                gz = ckk.astype(jnp.float32) + 0.5
                s = ((gx - parts.pos[:, 0]) ** 2 + (gy - parts.pos[:, 1]) ** 2
                     + ((gz - parts.pos[:, 2]) ** 2 if dom.is3d else 0.0)
                     ) * sradius_inv
                w = jnp.where(ok, jnp.maximum(0.0, 1.0 - s), 0.0)
                flat = (ckk * sy + cjk) * sx + cik
                wacc = wacc.at[flat].add(w)
                pacc = pacc.at[flat].add(w[:, None] * parts.pos)
    have = (wacc > VECTOR_EPSILON).reshape(dom.shape)
    pavg = (pacc / jnp.maximum(wacc, 1e-30)[:, None]).reshape(dom.shape + (3,))
    pavg = jnp.moveaxis(pavg, -1, 0)  # (3, z, y, x)

    # jacobian of averaged positions (correctLevelset, flip.cpp:503-538)
    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))
    axes = ["x", "y", "z"]
    jac = jnp.stack([jnp.stack([
        d1(pavg[row], axes[colu]) if (dom.is3d or colu < 2)
        else jnp.zeros(dom.shape) for colu in range(3)], axis=-1)
        for row in range(3)], axis=-2)  # (..., 3, 3)
    max_ev = _max_eigenvalue_3x3(jac)

    t = (t_high - max_ev) / (t_high - t_low)
    corr = jnp.where(max_ev >= t_low, t ** 3 - 3 * t ** 2 + 3 * t, 1.0)
    corr = jnp.clip(corr, 0.0, 1.0)

    gx = (jnp.arange(sx, dtype=jnp.float32) + 0.5).reshape(1, 1, sx)
    gy = (jnp.arange(sy, dtype=jnp.float32) + 0.5).reshape(1, sy, 1)
    gz = (jnp.arange(sz, dtype=jnp.float32) + 0.5).reshape(sz, 1, 1)
    dist = jnp.sqrt((gx - pavg[0]) ** 2 + (gy - pavg[1]) ** 2
                    + ((gz - pavg[2]) ** 2 if dom.is3d else 0.0))
    corrected = jnp.minimum(dist - radius * corr, radius)
    phi = jnp.where(have, corrected, radius)

    factor = 1.0 / (7.0 if dom.is3d else 5.0)
    return _smooth_postprocess(phi, dom, smoothen, smoothen_neg, factor)


def _max_eigenvalue_3x3(jac):
    """Matrix3x3::eigenvalues (util/matrixbase.h:184) via Cardano, batched
    over trailing (...,3,3). Replicates the reference exactly: when the
    characteristic cubic has one real root (h>0), the complex pair is
    reported as 0, so the returned maximum is max(real_root, 0)."""
    v = jac.astype(jnp.float32)
    v00, v01, v02 = v[..., 0, 0], v[..., 0, 1], v[..., 0, 2]
    v10, v11, v12 = v[..., 1, 0], v[..., 1, 1], v[..., 1, 2]
    v20, v21, v22 = v[..., 2, 0], v[..., 2, 1], v[..., 2, 2]
    b = -v00 - v11 - v22
    c = v00 * (v11 + v22) + v11 * v22 - v12 * v21 - v01 * v10 - v02 * v20
    d = (-v00 * (v11 * v22 - v12 * v21) - v20 * (v01 * v12 - v11 * v02)
         - v10 * (v02 * v21 - v22 * v01))
    f = (3.0 * c - b * b) / 3.0
    g = (2.0 * b ** 3 - 9.0 * b * c + 27.0 * d) / 27.0
    h = g * g / 4.0 + f ** 3 / 27.0

    # h > 0: one real root (cbrt handles negative operands)
    sqrt_h = jnp.sqrt(jnp.maximum(h, 0.0))
    e_single = (jnp.cbrt(-g / 2.0 + sqrt_h) + jnp.cbrt(-g / 2.0 - sqrt_h)
                - b / 3.0)
    max_pos = jnp.maximum(e_single, 0.0)  # complex pair reported as 0

    # h <= 0: three real roots (trigonometric form)
    i_ = jnp.sqrt(jnp.maximum(g * g / 4.0 - h, 1e-30))
    j_ = jnp.cbrt(i_)
    k_ = jnp.arccos(jnp.clip(-g / (2.0 * i_), -1.0, 1.0))
    m_ = jnp.cos(k_ / 3.0)
    n_ = jnp.sqrt(3.0) * jnp.sin(k_ / 3.0)
    p_ = -b / 3.0
    e0 = 2.0 * j_ * m_ + p_
    e1 = -j_ * (m_ + n_) + p_
    e2 = -j_ * (m_ - n_) + p_
    max_tri = jnp.maximum(e0, jnp.maximum(e1, e2))

    return jnp.where(h > 0.0, max_pos, max_tri)


def _neighbor_sum(a, dom: Domain):
    s = (a + shift(a, 1, "x") + shift(a, -1, "x")
         + shift(a, 1, "y") + shift(a, -1, "y"))
    if dom.is3d:
        s = s + shift(a, 1, "z") + shift(a, -1, "z")
    return s


def _smooth_grid(phi, dom: Domain, factor: float):
    """knSmoothGrid (flip.cpp:445-459), bnd=1."""
    val = _neighbor_sum(phi, dom) * factor
    return jnp.where(interior_mask(dom, 1), val, phi)


def _smooth_grid_neg(phi, dom: Domain, factor: float):
    """knSmoothGridNeg (flip.cpp:461-475): take smoothed value only when it
    decreases phi."""
    val = _neighbor_sum(phi, dom) * factor
    out = jnp.where(val < phi, val, phi)
    return jnp.where(interior_mask(dom, 1), out, phi)


def _smooth_postprocess(phi, dom: Domain, smoothen: int, smoothen_neg: int,
                        factor: float):
    """The particle-levelset smoothing loop exactly as the reference runs it
    (flip.cpp:487-498): per iteration a FRESH zero tmp buffer; knSmoothGrid
    writes only the interior of tmp then swaps (phi's ring becomes 0, tmp
    holds the pre-smooth phi); knSmoothGridNeg then compares its smoothed
    value against tmp's CURRENT content (the pre-smooth phi after a smooth
    pass, zeros otherwise) and swaps again (ring restored from tmp).
    Followed by setBound(0.5, 0)."""
    inter = interior_mask(dom, 1)
    for i in range(max(smoothen, smoothen_neg)):
        tmp = jnp.zeros_like(phi)
        if i < smoothen:
            val = _neighbor_sum(phi, dom) * factor
            phi, tmp = jnp.where(inter, val, tmp), phi
        if i < smoothen_neg:
            val = _neighbor_sum(phi, dom) * factor
            phi = jnp.where(inter, jnp.where(val < tmp, val, phi), tmp)
    return jnp.where(inter, phi, 0.5)


# ---------------------------------------------------------------------------
# narrow band & misc

def combine_grid_vel(vel, weight, combine_vel, dom: Domain, phi=None,
                     narrow_band: float = 0.0, thresh: float = 0.0):
    """combineGridVel (flip.cpp:748-773). Returns (vel, combine_vel)."""
    sz, sy, sx = dom.shape
    x = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx)
    y = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1)
    z = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1)
    face_pos = [
        (jnp.broadcast_to(x, dom.shape), jnp.broadcast_to(y + 0.5, dom.shape),
         jnp.broadcast_to(z + 0.5, dom.shape)),
        (jnp.broadcast_to(x + 0.5, dom.shape), jnp.broadcast_to(y, dom.shape),
         jnp.broadcast_to(z + 0.5, dom.shape)),
        (jnp.broadcast_to(x + 0.5, dom.shape), jnp.broadcast_to(y + 0.5, dom.shape),
         jnp.broadcast_to(z, dom.shape)),
    ]
    new_vel, new_cv = [], []
    for c in range(3):
        v, cv = vel[c], combine_vel[c]
        inner = jnp.where(weight[c] > thresh, -1.0, 0.0)
        cv = jnp.where(weight[c] > thresh, v, cv)
        v = inner
        if phi is not None:
            fx, fy, fz = face_pos[c]
            p = interpol(phi, fx, fy, fz)
            deep = p < -narrow_band
            v = jnp.where(deep, 0.0, v)
            cv = jnp.where(deep, combine_vel[c], cv)
        new_vel.append(v)
        new_cv.append(cv)
    return jnp.stack(new_vel), jnp.stack(new_cv)


def get_laplacian(grid, dom: Domain):
    """LaplaceOp (commonkernels.h): 5/7-point Laplacian, bnd=1.
    (_neighbor_sum includes the center, hence the (1 + 2*dim) factor.)"""
    lap = _neighbor_sum(grid, dom) - (1.0 + 2.0 * dom.dim) * grid
    return jnp.where(interior_mask(dom, 1), lap, 0.0)


def get_curvature(grid, dom: Domain, h: float = 1.0):
    """CurvatureOp (commonkernels.h): kappa = div(grad phi / |grad phi|),
    computed with central differences at bnd=1."""
    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))

    def d2(a, ax):
        return shift(a, 1, ax) - 2.0 * a + shift(a, -1, ax)

    def dxy(a, ax1, ax2):
        return 0.25 * (shift(shift(a, 1, ax1), 1, ax2)
                       - shift(shift(a, -1, ax1), 1, ax2)
                       - shift(shift(a, 1, ax1), -1, ax2)
                       + shift(shift(a, -1, ax1), -1, ax2))

    px_, py_ = d1(grid, "x"), d1(grid, "y")
    pxx, pyy = d2(grid, "x"), d2(grid, "y")
    pxy = dxy(grid, "x", "y")
    if dom.is3d:
        pz_ = d1(grid, "z")
        pzz = d2(grid, "z")
        pxz, pyz = dxy(grid, "x", "z"), dxy(grid, "y", "z")
        g2 = px_ ** 2 + py_ ** 2 + pz_ ** 2
        num = (px_ ** 2 * (pyy + pzz) + py_ ** 2 * (pxx + pzz)
               + pz_ ** 2 * (pxx + pyy)
               - 2 * (px_ * py_ * pxy + px_ * pz_ * pxz + py_ * pz_ * pyz))
    else:
        g2 = px_ ** 2 + py_ ** 2
        num = px_ ** 2 * pyy + py_ ** 2 * pxx - 2 * px_ * py_ * pxy
    denom = jnp.maximum(g2, 1e-12) ** 1.5
    kappa = num / (denom * h)
    return jnp.where(interior_mask(dom, 1), kappa, 0.0)


# ---------------------------------------------------------------------------
# particle channel ops (ptsplugins.cpp)

def add_force_pvel(pvel, accel, dt, ptype=None, exclude: int = 0):
    """addForcePvel (ptsplugins.cpp:26-30)."""
    # scalar products (dt is traced), not a (3,) const array
    da = jnp.stack([jnp.float32(a) * dt for a in tuple(accel)])
    upd = pvel + da[None, :]
    if ptype is not None:
        upd = jnp.where(((ptype & exclude) != 0)[:, None], pvel, upd)
    return upd


def euler_step(parts: Particles, pvel, dt, ptype=None, exclude: int = 0):
    """eulerStep (ptsplugins.cpp:44-54)."""
    move = ((ptype & exclude) == 0) if ptype is not None else jnp.ones(
        parts.capacity, dtype=bool)
    pos = jnp.where(move[:, None], parts.pos + pvel * dt, parts.pos)
    return dataclasses.replace(parts, pos=pos)


def update_velocity_from_delta_pos(parts: Particles, pvel, x_prev, dt,
                                   ptype=None, exclude: int = 0):
    """updateVelocityFromDeltaPos (ptsplugins.cpp:32-42)."""
    new = (parts.pos - x_prev) / dt
    if ptype is not None:
        new = jnp.where(((ptype & exclude) != 0)[:, None], pvel, new)
    return new


# ---------------------------------------------------------------------------
# resampling (adjustNumber, flip.cpp:204-271)

def adjust_number(parts: Particles, vel, flags, dom: Domain,
                  min_particles: int, max_particles: int, phi,
                  radius_factor: float = 1.0, narrow_band: float = -1.0,
                  exclude=None, seed: int = 9832):
    """adjustNumber: kill out-of-band/overfull particles, reseed underfull
    fluid cells. Fixed-capacity redesign of the reference's kill/compress/
    addBuffered flow: deletions are flag bits; new particles stream-compact
    into dead slots (capacity bounds total count — overflow candidates are
    dropped, which the reference's unbounded vector never hits; we keep
    1.5x headroom at sampling time).

    The per-cell overfull cull keeps the lowest-index particles (equal to
    the reference's first-come scan order), and reseeding consumes the
    exact fresh RandomStream(9832) in FOR_IJK cell order, so seeded
    positions match the reference binary bit-for-bit.
    """
    import jax

    surface_ls = -1.0 * _radius_factor(dom, radius_factor)
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    cap = parts.capacity
    idx = jnp.arange(cap, dtype=jnp.int32)

    alive = parts.active_mask()
    flat, inb = _cell_of(parts, dom)
    phiv = interpol(phi, parts.pos[:, 0], parts.pos[:, 1], parts.pos[:, 2])
    kill = ~inb | (phiv > 0.0)
    if narrow_band > 0.0:
        kill = kill | (phiv < -narrow_band)
    at_surface = phiv > surface_ls
    alive1 = alive & ~kill

    # per-cell rank among surviving particles: stable sort keeps ascending
    # index order within a cell (matching the reference's scan order)
    cells_key = jnp.where(alive1, flat, n)
    order = jnp.argsort(cells_key, stable=True)
    sorted_cells = cells_key[order]
    new_run = jnp.concatenate([jnp.array([True]),
                               sorted_cells[1:] != sorted_cells[:-1]])
    pos_in_sorted = jnp.arange(cap, dtype=jnp.int32)
    run_start = jnp.where(new_run, pos_in_sorted, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    rank_sorted = pos_in_sorted - run_start
    rank = jnp.zeros(cap, jnp.int32).at[order].set(rank_sorted)

    # reference kill check is `num > maxParticles` with num = survivors so
    # far — i.e. maxParticles+1 non-surface particles survive per cell
    overfull = alive1 & ~at_surface & (rank > max_particles)
    alive2 = alive1 & ~overfull
    new_flags = jnp.where(alive & ~alive2, parts.flags | PDELETE, parts.flags)

    # per-cell survivor counts
    cnt = jnp.zeros((n,), jnp.int32).at[flat].add(alive2.astype(jnp.int32))

    # seed cells: fluid, in band, below min count, not excluded
    phi_flat = phi.reshape(-1)
    seed_cell = (fl.is_fluid(flags).reshape(-1)
                 & (phi_flat <= surface_ls) & (cnt < min_particles))
    if narrow_band > 0.0:
        seed_cell = seed_cell & (phi_flat >= -narrow_band)
    if exclude is not None:
        seed_cell = seed_cell & ~(exclude.reshape(-1) < 0.0)

    # seed positions: pos = cell_ijk + RandomStream(9832).getVec3() — a
    # FRESH stream each call, consumed in FOR_IJK cell order with the
    # per-cell deficit loop inner (flip.cpp:239-257). Host-side numpy so
    # the draw sequence matches the reference binary exactly.
    import numpy as onp
    from ..utils.mtrand import RandomStream

    k_def = onp.where(onp.asarray(seed_cell),
                      onp.maximum(0, min_particles - onp.asarray(cnt)), 0)
    cells = onp.nonzero(k_def)[0]
    counts = k_def[cells]
    total = int(counts.sum())
    draws = RandomStream(seed).get_vec3s(total) if total else \
        onp.zeros((0, 3), onp.float32)
    cell_ids = onp.repeat(cells, counts)
    czn, cyn, cxn = onp.unravel_index(cell_ids, dom.shape)
    cand_np = onp.stack([cxn, cyn, czn], axis=1).astype(onp.float32) + draws
    if not dom.is3d:
        cand_np[:, 2] = 0.5
    cand_pos = jnp.asarray(cand_np)

    # stream-compact candidates into dead slots
    dead = ~alive2 | (idx >= parts.count)
    dead_slots = jnp.nonzero(dead, size=cap, fill_value=cap)[0]
    n_dead = jnp.sum(dead)
    r = jnp.arange(cap, dtype=jnp.int32)
    valid = (r < n_dead) & (r < total)
    tgt = jnp.where(valid, dead_slots, cap)  # cap => dropped by mode="drop"
    src = jnp.clip(r, 0, max(total - 1, 0))
    if total:
        new_pos = parts.pos.at[tgt].set(cand_pos[src], mode="drop")
        new_flags = new_flags.at[tgt].set(PNEW, mode="drop")
    else:
        new_pos = parts.pos

    import dataclasses
    return dataclasses.replace(parts, pos=new_pos, flags=new_flags,
                               count=jnp.int32(cap))
