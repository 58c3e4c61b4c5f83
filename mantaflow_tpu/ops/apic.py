"""APIC (affine particle-in-cell) transfers.

Behavioral port of ``source/plugin/apic.cpp``: knApicMapLinearVec3ToMACGrid
(:20-84) and knApicMapLinearMACGridToVec3 (:108-174), vectorized as
scatter/gather over (8, N) corner arrays like ops/flip.py. Per-particle
affine matrices are stored as three Vec3 channels cpx/cpy/cpz (rows of C).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.domain import Domain
from ..core.particles import Particles

VECTOR_EPSILON = 1e-6


def _apic_weights(pos, dom: Domain, c: int):
    """Face (fi/wfi) and center (ci/wci) index/weight pairs per apic.cpp's
    index scheme: component c's own axis uses the face pair, others the
    center pair. Returns per-axis (idx0, w1) and the face base position."""
    sz, sy, sx = dom.shape
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]

    def face(p):
        i0 = p.astype(jnp.int32)
        return i0, jnp.clip(p - i0.astype(p.dtype), 0.0, 1.0)

    def center(p):
        i0 = (p - 0.5).astype(jnp.int32)
        return i0, jnp.clip(p - i0.astype(p.dtype) - 0.5, 0.0, 1.0)

    fx, wfx = face(px)
    fy, wfy = face(py)
    fz, wfz = face(pz)
    cx, wcx = center(px)
    cy, wcy = center(py)
    cz, wcz = center(pz)
    if c == 0:
        ijk = (fx, cy, cz)
        w = (wfx, wcy, wcz)
        gpos = (fx.astype(jnp.float32), cy.astype(jnp.float32) + 0.5,
                cz.astype(jnp.float32) + 0.5)
    elif c == 1:
        ijk = (cx, fy, cz)
        w = (wcx, wfy, wcz)
        gpos = (cx.astype(jnp.float32) + 0.5, fy.astype(jnp.float32),
                cz.astype(jnp.float32) + 0.5)
    else:
        ijk = (cx, cy, fz)
        w = (wcx, wcy, wfz)
        gpos = (cx.astype(jnp.float32) + 0.5, cy.astype(jnp.float32) + 0.5,
                fz.astype(jnp.float32))
    # clip base so idx+1 stays in bounds (reference leaves this unchecked)
    i0 = jnp.clip(ijk[0], 0, sx - 2)
    j0 = jnp.clip(ijk[1], 0, sy - 2)
    k0 = jnp.clip(ijk[2], 0, max(sz - 2, 0))
    return (i0, j0, k0), w, gpos


def apic_map_parts_to_mac(parts: Particles, pvel, cpx, cpy, cpz, flags,
                          dom: Domain, ptype=None, exclude: int = 0):
    """apicMapPartsToMAC (apic.cpp:87-105). Returns (vel, mass)."""
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    af = active.astype(jnp.float32)
    cps = [cpx, cpy, cpz]
    n_comp = 3 if dom.is3d else 2
    vels, masses = [], []
    zdirs = (0, 1) if dom.is3d else (0,)
    for c in range(3):
        if c >= n_comp:
            vels.append(jnp.zeros(dom.shape, jnp.float32))
            masses.append(jnp.zeros(dom.shape, jnp.float32))
            continue
        (i0, j0, k0), (wx1, wy1, wz1), (gx, gy, gz) = _apic_weights(
            parts.pos, dom, c)
        acc = jnp.zeros((n,), jnp.float32)
        mass = jnp.zeros((n,), jnp.float32)
        cp = cps[c]
        for di in (0, 1):
            wi = wx1 if di else 1.0 - wx1
            for dj in (0, 1):
                wj = wy1 if dj else 1.0 - wy1
                for dk in zdirs:
                    wk = wz1 if dk else 1.0 - wz1
                    w = wi * wj * (wk if dom.is3d else 1.0) * af
                    rx = gx + di - parts.pos[:, 0]
                    ry = gy + dj - parts.pos[:, 1]
                    rz = gz + dk - parts.pos[:, 2]
                    val = (pvel[:, c] + cp[:, 0] * rx + cp[:, 1] * ry
                           + cp[:, 2] * rz)
                    flat = ((k0 + dk) * sy + (j0 + dj)) * sx + (i0 + di)
                    acc = acc.at[flat].add(w * val)
                    mass = mass.at[flat].add(w)
        vels.append(acc.reshape(dom.shape))
        masses.append(mass.reshape(dom.shape))
    mass = jnp.stack(masses)
    acc = jnp.stack(vels)
    mass_st = jnp.where(mass <= VECTOR_EPSILON, 0.0, mass)
    vel = jnp.where(mass_st > 0, acc / jnp.maximum(mass_st, 1e-30), 0.0)
    return vel, mass


def apic_map_mac_to_parts(parts: Particles, vel, flags, dom: Domain,
                          ptype=None, exclude: int = 0, old=None):
    """apicMapMACGridToParts (apic.cpp:108-183). Returns
    (pvel, cpx, cpy, cpz)."""
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    sz, sy, sx = dom.shape
    n_comp = 3 if dom.is3d else 2
    zdirs = (0, 1) if dom.is3d else (0,)
    pvel_cols = []
    cps = []
    for c in range(3):
        if c >= n_comp:
            pvel_cols.append(jnp.zeros(parts.capacity, jnp.float32))
            cps.append(jnp.zeros((parts.capacity, 3), jnp.float32))
            continue
        (i0, j0, k0), (wx1, wy1, wz1), _ = _apic_weights(parts.pos, dom, c)
        v = jnp.zeros(parts.capacity, jnp.float32)
        cpx_ = jnp.zeros(parts.capacity, jnp.float32)
        cpy_ = jnp.zeros(parts.capacity, jnp.float32)
        cpz_ = jnp.zeros(parts.capacity, jnp.float32)
        for di in (0, 1):
            wi = wx1 if di else 1.0 - wx1
            gi = 1.0 if di else -1.0
            for dj in (0, 1):
                wj = wy1 if dj else 1.0 - wy1
                gj = 1.0 if dj else -1.0
                for dk in zdirs:
                    wk = (wz1 if dk else 1.0 - wz1) if dom.is3d else 1.0
                    gk = 1.0 if dk else -1.0
                    vg = vel[c][k0 + dk, j0 + dj, i0 + di]
                    v = v + wi * wj * wk * vg
                    cpx_ = cpx_ + gi * wj * wk * vg
                    cpy_ = cpy_ + wi * gj * wk * vg
                    if dom.is3d:
                        cpz_ = cpz_ + wi * wj * gk * vg
        pvel_cols.append(v)
        cps.append(jnp.stack([cpx_, cpy_, cpz_], axis=-1))
    pvel = jnp.stack(pvel_cols, axis=-1)
    keep = ~active
    if old is not None:
        old_pvel, old_cpx, old_cpy, old_cpz = old
        pvel = jnp.where(keep[:, None], old_pvel, pvel)
        cps = [jnp.where(keep[:, None], o, c_)
               for o, c_ in zip((old_cpx, old_cpy, old_cpz), cps)]
    else:
        pvel = jnp.where(keep[:, None], 0.0, pvel)
        cps = [jnp.where(keep[:, None], 0.0, c_) for c_ in cps]
    return pvel, cps[0], cps[1], cps[2]
