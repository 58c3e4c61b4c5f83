"""Pallas TPU kernels for the bucketed FLIP transfers (p2g, union levelset,
FLIP blend).

The XLA forms in ops/flip_bucket.py materialize a (PPC, T) intermediate per
window tap in HBM (p2g: 54 taps, levelset: 27 offsets) — memory-bound. Here
each kernel walks the bucket array one z-slab per grid step with everything
hot in VMEM:

- p2g / union levelset are SOURCE-centric: the full (3,Z,Y,X) accumulator
  (vel sums + weights, or phi^2 mins) lives in a VMEM output revisited by
  every grid step ("arbitrary" dimension semantics make writes persist), and
  each particle slab scatters its tap contributions into the z in
  [k-1, k+1] output rows through static dynamic-slices;
- the FLIP blend is GATHER-style like the advection kernel: both MAC grids
  sit fully in VMEM (padded, so taps are static in-bounds slices) and each
  particle slab evaluates v_new/v_old at its own positions.

Semantics are identical to flip_bucket.p2g_mac / union_levelset_bucketed /
flip_update_bucketed (mapPartsToMAC flip.cpp:637-662, unionParticleLevelset
flip.cpp:300-363, flipVelocityUpdate flip.cpp:727-744); only float
accumulation order differs. Scope: 3D, output grid resident in VMEM (fine
through ~96^3 f32; larger grids would tile y as well).
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.domain import Domain
# shared BUILD_INDEX / tap-table helpers (see flip_bucket_pallas note)
from .flip_bucket import _BIG, _MAC_SHIFTS, _T0_CROSS, _T0_OWN, _axw
from .flip_bucket import _tap_weights as _tapw
from .flip_bucket_pallas import _PAD


# ---------------------------------------------------------------------------
# p2g: mapPartsToMAC accumulation


def _p2g_kernel(occ_ref, px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref,
                val_ref, acc_ref, wacc_ref, *, shape, ppc, yb):
    """One (z-slab, y-block) tile of source buckets accumulates into the
    full-grid VMEM accumulators. Output rows touched: z + dz, y0 + dy for
    dz/dy in -1..1 (drift-0 positions: own-axis taps {0,1}, cross-axis
    {-1,0,1}); tiles with no valid particles are skipped entirely."""
    sz, sy, sx = shape
    k = pl.program_id(0)
    j = pl.program_id(1)
    y0 = j * yb
    jmax = sy // yb - 1
    P = ppc

    px = px_ref[:, 0]
    py = py_ref[:, 0]
    pz = pz_ref[:, 0]
    af = val_ref[:, 0]

    @pl.when((k == 0) & (j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        wacc_ref[...] = jnp.zeros_like(wacc_ref)

    @pl.when(occ_ref[k, j] > 0)
    def _compute():
        cxi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 2)
        cyi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 1) + y0

        pvel = (vx_ref[:, 0], vy_ref[:, 0], vz_ref[:, 0])
        for c in range(3):
            ox, oy, oz = _MAC_SHIFTS[c]
            bx, wx1 = _axw(px - ox, sx)
            by, wy1 = _axw(py - oy, sy)
            bz, wz1 = _axw(pz - oz, sz)
            tx = _T0_OWN if c == 0 else _T0_CROSS
            ty = _T0_OWN if c == 1 else _T0_CROSS
            tz = _T0_OWN if c == 2 else _T0_CROSS
            wx = _tapw(bx - cxi, wx1, tx)
            wy = _tapw(by - cyi, wy1, ty)
            wz = _tapw(bz - k, wz1, tz)
            vc = pvel[c]
            for iz, dz in enumerate(tz):
                zt = k + dz
                zok = (zt >= 0) & (zt < sz)
                zt_c = jnp.clip(zt, 0, sz - 1)
                for iy, dy in enumerate(ty):
                    # per-destination-row partials reduced over buckets
                    acc_rows = jnp.zeros((yb, sx), jnp.float32)
                    w_rows = jnp.zeros((yb, sx), jnp.float32)
                    wzy = wz[iz] * wy[iy] * af
                    for ix, dx in enumerate(tx):
                        w = wzy * wx[ix]
                        # shift the x contribution by dx into the
                        # destination frame (pad-free static slices)
                        w_rows = w_rows + _shift2(jnp.sum(w, axis=0), 0, dx)
                        acc_rows = acc_rows + _shift2(
                            jnp.sum(w * vc, axis=0), 0, dx)
                    # y destination window [y0+dy, y0+dy+yb) clamped into
                    # the grid; the clamp only engages at the edge tiles,
                    # where the shifted-out source row is the empty
                    # boundary ring (zero contribution)
                    if dy < 0:
                        sh = _shift2(acc_rows, -1, 0)
                        shw = _shift2(w_rows, -1, 0)
                        acc_rows = jnp.where(j == 0, sh, acc_rows)
                        w_rows = jnp.where(j == 0, shw, w_rows)
                        yt = jnp.maximum(y0 + dy, 0)
                    elif dy > 0:
                        sh = _shift2(acc_rows, 1, 0)
                        shw = _shift2(w_rows, 1, 0)
                        acc_rows = jnp.where(j == jmax, sh, acc_rows)
                        w_rows = jnp.where(j == jmax, shw, w_rows)
                        yt = jnp.minimum(y0 + dy, sy - yb)
                    else:
                        yt = y0

                    @pl.when(zok)
                    def _add(c=c, zt_c=zt_c, yt=yt, acc_rows=acc_rows,
                             w_rows=w_rows):
                        cur = acc_ref[c, zt_c, pl.ds(yt, yb)]
                        acc_ref[c, zt_c, pl.ds(yt, yb)] = cur + acc_rows
                        curw = wacc_ref[c, zt_c, pl.ds(yt, yb)]
                        wacc_ref[c, zt_c, pl.ds(yt, yb)] = curw + w_rows


def _shift2(a, dy: int, dx: int, fill=0.0):
    """Shift a (sy, sx) slab by (+dy, +dx), filling vacated rows/cols with
    `fill` (0 for sums, _BIG for mins): destination-frame placement of a
    source contribution without wraparound."""
    sy, sx = a.shape
    out = a
    if dx:
        f = jnp.full_like(out, fill)
        if dx > 0:
            out = jnp.concatenate([f[:, :dx], out[:, :sx - dx]], axis=1)
        else:
            out = jnp.concatenate([out[:, -dx:], f[:, :(-dx)]], axis=1)
    if dy:
        f = jnp.full_like(out, fill)
        if dy > 0:
            out = jnp.concatenate([f[:dy], out[:sy - dy]], axis=0)
        else:
            out = jnp.concatenate([out[-dy:], f[:(-dy)]], axis=0)
    return out


def p2g_mac_pallas(bk, dom: Domain, interpret: bool = False):
    """Drop-in for flip_bucket.p2g_mac (returns (vel, stomped weight))."""
    sz, sy, sx = dom.shape
    P = bk.ppc

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    from .flip_bucket_pallas import tile_occupancy
    yb = 8 if sy % 8 == 0 else sy
    occ = tile_occupancy(bk.valid, dom, yb)
    slab = pl.BlockSpec((P, 1, yb, sx), lambda k, j: (0, k, j, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((3, sz, sy, sx), lambda k, j: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_p2g_kernel, shape=dom.shape, ppc=P, yb=yb)
    acc, wacc = pl.pallas_call(
        kern,
        grid=(sz, sy // yb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [slab] * 7,
        out_specs=(full, full),
        out_shape=(jax.ShapeDtypeStruct((3, sz, sy, sx), jnp.float32),
                   jax.ShapeDtypeStruct((3, sz, sy, sx), jnp.float32)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(occ, resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx), resh(bk.vy),
      resh(bk.vz), resh(bk.valid.astype(jnp.float32)))
    weight_st = jnp.where(wacc < 1e-6, 0.0, wacc)
    vel = jnp.where(weight_st > 0, acc / jnp.maximum(weight_st, 1e-30), 0.0)
    return vel, weight_st


# ---------------------------------------------------------------------------
# union particle levelset


def _ls_kernel(occ_ref, px_ref, py_ref, pz_ref, val_ref, d2_ref, *, shape,
               ppc, rw, yb):
    sz, sy, sx = shape
    k = pl.program_id(0)
    j = pl.program_id(1)
    y0 = j * yb
    jmax = sy // yb - 1
    P = ppc

    @pl.when((k == 0) & (j == 0))
    def _init():
        d2_ref[...] = jnp.full_like(d2_ref, _BIG)

    @pl.when(occ_ref[k, j] > 0)
    def _compute():
        cxi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 2)
        cyi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 1) + y0
        valid = val_ref[:, 0] > 0.5
        ex = jnp.where(valid,
                       px_ref[:, 0] - (cxi.astype(jnp.float32) + 0.5), 0.0)
        ey = jnp.where(valid,
                       py_ref[:, 0] - (cyi.astype(jnp.float32) + 0.5), 0.0)
        ez = jnp.where(valid, pz_ref[:, 0] - (k + 0.5), 0.0)
        r2 = ex * ex + ey * ey + ez * ez
        big = jnp.float32(_BIG)

        taps = range(-rw, rw + 1)
        for dz in taps:
            zt = k + dz
            zok = (zt >= 0) & (zt < sz)
            zt_c = jnp.clip(zt, 0, sz - 1)
            for dy in taps:
                rows = None
                for dx in taps:
                    c2 = float(dx * dx + dy * dy + dz * dz)
                    d2 = r2 - 2.0 * (ex * dx + ey * dy + ez * dz) + c2
                    part = jnp.min(jnp.where(valid, d2, big), axis=0)
                    sh = _shift2(part, 0, dx, fill=big)
                    rows = sh if rows is None else jnp.minimum(rows, sh)
                # y destination window (see _p2g_kernel): edge tiles shift
                # the off-grid rows out, filled with BIG (no contribution)
                if dy < 0:
                    sh = _shift2(rows, dy, 0, fill=big)
                    rows = jnp.where(j == 0, sh, rows)
                    yt = jnp.maximum(y0 + dy, 0)
                elif dy > 0:
                    sh = _shift2(rows, dy, 0, fill=big)
                    rows = jnp.where(j == jmax, sh, rows)
                    yt = jnp.minimum(y0 + dy, sy - yb)
                else:
                    yt = y0

                @pl.when(zok)
                def _minin(zt_c=zt_c, yt=yt, rows=rows):
                    cur = d2_ref[zt_c, pl.ds(yt, yb)]
                    d2_ref[zt_c, pl.ds(yt, yb)] = jnp.minimum(cur, rows)


def union_levelset_pallas(bk, dom: Domain, radius_factor: float = 1.0,
                          interpret: bool = False):
    """Drop-in for flip_bucket.union_levelset_bucketed."""
    from ..core.masks import interior_mask
    sz, sy, sx = dom.shape
    P = bk.ppc
    radius = 0.5 * ((math.sqrt(3.0) if dom.is3d else math.sqrt(2.0))
                    * (radius_factor + 0.01))
    rw = int(radius) + 1  # window covers the particle radius (flat-path r)

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    from .flip_bucket_pallas import tile_occupancy
    yb = 8 if sy % 8 == 0 else sy
    occ = tile_occupancy(bk.valid, dom, yb)
    slab = pl.BlockSpec((P, 1, yb, sx), lambda k, j: (0, k, j, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((sz, sy, sx), lambda k, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_ls_kernel, shape=dom.shape, ppc=P, rw=rw,
                             yb=yb)
    d2min = pl.pallas_call(
        kern,
        grid=(sz, sy // yb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [slab] * 4,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((sz, sy, sx), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(occ, resh(bk.px), resh(bk.py), resh(bk.pz),
      resh(bk.valid.astype(jnp.float32)))
    phi = jnp.where(d2min >= _BIG, radius,
                    jnp.sqrt(jnp.maximum(d2min, 0.0)) - radius)
    phi = jnp.minimum(phi, radius)
    return jnp.where(interior_mask(dom, 1), phi, 0.5)


# ---------------------------------------------------------------------------
# FLIP blend (g2p at drift-0 positions)


def _blend_kernel(ratio_ref, occ_ref, velp_ref, oldp_ref, px_ref, py_ref,
                  pz_ref, vx_ref, vy_ref, vz_ref, val_ref, ox_ref, oy_ref,
                  oz_ref, *, shape, ppc, yb):
    sz, sy, sx = shape
    k = pl.program_id(0)
    j = pl.program_id(1)
    y0 = j * yb
    P = ppc
    ratio = ratio_ref[0]

    px = px_ref[:, 0]
    py = py_ref[:, 0]
    pz = pz_ref[:, 0]
    live = val_ref[:, 0] > 0.5
    pv = (vx_ref[:, 0], vy_ref[:, 0], vz_ref[:, 0])
    outs = (ox_ref, oy_ref, oz_ref)

    @pl.when(occ_ref[k, j] == 0)
    def _skip():  # no particles here: particle velocities pass through
        for c in range(3):
            outs[c][:, 0] = pv[c]

    @pl.when(occ_ref[k, j] > 0)
    def _compute():
        cxi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 2)
        cyi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 1) + y0
        for c in range(3):
            ox_, oy_, oz_ = _MAC_SHIFTS[c]
            bx, wx1 = _axw(px - ox_, sx)
            by, wy1 = _axw(py - oy_, sy)
            bz, wz1 = _axw(pz - oz_, sz)
            tx = _T0_OWN if c == 0 else _T0_CROSS
            ty = _T0_OWN if c == 1 else _T0_CROSS
            tz = _T0_OWN if c == 2 else _T0_CROSS
            wx = _tapw(bx - cxi, wx1, tx)
            wy = _tapw(by - cyi, wy1, ty)
            wz = _tapw(bz - k, wz1, tz)
            new_acc = jnp.zeros((P, yb, sx), jnp.float32)
            old_acc = jnp.zeros((P, yb, sx), jnp.float32)
            for iz, dz in enumerate(tz):
                for iy, dy in enumerate(ty):
                    wzy = wz[iz] * wy[iy]
                    for ix, dx in enumerate(tx):
                        w = wzy * wx[ix]
                        gn = velp_ref[c, k + _PAD + dz,
                                      pl.ds(y0 + _PAD + dy, yb),
                                      _PAD + dx:_PAD + dx + sx]
                        go = oldp_ref[c, k + _PAD + dz,
                                      pl.ds(y0 + _PAD + dy, yb),
                                      _PAD + dx:_PAD + dx + sx]
                        new_acc = new_acc + w * gn[None]
                        old_acc = old_acc + w * go[None]
            blended = (ratio * (pv[c] + (new_acc - old_acc))
                       + (1.0 - ratio) * new_acc)
            outs[c][:, 0] = jnp.where(live, blended, pv[c])


def flip_update_pallas(bk, vel, vel_old, flip_ratio: float, dom: Domain,
                       interpret: bool = False):
    """Drop-in for flip_bucket.flip_update_bucketed."""
    sz, sy, sx = dom.shape
    P = bk.ppc
    pad = [(0, 0), (_PAD, _PAD), (_PAD, _PAD), (_PAD, _PAD)]
    velp = jnp.pad(vel, pad)
    oldp = jnp.pad(vel_old, pad)
    ratio = jnp.full((1,), flip_ratio, jnp.float32)

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    from .flip_bucket_pallas import tile_occupancy
    yb = 8 if sy % 8 == 0 else sy
    occ = tile_occupancy(bk.valid, dom, yb)
    slab = pl.BlockSpec((P, 1, yb, sx), lambda k, j: (0, k, j, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_blend_kernel, shape=dom.shape, ppc=P, yb=yb)
    call = pl.pallas_call(
        kern,
        grid=(sz, sy // yb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ratio
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile occupancy
            pl.BlockSpec(memory_space=pltpu.VMEM),   # velp (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # oldp (full)
            slab, slab, slab, slab, slab, slab, slab,
        ],
        out_specs=(slab, slab, slab),
        out_shape=tuple(jax.ShapeDtypeStruct((P, sz, sy, sx), jnp.float32)
                        for _ in range(3)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    nvx, nvy, nvz = call(ratio, occ, velp, oldp, resh(bk.px), resh(bk.py),
                         resh(bk.pz), resh(bk.vx), resh(bk.vy), resh(bk.vz),
                         resh(bk.valid.astype(jnp.float32)))
    T = bk.ncells
    return dataclasses.replace(bk, vx=nvx.reshape(P, T),
                               vy=nvy.reshape(P, T), vz=nvz.reshape(P, T))