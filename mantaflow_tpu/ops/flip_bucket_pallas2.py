"""Pallas TPU kernels for the bucketed FLIP transfers (p2g, union levelset,
FLIP blend).

The XLA forms in ops/flip_bucket.py materialize a (PPC, T) intermediate per
window tap in HBM (p2g: 54 taps, levelset: 27 offsets) — memory-bound.

Round-4 redesign, resolution-independent (the round-3 kernels kept the full
(3,Z,Y,X) accumulator grids VMEM-resident, capping them at ~96^3):

- p2g / union levelset are SOURCE-centric STREAMING scatters: grid step t
  processes the source bucket plane t and accumulates its tap contributions
  (z in [t-rw, t+rw]) into a ring buffer of 2*rw+1 VMEM plane accumulators;
  plane t-rw is complete at step t and emitted through a revisit-free
  output BlockSpec. Ring slots are recycled: the slot for plane t+rw is
  zeroed at the top of step t (it held plane t-rw-1, emitted at t-1);
  contributions to out-of-domain planes land in slots that are re-zeroed
  before their next legitimate use and are never emitted.
- the FLIP blend stays GATHER-style but reads the two MAC grids through
  overlapping z-plane BlockSpecs (dz = -1..1) with static in-plane slices,
  like the advection kernel (see flip_bucket_pallas module docstring).
  The production step fuses the blend into advection instead
  (advect_blend_pallas); this standalone kernel serves finalize_buckets
  and the per-op tests.

Semantics are identical to flip_bucket.p2g_mac / union_levelset_bucketed /
flip_update_bucketed (mapPartsToMAC flip.cpp:637-662, unionParticleLevelset
flip.cpp:300-363, flipVelocityUpdate flip.cpp:727-744); only float
accumulation order differs.
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
from .flip_bucket_pallas import (_PAD, _PCHUNK, _pick_yb, tile_max_count,
                                 tile_occupancy)


def _place(rows, y0, dy, sy):
    """Destination (dst_lo, src_lo, n) for scattering a (yb, sx) source
    block at rows [y0, y0+yb) shifted by dy, clipped to [0, sy)."""
    yb = rows
    dst_lo = max(0, y0 + dy)
    src_lo = max(0, -(y0 + dy))
    n = yb - src_lo - max(0, y0 + dy + yb - sy)
    return dst_lo, src_lo, n


def _shiftx(a, dx: int, fill=0.0):
    """Shift (..., sx) by +dx along x, filling vacated lanes."""
    if dx == 0:
        return a
    sx = a.shape[-1]
    f = jnp.full_like(a, fill)
    if dx > 0:
        return jnp.concatenate([f[..., :dx], a[..., :sx - dx]], axis=-1)
    return jnp.concatenate([a[..., -dx:], f[..., :(-dx)]], axis=-1)


# ---------------------------------------------------------------------------
# p2g: mapPartsToMAC accumulation (streaming scatter over z)


def _p2g_kernel(occ_ref, px_ref, py_ref, pz_ref, vx_ref, vy_ref, vz_ref,
                val_ref, oacc_ref, owacc_ref, acc_ref, wacc_ref, *,
                shape, ppc, yb):
    """Scratch slots have FIXED roles — row (s*3+c) of the (9, sy, sx)
    scratch is plane t-1+s, component c — and the ring advances by a
    static end-of-step rotation (slot0 <- slot1 <- slot2 <- 0). Keeping
    every scratch index STATIC matters: Mosaic lowers a dynamic slot index
    combined with a partial row slice through a gather path it cannot
    compile (observed at all grid sizes)."""
    sz, sy, sx = shape
    P = ppc
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init_all():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        wacc_ref[...] = jnp.zeros_like(wacc_ref)

    for j in range(sy // yb):
        y0 = j * yb

        @pl.when(occ_ref[t, j] > 0)   # padded row sz is 0: no work at t==sz
        def _accum(y0=y0):
            px = px_ref[:, 0, y0:y0 + yb, :]
            py = py_ref[:, 0, y0:y0 + yb, :]
            pz = pz_ref[:, 0, y0:y0 + yb, :]
            af = val_ref[:, 0, y0:y0 + yb, :]
            pvel = (vx_ref[:, 0, y0:y0 + yb, :],
                    vy_ref[:, 0, y0:y0 + yb, :],
                    vz_ref[:, 0, y0:y0 + yb, :])
            cxi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 2)
            cyi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 1) + y0
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
                wz = _tapw(bz - t, wz1, tz)
                vc = pvel[c]
                for iz, dz in enumerate(tz):
                    sl = dz + 1          # slot role: plane t+dz (STATIC)
                    for iy, dy in enumerate(ty):
                        w_rows = jnp.zeros((yb, sx), jnp.float32)
                        a_rows = jnp.zeros((yb, sx), jnp.float32)
                        wzy = wz[iz] * wy[iy] * af
                        for ix, dx in enumerate(tx):
                            w = wzy * wx[ix]
                            w_rows = w_rows + _shiftx(jnp.sum(w, axis=0), dx)
                            a_rows = a_rows + _shiftx(
                                jnp.sum(w * vc, axis=0), dx)
                        dst, src, n = _place(yb, y0, dy, sy)
                        if n <= 0:
                            continue
                        r = sl * 3 + c
                        cur = acc_ref[r, dst:dst + n]
                        acc_ref[r, dst:dst + n] = \
                            cur + a_rows[src:src + n]
                        curw = wacc_ref[r, dst:dst + n]
                        wacc_ref[r, dst:dst + n] = \
                            curw + w_rows[src:src + n]

    @pl.when(t >= 1)
    def _emit():  # plane t-1 (slot 0) is complete
        oacc_ref[...] = acc_ref[0:3][:, None]
        owacc_ref[...] = wacc_ref[0:3][:, None]

    # rotate the ring: slot s takes slot s+1's plane; the incoming far
    # slot starts empty
    for r in range(6):
        acc_ref[r] = acc_ref[r + 3]
        wacc_ref[r] = wacc_ref[r + 3]
    z = jnp.zeros((sy, sx), jnp.float32)
    for r in range(6, 9):
        acc_ref[r] = z
        wacc_ref[r] = z


def p2g_mac_pallas(bk, dom: Domain, interpret: bool = False):
    """Drop-in for flip_bucket.p2g_mac (returns (vel, stomped weight))."""
    sz, sy, sx = dom.shape
    P = bk.ppc

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    yb = _pick_yb(sy)
    occ = jnp.pad(tile_occupancy(bk.valid, dom, yb), ((0, 1), (0, 0)))
    slab = pl.BlockSpec((P, 1, sy, sx),
                        lambda t: (0, jnp.minimum(t, sz - 1), 0, 0),
                        memory_space=pltpu.VMEM)
    outp = pl.BlockSpec((3, 1, sy, sx),
                        lambda t: (0, jnp.maximum(t - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_p2g_kernel, shape=dom.shape, ppc=P, yb=yb)
    acc, wacc = pl.pallas_call(
        kern,
        grid=(sz + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [slab] * 7,
        out_specs=(outp, outp),
        out_shape=(jax.ShapeDtypeStruct((3, sz, sy, sx), jnp.float32),
                   jax.ShapeDtypeStruct((3, sz, sy, sx), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((9, sy, sx), jnp.float32),
                        pltpu.VMEM((9, sy, sx), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(occ, resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
      resh(bk.vy), resh(bk.vz), resh(bk.valid.astype(jnp.float32)))
    weight_st = jnp.where(wacc < 1e-6, 0.0, wacc)
    vel = jnp.where(weight_st > 0, acc / jnp.maximum(weight_st, 1e-30), 0.0)
    return vel, weight_st


# ---------------------------------------------------------------------------
# union particle levelset (streaming min-scatter over z)


def _ls_kernel(occ_ref, px_ref, py_ref, pz_ref, val_ref, od2_ref, d2_ref, *,
               shape, ppc, rw, yb):
    sz, sy, sx = shape
    P = ppc
    n = 2 * rw + 1
    t = pl.program_id(0)
    big = jnp.float32(_BIG)

    # fixed slot roles (see _p2g_kernel): scratch row s = plane t-rw+s;
    # end-of-step rotation keeps every scratch index STATIC
    @pl.when(t == 0)
    def _init_all():
        d2_ref[...] = jnp.full_like(d2_ref, _BIG)

    for j in range(sy // yb):
        y0 = j * yb

        @pl.when(occ_ref[t, j] > 0)  # padded rows >= sz are 0: no tail work
        def _accum(y0=y0):
            valid = val_ref[:, 0, y0:y0 + yb, :] > 0.5
            cxi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 2)
            cyi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 1) + y0
            ex = jnp.where(valid, px_ref[:, 0, y0:y0 + yb, :]
                           - (cxi.astype(jnp.float32) + 0.5), 0.0)
            ey = jnp.where(valid, py_ref[:, 0, y0:y0 + yb, :]
                           - (cyi.astype(jnp.float32) + 0.5), 0.0)
            ez = jnp.where(valid, pz_ref[:, 0, y0:y0 + yb, :]
                           - (t + 0.5), 0.0)
            r2 = ex * ex + ey * ey + ez * ez
            taps = range(-rw, rw + 1)
            for dz in taps:
                sl = dz + rw             # slot role: plane t+dz (STATIC)
                for dy in taps:
                    rows = None
                    for dx in taps:
                        c2 = float(dx * dx + dy * dy + dz * dz)
                        d2 = r2 - 2.0 * (ex * dx + ey * dy + ez * dz) + c2
                        part = jnp.min(jnp.where(valid, d2, big), axis=0)
                        sh = _shiftx(part, dx, fill=big)
                        rows = sh if rows is None else jnp.minimum(rows, sh)
                    dst, src, cnt = _place(yb, y0, dy, sy)
                    if cnt <= 0:
                        continue
                    cur = d2_ref[sl, dst:dst + cnt]
                    d2_ref[sl, dst:dst + cnt] = jnp.minimum(
                        cur, rows[src:src + cnt])

    @pl.when(t >= rw)
    def _emit():  # plane t-rw (slot 0) is complete
        od2_ref[0] = d2_ref[0]

    for s in range(n - 1):   # rotate: slot s <- slot s+1, far slot resets
        d2_ref[s] = d2_ref[s + 1]
    d2_ref[n - 1] = jnp.full((sy, sx), _BIG, jnp.float32)


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

    yb = _pick_yb(sy)
    occ = jnp.pad(tile_occupancy(bk.valid, dom, yb), ((0, rw), (0, 0)))
    slab = pl.BlockSpec((P, 1, sy, sx),
                        lambda t: (0, jnp.minimum(t, sz - 1), 0, 0),
                        memory_space=pltpu.VMEM)
    outp = pl.BlockSpec((1, sy, sx),
                        lambda t: (jnp.maximum(t - rw, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_ls_kernel, shape=dom.shape, ppc=P, rw=rw,
                             yb=yb)
    d2min = pl.pallas_call(
        kern,
        grid=(sz + rw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [slab] * 4,
        out_specs=outp,
        out_shape=jax.ShapeDtypeStruct((sz, sy, sx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * rw + 1, sy, sx), jnp.float32)],
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
# FLIP blend (g2p at drift-0 positions) — standalone form; the production
# step uses the fused advect_blend_pallas instead


def _blend_kernel(ratio_ref, occ_ref, *refs, shape, ppc, yb):
    sz, sy, sx = shape
    P = ppc
    k = pl.program_id(0)
    velz = refs[:3]          # vel z-planes dz=-1..1
    oldz = refs[3:6]         # vel_old z-planes
    slabs = refs[6:13]       # px py pz vx vy vz valid
    outs = refs[13:]
    ratio = ratio_ref[0]

    for j in range(sy // yb):
        y0 = j * yb
        pv = tuple(slabs[3 + c][:, 0, y0:y0 + yb, :] for c in range(3))

        @pl.when(occ_ref[k, j] == 0)
        def _skip(pv=pv, y0=y0):
            for c in range(3):
                outs[c][:, 0, y0:y0 + yb, :] = pv[c]

        @pl.when(occ_ref[k, j] > 0)
        def _compute(pv=pv, y0=y0):
            px = slabs[0][:, 0, y0:y0 + yb, :]
            py = slabs[1][:, 0, y0:y0 + yb, :]
            pz = slabs[2][:, 0, y0:y0 + yb, :]
            live = slabs[6][:, 0, y0:y0 + yb, :] > 0.5
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
                            sl_y = slice(y0 + _PAD + dy,
                                         y0 + _PAD + dy + yb)
                            sl_x = slice(_PAD + dx, _PAD + dx + sx)
                            gn = velz[dz + 1][c, 0, sl_y, sl_x]
                            go = oldz[dz + 1][c, 0, sl_y, sl_x]
                            new_acc = new_acc + w * gn[None]
                            old_acc = old_acc + w * go[None]
                blended = (ratio * (pv[c] + (new_acc - old_acc))
                           + (1.0 - ratio) * new_acc)
                outs[c][:, 0, y0:y0 + yb, :] = jnp.where(live, blended,
                                                         pv[c])


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

    def zplane(dz):
        return pl.BlockSpec((3, 1, sy + 2 * _PAD, sx + 2 * _PAD),
                            lambda k, dz=dz: (0, k + _PAD + dz, 0, 0),
                            memory_space=pltpu.VMEM)

    yb = _pick_yb(sy)
    occ = tile_occupancy(bk.valid, dom, yb)
    slab = pl.BlockSpec((P, 1, sy, sx), lambda k: (0, k, 0, 0),
                        memory_space=pltpu.VMEM)
    kern = functools.partial(_blend_kernel, shape=dom.shape, ppc=P, yb=yb)
    ins = ([ratio, occ] + [velp] * 3 + [oldp] * 3
           + [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
              resh(bk.vy), resh(bk.vz), resh(bk.valid.astype(jnp.float32))])
    specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
             + [zplane(dz) for dz in (-1, 0, 1)] * 2
             + [slab] * 7)
    nvx, nvy, nvz = pl.pallas_call(
        kern,
        grid=(sz,),
        in_specs=specs,
        out_specs=(slab, slab, slab),
        out_shape=tuple(jax.ShapeDtypeStruct((P, sz, sy, sx), jnp.float32)
                        for _ in range(3)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    T = bk.ncells
    return dataclasses.replace(bk, vx=nvx.reshape(P, T),
                               vy=nvy.reshape(P, T), vz=nvz.reshape(P, T))


# ---------------------------------------------------------------------------
# fused p2g + union levelset: both are source-centric streaming scatters
# over the same +-1-plane window, so one kernel shares the slab DMA,
# position loads and iotas (the levelset only adds its min-scatter taps)


def _p2g_ls_kernel(sc_ref, occ_ref, px_ref, py_ref, pz_ref, vx_ref, vy_ref,
                   vz_ref, val_ref, oacc_ref, owacc_ref, od2_ref, acc_ref,
                   wacc_ref, d2_ref, *, shape, ppc, yb, sz_global=None):
    """sc_ref (SMEM, (1,) int32): global z index of local plane 0 — the
    sharded wrapper passes its slab offset (zb-1 for the halo-extended
    array); particle coordinates are always global, the emission ring is
    always local. Unsharded: zeros and sz_global == sz."""
    sz, sy, sx = shape
    if sz_global is None:
        sz_global = sz
    P = ppc
    t = pl.program_id(0)
    tg = t + sc_ref[0]                    # global source plane
    big = jnp.float32(_BIG)

    @pl.when(t == 0)
    def _init_all():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        wacc_ref[...] = jnp.zeros_like(wacc_ref)
        d2_ref[...] = jnp.full_like(d2_ref, _BIG)

    chunks = [(r0, min(r0 + _PCHUNK, P)) for r0 in range(0, P, _PCHUNK)]
    for j in range(sy // yb):
        y0 = j * yb

        # occ_ref carries the tile MAX per-cell occupancy (tile_max_count,
        # gap-free buckets): slot chunk [r0, r1) is empty when occ <= r0.
        # Padded row sz is 0: no work at t==sz.
        for r0, r1 in chunks:
            @pl.when(occ_ref[t, j] > r0)
            def _accum(y0=y0, r0=r0, r1=r1):
                PC = r1 - r0
                px = px_ref[r0:r1, 0, y0:y0 + yb, :]
                py = py_ref[r0:r1, 0, y0:y0 + yb, :]
                pz = pz_ref[r0:r1, 0, y0:y0 + yb, :]
                af = val_ref[r0:r1, 0, y0:y0 + yb, :]
                valid = af > 0.5
                pvel = (vx_ref[r0:r1, 0, y0:y0 + yb, :],
                        vy_ref[r0:r1, 0, y0:y0 + yb, :],
                        vz_ref[r0:r1, 0, y0:y0 + yb, :])
                cxi = jax.lax.broadcasted_iota(jnp.int32, (PC, yb, sx), 2)
                cyi = jax.lax.broadcasted_iota(jnp.int32, (PC, yb, sx),
                                               1) + y0

                # --- p2g (mapPartsToMAC) ---
                for c in range(3):
                    ox, oy, oz = _MAC_SHIFTS[c]
                    bx, wx1 = _axw(px - ox, sx)
                    by, wy1 = _axw(py - oy, sy)
                    bz, wz1 = _axw(pz - oz, sz_global)
                    tx = _T0_OWN if c == 0 else _T0_CROSS
                    ty = _T0_OWN if c == 1 else _T0_CROSS
                    tz = _T0_OWN if c == 2 else _T0_CROSS
                    wx = _tapw(bx - cxi, wx1, tx)
                    wy = _tapw(by - cyi, wy1, ty)
                    wz = _tapw(bz - tg, wz1, tz)
                    vc = pvel[c]
                    for iz, dz in enumerate(tz):
                        sl = dz + 1
                        for iy, dy in enumerate(ty):
                            w_rows = jnp.zeros((yb, sx), jnp.float32)
                            a_rows = jnp.zeros((yb, sx), jnp.float32)
                            wzy = wz[iz] * wy[iy] * af
                            for ix, dx in enumerate(tx):
                                w = wzy * wx[ix]
                                w_rows = w_rows + _shiftx(jnp.sum(w, axis=0), dx)
                                a_rows = a_rows + _shiftx(
                                    jnp.sum(w * vc, axis=0), dx)
                            dst, src, n = _place(yb, y0, dy, sy)
                            if n <= 0:
                                continue
                            r = sl * 3 + c
                            acc_ref[r, dst:dst + n] = \
                                acc_ref[r, dst:dst + n] + a_rows[src:src + n]
                            wacc_ref[r, dst:dst + n] = \
                                wacc_ref[r, dst:dst + n] + w_rows[src:src + n]

                # --- union levelset (rw == 1) ---
                ex = jnp.where(valid, px - (cxi.astype(jnp.float32) + 0.5), 0.0)
                ey = jnp.where(valid, py - (cyi.astype(jnp.float32) + 0.5), 0.0)
                ez = jnp.where(valid, pz - (tg + 0.5), 0.0)
                r2 = ex * ex + ey * ey + ez * ez
                for dz in (-1, 0, 1):
                    sl = dz + 1
                    for dy in (-1, 0, 1):
                        rows = None
                        for dx in (-1, 0, 1):
                            c2 = float(dx * dx + dy * dy + dz * dz)
                            d2 = r2 - 2.0 * (ex * dx + ey * dy + ez * dz) + c2
                            part = jnp.min(jnp.where(valid, d2, big), axis=0)
                            sh = _shiftx(part, dx, fill=big)
                            rows = sh if rows is None else jnp.minimum(rows, sh)
                        dst, src, cnt = _place(yb, y0, dy, sy)
                        if cnt <= 0:
                            continue
                        d2_ref[sl, dst:dst + cnt] = jnp.minimum(
                            d2_ref[sl, dst:dst + cnt], rows[src:src + cnt])

    @pl.when(t >= 1)
    def _emit():  # plane t-1 (slot 0) is complete for all three outputs
        oacc_ref[...] = acc_ref[0:3][:, None]
        owacc_ref[...] = wacc_ref[0:3][:, None]
        od2_ref[0] = d2_ref[0]

    for r in range(6):
        acc_ref[r] = acc_ref[r + 3]
        wacc_ref[r] = wacc_ref[r + 3]
    z = jnp.zeros((sy, sx), jnp.float32)
    for r in range(6, 9):
        acc_ref[r] = z
        wacc_ref[r] = z
    for s in range(2):
        d2_ref[s] = d2_ref[s + 1]
    d2_ref[2] = jnp.full((sy, sx), _BIG, jnp.float32)


def p2g_union_pallas(bk, dom: Domain, radius_factor: float = 1.0,
                     interpret: bool = False):
    """Fused p2g_mac + union_levelset (rw==1 radii only): returns
    (vel, stomped weight, phi) in one pass over the source slabs."""
    from ..core.masks import interior_mask
    sz, sy, sx = dom.shape
    P = bk.ppc
    radius = 0.5 * ((math.sqrt(3.0) if dom.is3d else math.sqrt(2.0))
                    * (radius_factor + 0.01))
    if int(radius) + 1 != 1:
        raise ValueError("p2g_union_pallas supports rw == 1 radii only")

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    yb = _pick_yb(sy)
    occ = jnp.pad(tile_max_count(bk.valid, dom, yb), ((0, 1), (0, 0)))
    slab = pl.BlockSpec((P, 1, sy, sx),
                        lambda t: (0, jnp.minimum(t, sz - 1), 0, 0),
                        memory_space=pltpu.VMEM)
    outp = pl.BlockSpec((3, 1, sy, sx),
                        lambda t: (0, jnp.maximum(t - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    outp1 = pl.BlockSpec((1, sy, sx),
                         lambda t: (jnp.maximum(t - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_p2g_ls_kernel, shape=dom.shape, ppc=P, yb=yb)
    acc, wacc, d2min = pl.pallas_call(
        kern,
        grid=(sz + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2 + [slab] * 7,
        out_specs=(outp, outp, outp1),
        out_shape=(jax.ShapeDtypeStruct((3, sz, sy, sx), jnp.float32),
                   jax.ShapeDtypeStruct((3, sz, sy, sx), jnp.float32),
                   jax.ShapeDtypeStruct((sz, sy, sx), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((9, sy, sx), jnp.float32),
                        pltpu.VMEM((9, sy, sx), jnp.float32),
                        pltpu.VMEM((3, sy, sx), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.zeros((1,), jnp.int32), occ, resh(bk.px), resh(bk.py),
      resh(bk.pz), resh(bk.vx), resh(bk.vy), resh(bk.vz),
      resh(bk.valid.astype(jnp.float32)))
    weight_st = jnp.where(wacc < 1e-6, 0.0, wacc)
    vel = jnp.where(weight_st > 0, acc / jnp.maximum(weight_st, 1e-30), 0.0)
    phi = jnp.where(d2min >= _BIG, radius,
                    jnp.sqrt(jnp.maximum(d2min, 0.0)) - radius)
    phi = jnp.minimum(phi, radius)
    phi = jnp.where(interior_mask(dom, 1), phi, 0.5)
    return vel, weight_st, phi


def p2g_union_zshard_spmd(bk, dom: Domain, radius_factor: float,
                          mesh, axis_name: str = "z"):
    """Fused p2g + union levelset under z-slab sharding: each shard
    exchanges +-1-plane halos of all seven bucket fields over ICI
    (lax.ppermute), runs the local streaming scatter with its global z
    offset, and keeps its own output planes. Returns global
    (vel, stomped weight, phi) sharded like the inputs. Matches
    p2g_union_pallas semantics exactly (the halo planes supply the
    cross-slab tap contributions)."""
    import math as _math

    from jax.sharding import PartitionSpec as P

    from .flip_bucket_pallas import _halo_z

    sz, sy, sx = dom.shape
    n = int(mesh.shape[axis_name])
    if sz % n != 0:
        raise ValueError(f"z extent {sz} not divisible by mesh axis {n}")
    lz = sz // n
    if lz < 2:
        raise ValueError("z slab of 1 plane unsupported")
    Pp = bk.ppc
    radius = 0.5 * ((_math.sqrt(3.0) if dom.is3d else _math.sqrt(2.0))
                    * (radius_factor + 0.01))
    if int(radius) + 1 != 1:
        raise ValueError("p2g_union supports rw == 1 radii only")
    interpret = jax.default_backend() != "tpu"
    lze = lz + 2

    def body(px, py, pz, vx, vy, vz, validf):
        zb = jax.lax.axis_index(axis_name) * lz

        def resh(a):
            return a.reshape(Pp, lz, sy, sx)

        ext = [_halo_z(resh(a), 1, axis_name, n, 1)
               for a in (px, py, pz, vx, vy, vz, validf)]
        ext_dom = Domain(size=(sx, sy, lze), dim=3)
        yb = _pick_yb(sy)
        occ = jnp.pad(tile_max_count(
            (ext[6] > 0.5).reshape(Pp, lze * sy * sx), ext_dom, yb),
            ((0, 1), (0, 0)))
        slab = pl.BlockSpec((Pp, 1, sy, sx),
                            lambda t: (0, jnp.minimum(t, lze - 1), 0, 0),
                            memory_space=pltpu.VMEM)
        outp = pl.BlockSpec((3, 1, sy, sx),
                            lambda t: (0, jnp.maximum(t - 1, 0), 0, 0),
                            memory_space=pltpu.VMEM)
        outp1 = pl.BlockSpec((1, sy, sx),
                             lambda t: (jnp.maximum(t - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_p2g_ls_kernel, shape=(lze, sy, sx),
                                 ppc=Pp, yb=yb, sz_global=sz)
        sc = (jnp.asarray(zb, jnp.int32) - 1).reshape(1)
        acc, wacc, d2min = pl.pallas_call(
            kern,
            grid=(lze + 1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                     + [slab] * 7,
            out_specs=(outp, outp, outp1),
            out_shape=(jax.ShapeDtypeStruct((3, lze, sy, sx), jnp.float32),
                       jax.ShapeDtypeStruct((3, lze, sy, sx), jnp.float32),
                       jax.ShapeDtypeStruct((lze, sy, sx), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((9, sy, sx), jnp.float32),
                            pltpu.VMEM((9, sy, sx), jnp.float32),
                            pltpu.VMEM((3, sy, sx), jnp.float32)],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sc, occ, *ext)
        acc = acc[:, 1:lz + 1]
        wacc = wacc[:, 1:lz + 1]
        d2min = d2min[1:lz + 1]
        weight_st = jnp.where(wacc < 1e-6, 0.0, wacc)
        vel = jnp.where(weight_st > 0,
                        acc / jnp.maximum(weight_st, 1e-30), 0.0)
        phi = jnp.where(d2min >= _BIG, radius,
                        jnp.sqrt(jnp.maximum(d2min, 0.0)) - radius)
        phi = jnp.minimum(phi, radius)
        # interior_mask(dom, 1) with GLOBAL z indices
        zi = jnp.arange(lz, dtype=jnp.int32) + zb
        zin = (zi >= 1) & (zi <= sz - 2)
        yi = jnp.arange(sy, dtype=jnp.int32)
        xi = jnp.arange(sx, dtype=jnp.int32)
        inner = (zin[:, None, None]
                 & ((yi >= 1) & (yi <= sy - 2))[None, :, None]
                 & ((xi >= 1) & (xi <= sx - 2))[None, None, :])
        phi = jnp.where(inner, phi, 0.5)
        return vel, weight_st, phi

    bspec = P(None, axis_name)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(bspec,) * 7,
        out_specs=(P(None, axis_name), P(None, axis_name), P(axis_name)),
        check_vma=False)
    return f(bk.px, bk.py, bk.pz, bk.vx, bk.vy, bk.vz,
             bk.valid.astype(jnp.float32))
