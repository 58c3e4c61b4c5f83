"""Pallas TPU kernel for bounded-window semi-Lagrangian interpolation.

Same semantics as ops/advection_fast.py's ``window_interp`` (the CFL-bounded
shift-select recast of the reference SemiLagrange/SemiLagrangeMAC gathers,
``plugin/advection.cpp:25-77``), but executed as one fused VMEM-resident
kernel per pass instead of ~(2k+2)^3 XLA roll/select passes over HBM:

- the grid is tiled into z-slabs; each program DMAs its slab (plus a k+1
  halo in z) from HBM into VMEM once;
- z-offsets are static slices of the slab, y/x offsets are in-register
  ``pltpu.roll``s (wrapped lanes are masked by the window-selection weights,
  which are zero whenever an offset is not the backtraced corner);
- per-axis corner weights are computed once per slab and reused across the
  (2k+2)^2 (oz,oy) loop, so the inner body is two FMAs per tap;
- the MacCormack clamp's corner min/max (doClampComponent mode 2,
  advection.cpp:242-270) falls out of the same loop for free.

The kernel expects 3D grids; 2D domains stay on ops/advection_fast.py (they
are small enough that the XLA path is fine). On non-TPU backends the kernel
runs in interpreter mode so tests exercise identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.domain import Domain

_BIG = 3.4e38


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _lane_mult(interpret: bool) -> int:
    """Mosaic requires HBM->VMEM DMA slice shapes lane-aligned (128 on the
    minormost axis), so grids with x not a multiple of 128 are edge-padded
    up to it (padded lanes have provably zero window weight — positions are
    range-clamped against the TRUE extent — and are sliced off the output).
    Interpret mode has no such constraint; pad to 8 there so CPU tests
    exercise the padded code path on odd widths."""
    return 8 if interpret else 128


def _pad_lanes(a, sxp: int, mode: str = "edge"):
    pad = sxp - a.shape[-1]
    if pad == 0:
        return a
    width = [(0, 0)] * (a.ndim - 1) + [(0, pad)]
    if mode == "zero":
        return jnp.pad(a, width)
    return jnp.pad(a, width, mode="edge")


def _rel_base_frac(pos, coord, n: int, k: int):
    """Window-clamped relative corner base + fraction for one axis
    (mirrors advection_fast._rel_weights; positions already -0.5 shifted
    by the caller for the cell-centered convention)."""
    rel = jnp.clip(pos - coord, -float(k), float(k))
    p_abs = jnp.clip(coord + rel, 0.0, float(n - 1))
    rel = p_abs - coord
    base = jnp.floor(rel).astype(jnp.int32)
    # cap the base so corner+1 stays in range (exact-path BUILD_INDEX
    # clamps i0 to [0, n-2]; frac saturates to 1 at the top border)
    base = jnp.minimum(base, (float(n - 2) - coord).astype(jnp.int32))
    frac = rel - base.astype(rel.dtype)
    return base, frac


def _window_kernel(*refs, k: int, bz: int, shape, want_minmax: bool,
                   with_ok: bool):
    px_ref, py_ref, pz_ref, okm_ref, src_hbm, ok_hbm = refs[:6]
    del okm_ref
    if want_minmax:
        out_ref, minv_ref, maxv_ref, have_ref = refs[6:10]
        slab, okslab, sem, oksem, wz_st, wy_st, nz_st, ny_st = refs[10:18]
    else:
        out_ref = refs[6]
        slab, okslab, sem, oksem, wz_st, wy_st = refs[7:13]
        nz_st = ny_st = None
    # `shape` is the TRUE grid extent (window-clamp semantics); the array
    # extents come from the block (x may be lane-padded, z may be sharded)
    sz, sy, sx = shape
    _, sy_a, sx_a = px_ref.shape  # array extents (sy_a == sy always here)
    halo = k + 1
    nsl = bz + 2 * halo

    z0 = pl.program_id(0) * bz
    cp = pltpu.make_async_copy(src_hbm.at[pl.ds(z0, nsl)], slab, sem)
    cp.start()
    if with_ok:
        cpo = pltpu.make_async_copy(ok_hbm.at[pl.ds(z0, nsl)], okslab, oksem)
        cpo.start()

    cx = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, sx_a), 2)
          .astype(jnp.float32))
    cy = (jax.lax.broadcasted_iota(jnp.int32, (1, sy_a, 1), 1)
          .astype(jnp.float32))
    cz = (jax.lax.broadcasted_iota(jnp.int32, (bz, 1, 1), 0)
          .astype(jnp.float32) + jnp.float32(z0))

    nx, fx = _rel_base_frac(px_ref[:] - 0.5, cx, sx, k)
    ny, fy = _rel_base_frac(py_ref[:] - 0.5, cy, sy, k)
    nz, fz = _rel_base_frac(pz_ref[:] - 0.5, cz, sz, k)

    # corner bases span [-k, k] (floor of the clamped displacement; the
    # border cap only raises the minimum), and the +1 corner of base=k needs
    # tap k+1 — so the tap window is [-k, k+1], not [-k-1, k].
    offs = list(range(-k, k + 2))
    noff = len(offs)
    # x-axis weights/sel: precomputed python-list slabs (reused noff^2
    # times; the inner x loop is static). z/y weights/penalties are also
    # precomputed — into VMEM scratch stacks indexed dynamically by the
    # rolled (oz,oy) fori_loop (a python list can't be indexed by a traced
    # value, and a full unroll of the (2k+2)^3 taps spills hundreds of MB
    # of vregs). This removes the per-iteration where-chains (~15 slab-ops)
    # from the hot loop: 2 VMEM loads + a mul/add instead.
    wxs = [jnp.where(nx == ox, 1.0 - fx, jnp.where(nx == ox - 1, fx, 0.0))
           for ox in offs]
    for i, o in enumerate(offs):
        wz_st[i] = jnp.where(nz == o, 1.0 - fz,
                             jnp.where(nz == o - 1, fz, 0.0))
        wy_st[i] = jnp.where(ny == o, 1.0 - fy,
                             jnp.where(ny == o - 1, fy, 0.0))
        if want_minmax:
            nz_st[i] = jnp.where((nz == o) | (nz == o - 1), 0.0, _BIG)
            ny_st[i] = jnp.where((ny == o) | (ny == o - 1), 0.0, _BIG)
    if want_minmax:
        # not-selected penalty per x-offset: corner selection is folded into
        # arithmetic (value + BIG excludes a tap from min; -BIG from max),
        # which is ~2x cheaper on the VPU than boolean select chains.
        nxs = [jnp.where((nx == ox) | (nx == ox - 1), 0.0, _BIG)
               for ox in offs]

    cp.wait()
    if with_ok:
        cpo.wait()

    acc0 = jnp.zeros((bz, sy_a, sx_a), jnp.float32)
    minv0 = jnp.full((bz, sy_a, sx_a), _BIG, jnp.float32)
    maxv0 = jnp.full((bz, sy_a, sx_a), -_BIG, jnp.float32)
    # have is carried as f32 (Mosaic cannot legalize scf.for i1-vector
    # carries): it tracks min-penalty, 0 <=> some corner was selected
    have0 = jnp.full((bz, sy_a, sx_a), _BIG, jnp.float32)

    def body(o, carry):
        if want_minmax:
            acc, minv, maxv, have = carry
        else:
            acc = carry
            minv = maxv = have = None
        izi = o // noff
        iyi = o % noff
        zsl = slab[pl.ds(izi + 1, bz)]  # slab index = oz + halo
        yshift = (sy_a - iyi + k) % sy_a  # (-oy) mod sy_a, non-negative
        ysl = pltpu.roll(zsl, yshift, 1)
        wzy = wz_st[izi] * wy_st[iyi]
        if want_minmax:
            not_zy = nz_st[izi] + ny_st[iyi]
            if with_ok:
                okysl = pltpu.roll(okslab[pl.ds(izi + 1, bz)], yshift, 1)
        for ix, ox in enumerate(offs):
            xsl = pltpu.roll(ysl, (-ox) % sx_a, 2)
            acc = acc + (wzy * wxs[ix]) * xsl
            if want_minmax:
                nots = not_zy + nxs[ix]
                if with_ok:
                    # non-ok corners excluded from min/max and from `have`
                    nots = nots + (1.0 - pltpu.roll(okysl, (-ox) % sx_a, 2)) \
                        * _BIG
                minv = jnp.minimum(minv, xsl + nots)
                maxv = jnp.maximum(maxv, xsl - nots)
                if with_ok:
                    # have <- any ok tap selected: track min of penalties
                    have = jnp.minimum(have, nots)
        return (acc, minv, maxv, have) if want_minmax else acc

    if want_minmax:
        acc, minv, maxv, have = jax.lax.fori_loop(
            0, noff * noff, body, (acc0, minv0, maxv0, have0))
        minv_ref[:] = minv
        maxv_ref[:] = maxv
        # without an ok mask every cell always selects its 8 corners
        have_ref[:] = jnp.where(have < _BIG * 0.5, 1.0, 0.0) \
            if with_ok else jnp.ones((bz, sy_a, sx_a), jnp.float32)
    else:
        acc = jax.lax.fori_loop(0, noff * noff, body, acc0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("k", "want_minmax", "bz",
                                             "interpret"))
def _window_pass_call(src, px, py, pz, ok_mask, k: int,
                      want_minmax: bool, bz: int, interpret: bool):
    sz, sy, sx = src.shape
    sx_true = sx
    sxp = -(-sx // _lane_mult(interpret)) * _lane_mult(interpret)
    if sxp != sx:
        # edge-pad positions so padded lanes carry in-range values; the
        # clamp below still uses sx_true, so their weights are all zero
        src = _pad_lanes(src, sxp)
        px, py, pz = (_pad_lanes(a, sxp) for a in (px, py, pz))
        if ok_mask is not None:
            ok_mask = _pad_lanes(ok_mask, sxp, mode="zero")
        sx = sxp
    halo = k + 1
    nblk = -(-sz // bz)
    zp = nblk * bz
    # pad z: halo below, halo + block remainder above
    src_p = jnp.pad(src, ((halo, halo + (zp - sz)), (0, 0), (0, 0)),
                    mode="edge")
    with_ok = ok_mask is not None
    if with_ok:
        ok_p = jnp.pad(ok_mask.astype(jnp.float32),
                       ((halo, halo + (zp - sz)), (0, 0), (0, 0)))
    else:
        ok_p = jnp.zeros((1, sy, sx), jnp.float32)  # dummy

    def padz(a):
        if zp == sz:
            return a
        return jnp.pad(a, ((0, zp - sz), (0, 0), (0, 0)))

    pxp, pyp, pzp = padz(px), padz(py), padz(pz)
    okm = padz(ok_mask.astype(jnp.float32)) if with_ok else pxp  # unused

    blk = pl.BlockSpec((bz, sy, sx), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = [jax.ShapeDtypeStruct((zp, sy, sx), jnp.float32)]
    out_specs = [blk]
    if want_minmax:
        out_shapes += [jax.ShapeDtypeStruct((zp, sy, sx), jnp.float32)] * 3
        out_specs += [blk] * 3

    nsl = bz + 2 * halo
    noff = 2 * k + 2
    scratch = [pltpu.VMEM((nsl, sy, sx), jnp.float32),
               pltpu.VMEM((nsl, sy, sx), jnp.float32)
               if with_ok else pltpu.SMEM((1,), jnp.float32),
               pltpu.SemaphoreType.DMA(()),
               pltpu.SemaphoreType.DMA(()),
               # per-axis weight stacks (z, y), filled once per block
               pltpu.VMEM((noff, bz, sy, sx), jnp.float32),
               pltpu.VMEM((noff, bz, sy, sx), jnp.float32)]
    if want_minmax:
        # per-axis not-selected penalty stacks (z, y)
        scratch += [pltpu.VMEM((noff, bz, sy, sx), jnp.float32),
                    pltpu.VMEM((noff, bz, sy, sx), jnp.float32)]

    kern = functools.partial(_window_kernel, k=k, bz=bz,
                             shape=(sz, sy, sx_true),
                             want_minmax=want_minmax, with_ok=with_ok)
    outs = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[blk, blk, blk, blk, hbm, hbm],
        out_specs=tuple(out_specs) if want_minmax else out_specs[0],
        out_shape=tuple(out_shapes) if want_minmax else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pxp, pyp, pzp, okm, src_p, ok_p)

    if not want_minmax:
        outs = (outs,)
    outs = tuple(o[:sz, :, :sx_true] for o in outs)
    if want_minmax:
        out, minv, maxv, have = outs
        return out, minv, maxv, have > 0.5
    return outs[0]


def _window_kernel_dyn(*refs, k: int, bz: int, by: int, shape,
                       want_minmax: bool, with_ok: bool):
    """Dynamic-range variant: instead of scanning all (2k+2)^2 (oz,oy)
    offset pairs, each (z,y)-tile reduces the actual integer corner-base
    range of its cells and loops only over [min,max+1] per axis — the
    velocity field is smooth, so a 8x32 tile typically needs 2x2..3x3
    pairs instead of 64. Taps outside a tile's range have provably zero
    weight (and BIG min/max penalty), so skipping them is exact. y-offsets
    are dynamic sublane slices of a 2D-haloed VMEM slab (no rolls);
    x stays the static (2k+2)-tap lane-roll loop."""
    zb_ref, px_ref, py_ref, pz_ref, okm_ref, src_hbm, ok_hbm = refs[:7]
    del okm_ref
    if want_minmax:
        out_ref, minv_ref, maxv_ref, have_ref = refs[7:11]
        slab, okslab, sem, oksem = refs[11:15]
    else:
        out_ref = refs[7]
        slab, okslab, sem, oksem = refs[8:12]
    # `shape` is the TRUE grid extent (window-clamp semantics): sz is the
    # GLOBAL z extent of a z-sharded call, sx the un-lane-padded width.
    # Array extents come from the block.
    sz, sy, sx = shape
    sx_a = px_ref.shape[-1]
    halo = k + 1

    z0 = pl.program_id(0) * bz
    y0 = pl.program_id(1) * by
    cp = pltpu.make_async_copy(
        src_hbm.at[pl.ds(z0, bz + 2 * halo), pl.ds(y0, by + 2 * halo)],
        slab, sem)
    cp.start()
    if with_ok:
        cpo = pltpu.make_async_copy(
            ok_hbm.at[pl.ds(z0, bz + 2 * halo), pl.ds(y0, by + 2 * halo)],
            okslab, oksem)
        cpo.start()

    cx = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, sx_a), 2)
          .astype(jnp.float32))
    cy = (jax.lax.broadcasted_iota(jnp.int32, (1, by, 1), 1)
          .astype(jnp.float32) + jnp.float32(y0))
    cz = (jax.lax.broadcasted_iota(jnp.int32, (bz, 1, 1), 0)
          .astype(jnp.float32) + jnp.float32(z0)
          + zb_ref[0].astype(jnp.float32))  # shard z offset (0 unsharded)

    nx, fx = _rel_base_frac(px_ref[:] - 0.5, cx, sx, k)
    ny, fy = _rel_base_frac(py_ref[:] - 0.5, cy, sy, k)
    nz, fz = _rel_base_frac(pz_ref[:] - 0.5, cz, sz, k)

    offs = list(range(-k, k + 2))
    wxs = [jnp.where(nx == ox, 1.0 - fx, jnp.where(nx == ox - 1, fx, 0.0))
           for ox in offs]
    if want_minmax:
        nxs = [jnp.where((nx == ox) | (nx == ox - 1), 0.0, _BIG)
               for ox in offs]

    # actual corner-base range of this tile (+1: base and base+1 corners)
    nz_lo = jnp.min(nz)
    ny_lo = jnp.min(ny)
    cnt_z = jnp.max(nz) - nz_lo + 2
    cnt_y = jnp.max(ny) - ny_lo + 2

    cp.wait()
    if with_ok:
        cpo.wait()

    acc0 = jnp.zeros((bz, by, sx_a), jnp.float32)
    minv0 = jnp.full((bz, by, sx_a), _BIG, jnp.float32)
    maxv0 = jnp.full((bz, by, sx_a), -_BIG, jnp.float32)
    have0 = jnp.full((bz, by, sx_a), _BIG, jnp.float32)

    def body(o, carry):
        if want_minmax:
            acc, minv, maxv, have = carry
        else:
            acc = carry
            minv = maxv = have = None
        oz = nz_lo + o // cnt_y      # traced offset values
        oy = ny_lo + o % cnt_y
        zysl = slab[pl.ds(oz + halo, bz), pl.ds(oy + halo, by)]
        ozf = oz.astype(jnp.float32)
        oyf = oy.astype(jnp.float32)
        nzf = nz.astype(jnp.float32)
        nyf = ny.astype(jnp.float32)
        wz = jnp.where(nzf == ozf, 1.0 - fz,
                       jnp.where(nzf == ozf - 1.0, fz, 0.0))
        wy = jnp.where(nyf == oyf, 1.0 - fy,
                       jnp.where(nyf == oyf - 1.0, fy, 0.0))
        wzy = wz * wy
        if want_minmax:
            not_zy = jnp.where(
                ((nzf == ozf) | (nzf == ozf - 1.0))
                & ((nyf == oyf) | (nyf == oyf - 1.0)), 0.0, _BIG)
            if with_ok:
                okzysl = okslab[pl.ds(oz + halo, bz), pl.ds(oy + halo, by)]
        for ix, ox in enumerate(offs):
            xsl = pltpu.roll(zysl, (-ox) % sx_a, 2)
            acc = acc + (wzy * wxs[ix]) * xsl
            if want_minmax:
                nots = not_zy + nxs[ix]
                if with_ok:
                    nots = nots + (1.0 - pltpu.roll(okzysl, (-ox) % sx_a, 2)) \
                        * _BIG
                minv = jnp.minimum(minv, xsl + nots)
                maxv = jnp.maximum(maxv, xsl - nots)
                if with_ok:
                    have = jnp.minimum(have, nots)
        return (acc, minv, maxv, have) if want_minmax else acc

    if want_minmax:
        acc, minv, maxv, have = jax.lax.fori_loop(
            0, cnt_z * cnt_y, body, (acc0, minv0, maxv0, have0))
        minv_ref[:] = minv
        maxv_ref[:] = maxv
        have_ref[:] = jnp.where(have < _BIG * 0.5, 1.0, 0.0) \
            if with_ok else jnp.ones((bz, by, sx_a), jnp.float32)
    else:
        acc = jax.lax.fori_loop(0, cnt_z * cnt_y, body, acc0)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("k", "want_minmax", "bz", "by",
                                             "interpret", "prehalo",
                                             "sz_clamp"))
def _window_pass_dyn_call(src, px, py, pz, ok_mask, k: int,
                          want_minmax: bool, bz: int, by: int,
                          interpret: bool, z_base=None,
                          prehalo: bool = False, sz_clamp: int | None = None):
    """prehalo=True: src (and ok_mask) arrive with the z halo already
    attached (local block + halo planes on both sides — the z-sharded
    shard_map path exchanges them with ppermute); z_base is this shard's
    global z offset and sz_clamp the GLOBAL z extent for the window
    clamp semantics."""
    sz, sy, sx = px.shape
    sx_true = sx
    sxp = -(-sx // _lane_mult(interpret)) * _lane_mult(interpret)
    if sxp != sx:
        # edge-pad positions so padded lanes carry in-range values (keeps
        # the per-tile dynamic offset ranges tight); clamps use sx_true,
        # so padded lanes' window weights are all zero
        src = _pad_lanes(src, sxp)
        px, py, pz = (_pad_lanes(a, sxp) for a in (px, py, pz))
        if ok_mask is not None:
            ok_mask = _pad_lanes(ok_mask, sxp, mode="zero")
        sx = sxp
    halo = k + 1
    nblk_z = -(-sz // bz)
    nblk_y = -(-sy // by)
    zp, yp = nblk_z * bz, nblk_y * by
    # source: halo'd in z AND y (edge values are never selected — positions
    # are range-clamped — but keep them finite)
    if prehalo:  # src: (sz + 2*halo, sy, sx) — z halo already attached
        src_p = jnp.pad(src, ((0, zp - sz), (halo, halo + (yp - sy)),
                              (0, 0)), mode="edge")
    else:
        src_p = jnp.pad(src, ((halo, halo + (zp - sz)),
                              (halo, halo + (yp - sy)), (0, 0)),
                        mode="edge")
    with_ok = ok_mask is not None
    if with_ok:
        if prehalo:
            ok_p = jnp.pad(ok_mask.astype(jnp.float32),
                           ((0, zp - sz), (halo, halo + (yp - sy)), (0, 0)))
        else:
            ok_p = jnp.pad(ok_mask.astype(jnp.float32),
                           ((halo, halo + (zp - sz)),
                            (halo, halo + (yp - sy)), (0, 0)))
    else:
        ok_p = jnp.zeros((1, 1, sx), jnp.float32)  # dummy
    if z_base is None:
        z_base = jnp.zeros((1,), jnp.int32)
    if sz_clamp is None:
        sz_clamp = sz

    def padzy(a):
        if zp == sz and yp == sy:
            return a
        # edge mode: padded cells' positions stay sane so they can't
        # inflate the per-tile offset ranges
        return jnp.pad(a, ((0, zp - sz), (0, yp - sy), (0, 0)), mode="edge")

    pxp, pyp_, pzp = padzy(px), padzy(py), padzy(pz)
    okm = pxp  # unused slot

    blk = pl.BlockSpec((bz, by, sx), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = [jax.ShapeDtypeStruct((zp, yp, sx), jnp.float32)]
    out_specs = [blk]
    if want_minmax:
        out_shapes += [jax.ShapeDtypeStruct((zp, yp, sx), jnp.float32)] * 3
        out_specs += [blk] * 3

    nslz, nsly = bz + 2 * halo, by + 2 * halo
    scratch = [pltpu.VMEM((nslz, nsly, sx), jnp.float32),
               pltpu.VMEM((nslz, nsly, sx), jnp.float32)
               if with_ok else pltpu.SMEM((1,), jnp.float32),
               pltpu.SemaphoreType.DMA(()),
               pltpu.SemaphoreType.DMA(())]

    kern = functools.partial(_window_kernel_dyn, k=k, bz=bz, by=by,
                             shape=(sz_clamp, sy, sx_true),
                             want_minmax=want_minmax, with_ok=with_ok)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kern,
        grid=(nblk_z, nblk_y),
        in_specs=[smem, blk, blk, blk, blk, hbm, hbm],
        out_specs=tuple(out_specs) if want_minmax else out_specs[0],
        out_shape=tuple(out_shapes) if want_minmax else out_shapes[0],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(jnp.asarray(z_base, jnp.int32).reshape(1), pxp, pyp_, pzp, okm,
      src_p, ok_p)

    if not want_minmax:
        outs = (outs,)
    outs = tuple(o[:sz, :sy, :sx_true] for o in outs)
    if want_minmax:
        out, minv, maxv, have = outs
        return out, minv, maxv, have > 0.5
    return outs[0]


def window_pass(src, px, py, pz, dom: Domain, k: int, ok_mask=None,
                want_minmax: bool = False, bz: int = 8, by: int = 32,
                dyn: bool | None = None):
    """Drop-in Pallas counterpart of advection_fast.window_interp (3D).

    dyn=None (default) picks the dynamic-range kernel (identical taps,
    per-tile trip counts); set MANTA_PALLAS_STATIC=1 or dyn=False for the
    fixed (2k+2)^2-iteration kernel."""
    import os
    interpret = not _is_tpu()
    if dyn is None:
        dyn = os.environ.get("MANTA_PALLAS_STATIC", "") != "1"
    if dyn:
        return _window_pass_dyn_call(src, px, py, pz, ok_mask, k,
                                     want_minmax, min(bz, dom.shape[0]),
                                     min(by, dom.shape[1]), interpret)
    return _window_pass_call(src, px, py, pz, ok_mask, k, want_minmax,
                             min(bz, dom.shape[0]), interpret)


def window_pass_zshard(src, px, py, pz, dom: Domain, k: int,
                       axis_name: str, n_shards: int, ok_mask=None,
                       want_minmax: bool = False, bz: int = 8, by: int = 32):
    """window_pass for use INSIDE a shard_map body with the z axis sharded
    over mesh axis `axis_name` (the multi-chip path: halos ride the ICI).

    Exchanges the (k+1)-plane z halos with neighbor shards via
    lax.ppermute, then runs the local dynamic-range kernel with this
    shard's global z offset and GLOBAL clamp extent — semantics identical
    to the unsharded window_pass. Boundary shards use edge planes (never
    selected: positions are globally range-clamped); the ok-mask halo of
    boundary shards is ppermute's zero fill, matching the unsharded
    zero pad."""
    halo = k + 1
    nloc = src.shape[0]
    if nloc < halo:
        raise ValueError(f"z shard of {nloc} planes < halo {halo}")
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]

    low = jax.lax.ppermute(src[-halo:], axis_name, fwd)
    high = jax.lax.ppermute(src[:halo], axis_name, bwd)
    low = jnp.where(idx == 0, jnp.broadcast_to(src[:1], low.shape), low)
    high = jnp.where(idx == n_shards - 1,
                     jnp.broadcast_to(src[-1:], high.shape), high)
    src_h = jnp.concatenate([low, src, high], axis=0)

    ok_h = None
    if ok_mask is not None:
        okf = ok_mask.astype(jnp.float32)
        ok_h = jnp.concatenate(
            [jax.lax.ppermute(okf[-halo:], axis_name, fwd), okf,
             jax.lax.ppermute(okf[:halo], axis_name, bwd)], axis=0)

    z_base = (idx * nloc).astype(jnp.int32).reshape(1)
    return _window_pass_dyn_call(
        src_h, px, py, pz, ok_h, k, want_minmax,
        min(bz, nloc), min(by, dom.shape[1]), not _is_tpu(),
        z_base=z_base, prehalo=True, sz_clamp=dom.shape[0])


def window_pass_zshard_spmd(src, px, py, pz, dom: Domain, k: int, mesh,
                            axis_name: str = "z", ok_mask=None,
                            want_minmax: bool = False):
    """GSPMD-callable form of window_pass_zshard: wraps it in a shard_map
    over `mesh` so it drops into a jitted program whose grids are z-sharded
    over mesh axis `axis_name` (the multi-chip smoke path). Other mesh axes
    are treated as replicated for this op — the Pallas kernel needs full
    y/x locally, so a y-sharded input is gathered at entry and re-sharded
    on exit by GSPMD."""
    from jax.sharding import PartitionSpec as P
    n = int(mesh.shape[axis_name])
    spec = P(axis_name)
    with_ok = ok_mask is not None

    def body(*args):
        if with_ok:
            s, a, b, c, o = args
        else:
            (s, a, b, c), o = args, None
        return window_pass_zshard(s, a, b, c, dom, k, axis_name, n,
                                  ok_mask=o, want_minmax=want_minmax)

    f = jax.shard_map(
        body, mesh=mesh, in_specs=(spec,) * (5 if with_ok else 4),
        out_specs=(spec,) * 4 if want_minmax else spec,
        check_vma=False)  # pallas_call outputs carry no vma annotation
    args = (src, px, py, pz) + ((ok_mask,) if with_ok else ())
    return f(*args)


# ---------------------------------------------------------------------------
# drivers (mirror ops/advection_fast.py, Pallas window_pass per pass)

def _face_positions(vel, dt, dom: Domain, c: int):
    from ..core import mac as macops
    from .advection import _cell_centers
    getters = [macops.at_mac_x, macops.at_mac_y, macops.at_mac_z]
    xx, yy, zz = _cell_centers(dom)
    vface = getters[c](vel)
    return (xx - vface[0] * dt, yy - vface[1] * dt, zz - vface[2] * dt,
            xx + vface[0] * dt, yy + vface[1] * dt, zz + vface[2] * dt)


def _wp(dom: Domain, k: int, zshard):
    """window_pass bound to (dom, k), optionally through the z-sharded
    shard_map path. zshard = (mesh, axis_name) or None."""
    if zshard is None:
        return lambda src, px, py, pz, **kw: window_pass(
            src, px, py, pz, dom, k, **kw)
    mesh, axis = zshard
    return lambda src, px, py, pz, **kw: window_pass_zshard_spmd(
        src, px, py, pz, dom, k, mesh, axis_name=axis, **kw)


def advect_real_pl(flags, vel, grid, dt, dom: Domain, k: int,
                   order: int = 2, strength: float = 1.0, zshard=None):
    """Order-1/2 scalar advection (clampMode=2) via the Pallas window kernel.
    Semantics identical to advection_fast.advect_real_fast. zshard =
    (mesh, axis_name) routes the window passes through the multi-chip
    z-sharded kernel (halo exchange over ICI)."""
    from ..core import flags as fl
    from ..core.masks import interior_mask
    from .advection import _cell_centers, _maccormack_correct
    from ..core import mac as macops

    wp = _wp(dom, k, zshard)
    inter = interior_mask(dom, 1)
    xx, yy, zz = _cell_centers(dom)
    c = macops.get_centered(vel)
    px, py, pz = xx - c[0] * dt, yy - c[1] * dt, zz - c[2] * dt
    ok = (flags & (fl.TypeFluid | fl.TypeEmpty)) != 0
    if order == 1:
        fwd = wp(grid, px, py, pz)
        return jnp.where(inter, fwd, 0.0)
    fwd, minv, maxv, have = wp(grid, px, py, pz,
                               ok_mask=ok, want_minmax=True)
    fwd = jnp.where(inter, fwd, 0.0)
    bx, by, bz_ = xx + c[0] * dt, yy + c[1] * dt, zz + c[2] * dt
    bwd = wp(fwd, bx, by, bz_)
    bwd = jnp.where(inter, bwd, 0.0)
    new = _maccormack_correct(flags, grid, fwd, bwd, strength)
    out_of = (new < minv) | (new > maxv) | ~have
    clamped = jnp.where(out_of, fwd, new)
    return jnp.where(inter, clamped, new)


def advect_mac_pl(flags, vel, grid, dt, dom: Domain, k: int,
                  order: int = 2, strength: float = 1.0,
                  has_outflow: bool = True, zshard=None):
    """Order-1/2 MAC self-advection (clampMode=2) via the Pallas kernel.
    Semantics identical to advection_fast.advect_mac_fast; has_outflow=False
    statically skips the convective outflow extrapolation (a ~15-pass XLA
    stencil) for domains with no outflow cells. zshard = (mesh, axis_name)
    routes the window passes through the multi-chip z-sharded kernel."""
    from ..core import flags as fl
    from ..core.masks import interior_mask, shift
    from .advection import (_maccormack_correct_mac, _axis_coord,
                            apply_outflow_bc)

    wp = _wp(dom, k, zshard)
    inter = interior_mask(dom, 1)
    n_comp = 3 if dom.is3d else 2
    fpos = [_face_positions(vel, dt, dom, c) for c in range(n_comp)]

    def fwd_pass(src, want_minmax):
        comps, mms = [], []
        for c in range(n_comp):
            px, py, pz = fpos[c][:3]
            if want_minmax:
                v, mn, mx, _ = wp(src[c], px, py, pz, want_minmax=True)
                mms.append((mn, mx))
            else:
                v = wp(src[c], px, py, pz)
            comps.append(v)
        if not dom.is3d:
            comps.append(jnp.zeros_like(comps[0]))
        dst = jnp.stack(comps)
        return jnp.where(inter[None], dst, 0.0), mms

    if order == 1:
        fwd, _ = fwd_pass(grid, False)
        return apply_outflow_bc(flags, fwd, grid, dt, dom) \
            if has_outflow else fwd
    fwd, mms = fwd_pass(grid, True)
    bwd_comps = []
    for c in range(n_comp):
        bx, by, bz_ = fpos[c][3:]
        bwd_comps.append(wp(fwd[c], bx, by, bz_))
    if not dom.is3d:
        bwd_comps.append(jnp.zeros_like(bwd_comps[0]))
    bwd = jnp.where(inter[None], jnp.stack(bwd_comps), 0.0)
    new = _maccormack_correct_mac(flags, grid, fwd, bwd, strength, dom)
    ok_flag = (flags & (fl.TypeFluid | fl.TypeEmpty)) != 0
    axes = ["x", "y", "z"]
    comps = [new[c] for c in range(3)]
    for c in range(n_comp):
        mn, mx = mms[c]
        out_of = (new[c] < mn) | (new[c] > mx)
        val = jnp.where(out_of, fwd[c], new[c])
        nb_ok = shift(ok_flag, -1, axes[c])
        edge = _axis_coord(dom, axes[c]) == 0
        front = ok_flag & (nb_ok | edge)
        val = jnp.where(front, val, fwd[c])
        comps[c] = jnp.where(inter, val, new[c])
    out = jnp.stack(comps)
    return apply_outflow_bc(flags, out, grid, dt, dom) \
        if has_outflow else out
