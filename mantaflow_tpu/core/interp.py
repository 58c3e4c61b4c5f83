"""Trilinear interpolation with mantaflow's exact clamping semantics.

Reproduces ``source/util/interpol.h``:
- cell-centered values live at (i+0.5, j+0.5, k+0.5); lookups subtract 0.5
  (BUILD_INDEX, interpol.h:52-68);
- MAC component c lives at the face: its own axis is sampled *unshifted*
  (BUILD_INDEX_SHIFT, interpol.h:113-129, interpolMAC :131-166);
- out-of-range positions clamp to the border cell pair with saturated
  weights (the if-chains in BUILD_INDEX).

Positions are passed as three arrays (world/grid coordinates, any matching
shape); everything is vectorized and jit-safe. Gathers lower to XLA gather
ops on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_weights(p, n: int, clamp_hi: bool = True):
    """Manta BUILD_INDEX per-axis index+weight with border clamping.

    Returns (i0, w1) where the axis contribution is
    data[i0]*(1-w1) + data[min(i0+1, n-1)]*w1.
    """
    p = jnp.asarray(p)
    idx = p.astype(jnp.int32)  # C-style truncation; overridden for p<0 below
    w1 = p - idx.astype(p.dtype)
    lo = p < 0.0
    idx = jnp.where(lo, 0, idx)
    w1 = jnp.where(lo, jnp.zeros_like(w1), w1)
    if clamp_hi and n > 1:
        hi = p >= (n - 1)
        idx = jnp.where(hi, n - 2, idx)
        w1 = jnp.where(hi, jnp.ones_like(w1), w1)
    if n == 1:
        idx = jnp.zeros_like(idx)
        w1 = jnp.zeros_like(w1)
    return idx, w1


def trilerp_gather(data, xi, yi, zi, s1, t1, f1):
    """8-corner interpolation via ONE packed row gather (see the
    packed-corner section below: TPU gather cost is per-index, so packing
    the corners into (T, 8) rows is ~8x cheaper than eight gathers). Index
    semantics identical to the original per-corner form: _axis_weights
    bounds the bases so the uniform +1 offsets never leave the array."""
    sz, sy, sx = data.shape[-3:]
    base = (zi * sy + yi) * sx + xi
    s0, t0, f0 = 1.0 - s1, 1.0 - t1, 1.0 - f1
    table = build_corner_table(data)
    flat_base = base.reshape(-1)
    rows = table[flat_base]
    shp = flat_base.shape[0]
    sr0 = s0.reshape(-1); sr1 = s1.reshape(-1)
    tr0 = t0.reshape(-1); tr1 = t1.reshape(-1)
    # combine in the reference's exact nested-lerp order (interpol.h:72-84)
    # — bit-for-bit float parity with the binary; same flop count as the
    # weight-product form
    if sz > 1:
        fr0 = f0.reshape(-1); fr1 = f1.reshape(-1)
        out = (((rows[:, 0] * tr0 + rows[:, 2] * tr1) * sr0
                + (rows[:, 1] * tr0 + rows[:, 3] * tr1) * sr1) * fr0
               + ((rows[:, 4] * tr0 + rows[:, 6] * tr1) * sr0
                  + (rows[:, 5] * tr0 + rows[:, 7] * tr1) * sr1) * fr1)
    else:
        out = ((rows[:, 0] * tr0 + rows[:, 2] * tr1) * sr0
               + (rows[:, 1] * tr0 + rows[:, 3] * tr1) * sr1)
    return out.reshape(base.shape)


def interpol(data, pos_x, pos_y, pos_z):
    """Cell-centered trilinear lookup (interpol.h:71-84).

    `data` is [z,y,x]; positions in grid coordinates (cell centers at +0.5).
    """
    sz, sy, sx = data.shape[-3:]
    xi, s1 = _axis_weights(pos_x - 0.5, sx)
    yi, t1 = _axis_weights(pos_y - 0.5, sy)
    zi, f1 = _axis_weights(pos_z - 0.5, sz)
    return trilerp_gather(data, xi, yi, zi, s1, t1, f1)


def interpol_component(mac, c: int, pos_x, pos_y, pos_z):
    """Cell-centered-convention lookup of one MAC component
    (interpolComponent, interpol.h:86-96). Used by MAC advection, where both
    the trace start and the lookup field carry the same face shift so no
    coordinate adjustment is needed (plugin/advection.cpp:49-56)."""
    return interpol(mac[c], pos_x, pos_y, pos_z)


# ---------------------------------------------------------------------------
# packed-corner fast path for PARTICLE interpolation.
#
# TPU gather cost is per-index, not per-byte for small rows (measured: a
# (T,8) row gather costs the same ~7-8ms/690k as a scalar gather). Packing
# the 8 trilinear corners of every cell into one (T,8) table turns the
# 8-gather interpolation into ONE row gather + a weight dot — an ~8x
# reduction in gather count for every particle op (g2p, advection, FLIP).

def _corner_offsets(shape):
    sz, sy, sx = shape[-3:]
    if sz > 1:
        return (0, 1, sx, sx + 1, sy * sx, sy * sx + 1, sy * sx + sx,
                sy * sx + sx + 1)
    return (0, 1, sx, sx + 1)


def build_corner_table(data):
    """(Z,Y,X) -> (T, 8|4) table; row f holds the corner values of the cell
    whose lower corner has flat index f. Built with rolls (one fused pass);
    wrapped top rows are never addressed because _axis_weights bounds the
    base indices to [0, n-2] per axis."""
    flat = data.reshape(-1)
    offs = _corner_offsets(data.shape)
    return jnp.stack([jnp.roll(flat, -o) for o in offs], axis=1)


def _base_and_weights(shape, px, py, pz):
    sz, sy, sx = shape[-3:]
    xi, s1 = _axis_weights(px, sx)
    yi, t1 = _axis_weights(py, sy)
    zi, f1 = _axis_weights(pz, sz)
    base = (zi * sy + yi) * sx + xi
    s0, t0, f0 = 1.0 - s1, 1.0 - t1, 1.0 - f1
    if sz > 1:
        w = jnp.stack([f0 * t0 * s0, f0 * t0 * s1, f0 * t1 * s0,
                       f0 * t1 * s1, f1 * t0 * s0, f1 * t0 * s1,
                       f1 * t1 * s0, f1 * t1 * s1], axis=-1)
    else:
        w = jnp.stack([t0 * s0, t0 * s1, t1 * s0, t1 * s1], axis=-1)
    return base, w


def interpol_rows(table, shape, pos_x, pos_y, pos_z):
    """Cell-centered lookup via a prebuilt corner table (1D positions)."""
    base, w = _base_and_weights(shape, pos_x - 0.5, pos_y - 0.5, pos_z - 0.5)
    return jnp.sum(table[base] * w, axis=-1)


def interpol_fast(data, pos_x, pos_y, pos_z):
    """interpol() equivalent optimized for particle (1D) position arrays."""
    return interpol_rows(build_corner_table(data), data.shape, pos_x, pos_y,
                         pos_z)


def interpol_mac_fast(mac, pos_x, pos_y, pos_z, tables=None):
    """interpol_mac() equivalent via packed tables: 3 row gathers total.
    Pass `tables = mac_corner_tables(mac)` to amortize table building."""
    shape = mac.shape[-3:]
    if tables is None:
        tables = mac_corner_tables(mac)
    bx, wx = _base_and_weights(shape, pos_x, pos_y - 0.5, pos_z - 0.5)
    by, wy = _base_and_weights(shape, pos_x - 0.5, pos_y, pos_z - 0.5)
    u = jnp.sum(tables[0][bx] * wx, axis=-1)
    v = jnp.sum(tables[1][by] * wy, axis=-1)
    if shape[0] > 1:
        bz, wz = _base_and_weights(shape, pos_x - 0.5, pos_y - 0.5, pos_z)
        w = jnp.sum(tables[2][bz] * wz, axis=-1)
    else:
        w = jnp.zeros_like(u)
    return u, v, w


def mac_corner_tables(mac):
    return (build_corner_table(mac[0]), build_corner_table(mac[1]),
            build_corner_table(mac[2]) if mac.shape[-3] > 1 else None)


def scatter_rows(shape, base, w, values):
    """Row-packed scatter-add: the inverse of interpol_rows. Accumulates
    w*values into an auxiliary (T, 8|4) table with ONE scatter, then folds
    the corner channels with rolls. Returns the flat (T,) accumulation."""
    sz, sy, sx = shape[-3:]
    n = sz * sy * sx
    offs = _corner_offsets(shape)
    upd = w * values[..., None] if values is not None else w
    aux = jnp.zeros((n, len(offs)), jnp.float32).at[base].add(upd)
    out = jnp.zeros((n,), jnp.float32)
    for c, o in enumerate(offs):
        out = out + jnp.roll(aux[:, c], o)
    return out


# -- fully packed MAC interpolation: ONE gather per particle evaluation ----
#
# All values interpol_mac needs live in the 3x3x3 cell neighborhood of the
# cell base = trunc(p - 0.5): per component, 12 cells (3 along its own axis,
# 2 along the others). Row width is free on TPU gathers (measured flat up to
# 128), so packing u/v/w neighborhoods (36 cols) — optionally twice for
# (vel, vel_old) or plus 8 flag cols — makes every particle evaluation a
# single row gather plus vector math.

def _mac_pack_ranges(is3d: bool):
    if is3d:
        return (((0, 1, 2), (0, 1), (0, 1)),
                ((0, 1), (0, 1, 2), (0, 1)),
                ((0, 1), (0, 1), (0, 1, 2)))
    return (((0, 1, 2), (0, 1), (0,)),
            ((0, 1), (0, 1, 2), (0,)))


def build_mac_pack(mac, flags=None):
    """(3,Z,Y,X) -> (T, 24|36[+4|8]) packed neighborhood table."""
    sz, sy, sx = mac.shape[-3:]
    is3d = sz > 1
    cols = []
    for c, (xr, yr, zr) in enumerate(_mac_pack_ranges(is3d)):
        flat = mac[c].reshape(-1)
        for dz in zr:
            for dy in yr:
                for dx in xr:
                    cols.append(jnp.roll(flat, -(dz * sy * sx + dy * sx + dx)))
    if flags is not None:
        fflat = flags.reshape(-1).astype(jnp.float32)
        zr = (0, 1) if is3d else (0,)
        for dz in zr:
            for dy in (0, 1):
                for dx in (0, 1):
                    cols.append(jnp.roll(fflat,
                                         -(dz * sy * sx + dy * sx + dx)))
    return jnp.stack(cols, axis=1)


def interpol_mac_packed(pack, shape, pos_x, pos_y, pos_z,
                        with_flags: bool = False):
    """interpol_mac via one packed row gather. Returns (u, v, w[, flag8])
    where flag8 is the gathered 4/8-cell flag block when with_flags."""
    sz, sy, sx = shape[-3:]
    is3d = sz > 1
    xi, s1 = _axis_weights(pos_x - 0.5, sx)
    yi, t1 = _axis_weights(pos_y - 0.5, sy)
    zi, f1 = _axis_weights(pos_z - 0.5, sz)
    sxi, ss1 = _axis_weights(pos_x, sx)
    syi, st1 = _axis_weights(pos_y, sy)
    szi, sf1 = _axis_weights(pos_z, sz)
    base = (zi * sy + yi) * sx + xi
    rows = pack[base]  # (N, W)

    def axis_w(centered_w1):
        return (1.0 - centered_w1, centered_w1)

    def shifted_w(sidx, cidx, sw1, n3: int):
        """weights over the 3-slot axis: shifted base lands at slot
        d = sidx - cidx (0 or 1)."""
        d = (sidx - cidx).astype(jnp.float32)
        w = []
        for slot in range(n3):
            s = jnp.float32(slot)
            w.append(jnp.where(d == s, 1.0 - sw1,
                               jnp.where(d == s - 1.0, sw1, 0.0)))
        return tuple(w)

    wxc = axis_w(s1)
    wyc = axis_w(t1)
    wzc = axis_w(f1) if is3d else (jnp.ones_like(s1),)
    wxs = shifted_w(sxi, xi, ss1, 3)
    wys = shifted_w(syi, yi, st1, 3)
    wzs = shifted_w(szi, zi, sf1, 3) if is3d else (jnp.ones_like(s1),)

    comps = []
    col = 0
    ranges = _mac_pack_ranges(is3d)
    for c, (xr, yr, zr) in enumerate(ranges):
        wx = wxs if c == 0 else wxc
        wy = wys if c == 1 else wyc
        wz = wzs if c == 2 else wzc
        acc = jnp.zeros_like(s1)
        for iz, dz in enumerate(zr):
            for iy, dy in enumerate(yr):
                for ix, dx in enumerate(xr):
                    acc = acc + wz[iz] * wy[iy] * wx[ix] * rows[:, col]
                    col += 1
        comps.append(acc)
    if not is3d:
        comps.append(jnp.zeros_like(comps[0]))
    if with_flags:
        nfl = 8 if is3d else 4
        flag_rows = rows[:, col:col + nfl].astype(jnp.int32)
        # the containing cell trunc(p) relative to base is (0|1) per axis
        dxp = jnp.clip(jnp.clip(pos_x.astype(jnp.int32), 0, sx - 1) - xi, 0, 1)
        dyp = jnp.clip(jnp.clip(pos_y.astype(jnp.int32), 0, sy - 1) - yi, 0, 1)
        dzp = jnp.clip(jnp.clip(pos_z.astype(jnp.int32), 0, sz - 1) - zi, 0, 1) \
            if is3d else jnp.zeros_like(dxp)
        slot = (dzp * 2 + dyp) * 2 + dxp
        flag_at = jnp.take_along_axis(flag_rows, slot[:, None], axis=1)[:, 0]
        return comps[0], comps[1], comps[2], flag_at
    return comps[0], comps[1], comps[2]


def scatter_rows2(shape, base, w, values):
    """Fused value+weight row scatter: one scatter producing both the
    weighted-value accumulation and the weight sum (p2g's two targets)."""
    sz, sy, sx = shape[-3:]
    n = sz * sy * sx
    offs = _corner_offsets(shape)
    k = len(offs)
    upd = jnp.concatenate([w * values[..., None], w], axis=-1)
    aux = jnp.zeros((n, 2 * k), jnp.float32).at[base].add(upd)
    acc = jnp.zeros((n,), jnp.float32)
    wsum = jnp.zeros((n,), jnp.float32)
    for c, o in enumerate(offs):
        acc = acc + jnp.roll(aux[:, c], o)
        wsum = wsum + jnp.roll(aux[:, k + c], o)
    return acc, wsum


def _cubic_weights(t):
    """cubicInterp (util/interpolHigh.h:20-38) expressed as four basis
    weights for samples p[-1..2]: the Hermite form with central-difference
    slopes (no monotonicity clamp, matching the reference)."""
    t2 = t * t
    t3 = t2 * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return (w0, w1, w2, w3)


def interpol_cubic(data, pos_x, pos_y, pos_z):
    """Cell-centered cubic (Catmull-Rom) lookup (interpolCubic,
    interpolHigh.h:77-187); falls back to linear within one cell of the
    border, exactly as the reference does."""
    sz, sy, sx = data.shape[-3:]
    linear = interpol(data, pos_x, pos_y, pos_z)

    px = pos_x - 0.5
    py = pos_y - 0.5
    pz = pos_z - 0.5
    x1 = px.astype(jnp.int32)
    y1 = py.astype(jnp.int32)
    z1 = pz.astype(jnp.int32)
    ok = ((x1 - 1 >= 0) & (y1 - 1 >= 0) & (x1 + 2 < sx) & (y1 + 2 < sy))
    if sz > 1:
        ok = ok & (z1 - 1 >= 0) & (z1 + 2 < sz)
    xs = jnp.clip(x1, 1, max(sx - 3, 1))
    ys = jnp.clip(y1, 1, max(sy - 3, 1))
    zs = jnp.clip(z1, 1, max(sz - 3, 1)) if sz > 1 else jnp.zeros_like(x1)
    wx = _cubic_weights(px - x1.astype(px.dtype))
    wy = _cubic_weights(py - y1.astype(py.dtype))
    if sz > 1:
        wz = _cubic_weights(pz - z1.astype(pz.dtype))
        zoff = (-1, 0, 1, 2)
    else:
        wz = (jnp.zeros_like(px), jnp.ones_like(px), jnp.zeros_like(px),
              jnp.zeros_like(px))
        zoff = (0,)

    out = jnp.zeros_like(linear)
    for zi, dz in enumerate(zoff):
        acc_y = jnp.zeros_like(linear)
        for yi, dy in enumerate((-1, 0, 1, 2)):
            acc_x = jnp.zeros_like(linear)
            for xi, dx in enumerate((-1, 0, 1, 2)):
                acc_x = acc_x + wx[xi] * data[zs + dz, ys + dy, xs + dx]
            acc_y = acc_y + wy[yi] * acc_x
        w_z = wz[zi] if sz > 1 else 1.0  # 2D: single plane, weight 1
        out = out + w_z * acc_y
    return jnp.where(ok, out, linear)


def interpol_hi(data, pos_x, pos_y, pos_z, order_space: int = 1):
    """getInterpolatedHi dispatch (grid.h:273): 1=linear, 2=cubic."""
    if order_space == 2:
        return interpol_cubic(data, pos_x, pos_y, pos_z)
    return interpol(data, pos_x, pos_y, pos_z)


def interpol_mac(mac, pos_x, pos_y, pos_z):
    """Full MAC velocity lookup (interpolMAC, interpol.h:131-166).

    Component c samples its own axis unshifted (faces at integer coords) and
    the other axes at -0.5. Returns (u, v, w) arrays; w is zeros in 2D.
    """
    sz, sy, sx = mac.shape[-3:]
    xi, s1 = _axis_weights(pos_x - 0.5, sx)
    yi, t1 = _axis_weights(pos_y - 0.5, sy)
    zi, f1 = _axis_weights(pos_z - 0.5, sz)
    sxi, ss1 = _axis_weights(pos_x, sx)
    syi, st1 = _axis_weights(pos_y, sy)
    szi, sf1 = _axis_weights(pos_z, sz)

    u = trilerp_gather(mac[0], sxi, yi, zi, ss1, t1, f1)
    v = trilerp_gather(mac[1], xi, syi, zi, s1, st1, f1)
    if sz > 1:
        w = trilerp_gather(mac[2], xi, yi, szi, s1, t1, sf1)
    else:
        w = jnp.zeros_like(u)
    return u, v, w
