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
    """8-corner gather + blend; upper indices clamp (safe for n==1 axes)."""
    sz, sy, sx = data.shape[-3:]
    x1 = jnp.minimum(xi + 1, sx - 1)
    y1 = jnp.minimum(yi + 1, sy - 1)
    z1 = jnp.minimum(zi + 1, sz - 1)
    s0, t0, f0 = 1.0 - s1, 1.0 - t1, 1.0 - f1

    d000 = data[zi, yi, xi]
    d100 = data[zi, yi, x1]
    d010 = data[zi, y1, xi]
    d110 = data[zi, y1, x1]
    if sz > 1:
        d001 = data[z1, yi, xi]
        d101 = data[z1, yi, x1]
        d011 = data[z1, y1, xi]
        d111 = data[z1, y1, x1]
        return (((d000 * t0 + d010 * t1) * s0 + (d100 * t0 + d110 * t1) * s1) * f0
                + ((d001 * t0 + d011 * t1) * s0 + (d101 * t0 + d111 * t1) * s1) * f1)
    return ((d000 * t0 + d010 * t1) * s0 + (d100 * t0 + d110 * t1) * s1)


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
