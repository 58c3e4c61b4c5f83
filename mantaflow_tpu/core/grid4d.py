"""4D space-time grids.

Capability port of ``source/grid4d.h/.cpp`` (Grid4d<T> :27/:93: a separate
4D grid type with its own interpolation, arithmetic and IO) stored as
[t, z, y, x] arrays. Quadrilinear interpolation follows the same
cell-center/-0.5 convention and border clamping as the 3D interpolator
(interpol4d, util/interpol.h pattern extended by grid4d's fourth axis).
"""

from __future__ import annotations

import jax.numpy as jnp

from .interp import _axis_weights


def zeros4d(size_xyzt, dtype=jnp.float32, channels: int = 0):
    """size = (sx, sy, sz, st) manta order -> array [t,z,y,x(,c)]."""
    sx, sy, sz, st = size_xyzt
    shape = (st, sz, sy, sx)
    if channels:
        shape = (channels,) + shape
    return jnp.zeros(shape, dtype)


def interpol4d(data, pos_x, pos_y, pos_z, pos_t):
    """Quadrilinear lookup on a [t,z,y,x] grid."""
    st, sz, sy, sx = data.shape[-4:]
    xi, s1 = _axis_weights(pos_x - 0.5, sx)
    yi, t1 = _axis_weights(pos_y - 0.5, sy)
    zi, f1 = _axis_weights(pos_z - 0.5, sz)
    ti, g1 = _axis_weights(pos_t - 0.5, st)
    x1 = jnp.minimum(xi + 1, sx - 1)
    y1 = jnp.minimum(yi + 1, sy - 1)
    z1 = jnp.minimum(zi + 1, sz - 1)
    t1i = jnp.minimum(ti + 1, st - 1)
    out = 0.0
    for (tt, wt) in ((ti, 1.0 - g1), (t1i, g1)):
        for (zz, wz) in ((zi, 1.0 - f1), (z1, f1)):
            for (yy, wy) in ((yi, 1.0 - t1), (y1, t1)):
                for (xx, wx) in ((xi, 1.0 - s1), (x1, s1)):
                    out = out + (wt * wz * wy * wx) * data[tt, zz, yy, xx]
    return out


def get_slice_t(data, t: int):
    """Extract a 3D [z,y,x] time slice (getSliceFrom4d equivalent)."""
    return data[t]


def set_slice_t(data, t: int, vol):
    return data.at[t].set(vol)


def max_abs(data):
    return jnp.max(jnp.abs(data))
