"""Index-space masks replacing the reference kernel system's ``bnd=N`` option.

A ``KERNEL(bnd=N)`` in the reference iterates only over interior cells
(``source/kernel.cpp:21-30``: minZ/maxZ apply only in 3D); boundary cells keep
the destination grid's previous contents. Here the same contract is a mask
combined with ``jnp.where``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .domain import Domain


def interior_mask(dom: Domain, bnd: int):
    """Boolean [z,y,x] mask, True on cells a bnd=`bnd` kernel visits.

    Built from iota comparisons so that inside a trace it is PROGRAM (fused
    compares), not a captured numpy constant — captured grid-sized consts
    cost HBM reads on TPU and trip a jax 0.9.0 cpp-jit bug where a fresh
    executable's lifted consts stop being supplied after any prior
    fast-path dispatch ("supplied N buffers but expected M")."""
    if bnd <= 0:
        return jnp.ones(dom.shape, dtype=bool)
    sz, sy, sx = dom.shape
    ix = jnp.arange(sx, dtype=jnp.int32).reshape(1, 1, sx)
    iy = jnp.arange(sy, dtype=jnp.int32).reshape(1, sy, 1)
    m = ((ix >= bnd) & (ix < sx - bnd) & (iy >= bnd) & (iy < sy - bnd))
    if dom.is3d:
        iz = jnp.arange(sz, dtype=jnp.int32).reshape(sz, 1, 1)
        m = m & (iz >= bnd) & (iz < sz - bnd)
    return jnp.broadcast_to(m, dom.shape)


def axis_index(dom: Domain, axis: str):
    """Broadcastable int32 index array along 'x' | 'y' | 'z'."""
    sz, sy, sx = dom.shape
    if axis == "x":
        return jnp.arange(sx, dtype=jnp.int32).reshape(1, 1, sx)
    if axis == "y":
        return jnp.arange(sy, dtype=jnp.int32).reshape(1, sy, 1)
    if axis == "z":
        return jnp.arange(sz, dtype=jnp.int32).reshape(sz, 1, 1)
    raise ValueError(axis)


# Axis numbering for [z, y, x] arrays.
AX_Z, AX_Y, AX_X = 0, 1, 2
_AXIS_OF = {"x": AX_X, "y": AX_Y, "z": AX_Z}


def shift(a, d: int, axis: str):
    """shift(a, d, 'x')[k,j,i] == a[k,j,i+d], with wrap-around at the edges.

    Wrapped entries are garbage by contract: every caller masks them out via
    interior/boundary masks, exactly as reference bnd=N kernels guarantee
    neighbor accesses stay in bounds.
    """
    if d == 0:
        return a
    return jnp.roll(a, -d, axis=_AXIS_OF[axis] - 3)


def shift_clamp(a, d: int, axis: str):
    """shift with edge-clamped (not wrapped) out-of-range entries."""
    if d == 0:
        return a
    ax = _AXIS_OF[axis] - 3  # negative axis: works for (Z,Y,X) and (C,Z,Y,X)
    n = a.shape[ax]
    idx = jnp.clip(jnp.arange(n) + d, 0, n - 1)
    return jnp.take(a, idx, axis=ax)
