"""Fast semi-Lagrangian advection via bounded-window shift-select.

TPU has no fast hardware gather: XLA lowers the 8-corner interpolation
gathers of ops/advection.py to ~30 ms/pass at 128^3. But semi-Lagrangian
backtraces are bounded by the CFL number, so the gather can be recast as a
select over a static (2K+2)^3 neighborhood window — pure rolls, compares,
and FMAs that XLA fuses, ~5x faster, and the MacCormack clamp's corner
min/max falls out of the same pass for free.

Semantics match ops/advection.py (and the reference SemiLagrange /
MacCormackClamp clampMode=2 path) EXCEPT:
- backtrace displacement is clamped to +-K cells (identical results whenever
  max|u|*dt <= K, i.e. CFL <= K — the regime every reference scene runs in);
- corner bases use floor instead of C truncation (differs only for
  out-of-grid negative positions, which border clamping masks);
- clampMode=1's extra backward-position min/max and obstacle checks are not
  implemented — mode 2 (the default everywhere) is.

Used by models/* fused pipelines via params.window; scene-API ops keep the
exact gather path.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import flags as fl
from ..core import mac as macops
from ..core.domain import Domain
from ..core.masks import interior_mask, shift
from .advection import (_cell_centers, _maccormack_correct,
                        _maccormack_correct_mac, _axis_coord,
                        apply_outflow_bc)

_BIG = float(3.4e38)  # python float: inlines as a literal, never a device-const buffer


def _rel_weights(pos, coord, n: int, k: int):
    """Relative corner offset + fraction for one axis, with displacement
    clamped to the window and border clamping (BUILD_INDEX equivalent)."""
    p = pos - 0.5  # cell-centered convention
    rel = jnp.clip(p - coord, -k, k)          # displacement clamp
    p_abs = jnp.clip(coord + rel, 0.0, n - 1)  # border clamp
    rel = p_abs - coord
    base = jnp.floor(rel).astype(jnp.int32)
    # cap the base so corner+1 stays in range (exact-path BUILD_INDEX
    # clamps i0 to [0, n-2]; frac saturates to 1 at the top border)
    base = jnp.minimum(base, (n - 2 - coord).astype(jnp.int32))
    frac = rel - base.astype(rel.dtype)
    return base, frac


def window_interp(src, pos_x, pos_y, pos_z, dom: Domain, k: int,
                  ok_mask=None, want_minmax: bool = False):
    """Trilinear interpolation by window select. Optionally returns
    (value, minv, maxv, have) over corners passing ok_mask (for the
    MacCormack clamp, doClampComponent mode-2 corner set)."""
    sz, sy, sx = dom.shape
    cx = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx)
    cy = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1)
    cz = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1)
    nx, fx = _rel_weights(pos_x, cx, sx, k)
    ny, fy = _rel_weights(pos_y, cy, sy, k)
    if dom.is3d:
        nz, fz = _rel_weights(pos_z, cz, sz, k)
        z_offsets = range(-k, k + 2)
    else:
        nz = jnp.zeros(dom.shape, jnp.int32)
        fz = jnp.zeros(dom.shape, jnp.float32)
        z_offsets = [0]

    out = jnp.zeros(dom.shape, jnp.float32)
    if want_minmax:
        minv = jnp.full(dom.shape, _BIG)
        maxv = jnp.full(dom.shape, -_BIG)
        have = jnp.zeros(dom.shape, dtype=bool)

    for oz in z_offsets:
        if dom.is3d:
            wz = jnp.where(nz == oz, 1.0 - fz,
                           jnp.where(nz == oz - 1, fz, 0.0))
            sel_z = (nz == oz) | (nz == oz - 1)
            rz = shift(src, oz, "z")
            okz = shift(ok_mask, oz, "z") if ok_mask is not None else None
        else:
            wz = 1.0
            sel_z = True
            rz = src
            okz = ok_mask
        for oy in range(-k, k + 2):
            wy = jnp.where(ny == oy, 1.0 - fy,
                           jnp.where(ny == oy - 1, fy, 0.0))
            sel_y = (ny == oy) | (ny == oy - 1)
            ry = shift(rz, oy, "y")
            oky = shift(okz, oy, "y") if okz is not None else None
            # x-inner: value select + (optional) corner min/max
            acc_x = jnp.zeros(dom.shape, jnp.float32)
            for ox in range(-k, k + 2):
                wx = jnp.where(nx == ox, 1.0 - fx,
                               jnp.where(nx == ox - 1, fx, 0.0))
                rx = shift(ry, ox, "x")
                acc_x = acc_x + wx * rx
                if want_minmax:
                    sel = ((nx == ox) | (nx == ox - 1)) & sel_y & sel_z
                    if oky is not None:
                        okx = shift(oky, ox, "x")
                        sel = sel & okx
                    minv = jnp.where(sel & (rx < minv), rx, minv)
                    maxv = jnp.where(sel & (rx > maxv), rx, maxv)
                    have = have | sel
            out = out + (wz * wy) * acc_x
    if want_minmax:
        return out, minv, maxv, have
    return out


def _trace_centered_fast(vel, dt, dom: Domain):
    xx, yy, zz = _cell_centers(dom)
    c = macops.get_centered(vel)
    return xx - c[0] * dt, yy - c[1] * dt, zz - c[2] * dt


def advect_real_fast(flags, vel, grid, dt, dom: Domain, k: int,
                     order: int = 2, strength: float = 1.0):
    """Order-1/2 scalar advection (clampMode=2) on the window path."""
    inter = interior_mask(dom, 1)
    px, py, pz = _trace_centered_fast(vel, dt, dom)
    ok = (flags & (fl.TypeFluid | fl.TypeEmpty)) != 0
    if order == 1:
        fwd = window_interp(grid, px, py, pz, dom, k)
        return jnp.where(inter, fwd, 0.0)
    fwd, minv, maxv, have = window_interp(grid, px, py, pz, dom, k,
                                          ok_mask=ok, want_minmax=True)
    fwd = jnp.where(inter, fwd, 0.0)
    bx, by, bz = _trace_centered_fast(vel, -dt, dom)
    bwd = window_interp(fwd, bx, by, bz, dom, k)
    bwd = jnp.where(inter, bwd, 0.0)
    new = _maccormack_correct(flags, grid, fwd, bwd, strength)
    out_of = (new < minv) | (new > maxv) | ~have
    clamped = jnp.where(out_of, fwd, new)
    return jnp.where(inter, clamped, new)


def _sl_mac_fast(flags, vel, src, dt, dom: Domain, k: int,
                 want_minmax: bool):
    """Per-component MAC semi-Lagrange on the window path
    (SemiLagrangeMAC orderTrace=1 semantics)."""
    xx, yy, zz = _cell_centers(dom)
    getters = [macops.at_mac_x, macops.at_mac_y, macops.at_mac_z]
    n_comp = 3 if dom.is3d else 2
    comps, mms = [], []
    for c in range(n_comp):
        vface = getters[c](vel)
        px = xx - vface[0] * dt
        py = yy - vface[1] * dt
        pz = zz - vface[2] * dt
        if want_minmax:
            v, mn, mx, _ = window_interp(src[c], px, py, pz, dom, k,
                                         want_minmax=True)
            mms.append((mn, mx))
        else:
            v = window_interp(src[c], px, py, pz, dom, k)
        comps.append(v)
    if not dom.is3d:
        comps.append(jnp.zeros_like(comps[0]))
    dst = jnp.stack(comps)
    dst = jnp.where(interior_mask(dom, 1)[None], dst, 0.0)
    return dst, mms


def advect_mac_fast(flags, vel, grid, dt, dom: Domain, k: int,
                    order: int = 2, strength: float = 1.0):
    """Order-1/2 MAC self-advection (clampMode=2) on the window path."""
    inter = interior_mask(dom, 1)
    if order == 1:
        fwd, _ = _sl_mac_fast(flags, vel, grid, dt, dom, k, False)
        return apply_outflow_bc(flags, fwd, grid, dt, dom)
    fwd, mms = _sl_mac_fast(flags, vel, grid, dt, dom, k, True)
    bwd, _ = _sl_mac_fast(flags, vel, fwd, -dt, dom, k, False)
    new = _maccormack_correct_mac(flags, grid, fwd, bwd, strength, dom)
    # clamp (doClampComponentMAC mode 2: min/max over fwd corners, plus the
    # front check at the face's two adjacent cells)
    ok_flag = (flags & (fl.TypeFluid | fl.TypeEmpty)) != 0
    axes = ["x", "y", "z"]
    comps = [new[c] for c in range(3)]
    n_comp = 3 if dom.is3d else 2
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
    return apply_outflow_bc(flags, out, grid, dt, dom)
