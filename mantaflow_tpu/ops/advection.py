"""Semi-Lagrangian / MacCormack advection.

Behavioral port of ``source/plugin/advection.cpp`` (SemiLagrange :25,
SemiLagrangeMAC :45, MacCormackCorrect :82/:96, doClampComponent :144/:192,
MacCormackClamp :242/:272, applyOutflowBC :388, driver fnAdvectSemiLagrange
:294/:407) re-expressed as pure whole-grid JAX ops: the backtrace+interp is
one fused gather program instead of a per-cell kernel.

All functions take/return raw arrays ([z,y,x] scalars, (3,z,y,x) MAC) and are
jit-safe with static config arguments.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import flags as fl
from ..core import mac as macops
from ..core.domain import Domain, domain_from_shape
from ..core.interp import interpol, interpol_hi, interpol_mac
from ..core.masks import interior_mask, shift


def _cell_centers(dom: Domain):
    sz, sy, sx = dom.shape
    dt = jnp.float32
    x = jnp.arange(sx, dtype=dt).reshape(1, 1, sx) + 0.5
    y = jnp.arange(sy, dtype=dt).reshape(1, sy, 1) + 0.5
    z = jnp.arange(sz, dtype=dt).reshape(sz, 1, 1) + 0.5
    zz, yy, xx = jnp.broadcast_to(z, dom.shape), jnp.broadcast_to(y, dom.shape), jnp.broadcast_to(x, dom.shape)
    return xx, yy, zz


def _trace_centered(vel, dt, dom: Domain, order_trace: int):
    """Backtraced sample positions for cell-centered advection
    (SemiLagrange, advection.cpp:28-38)."""
    xx, yy, zz = _cell_centers(dom)
    c = macops.get_centered(vel)
    if order_trace == 1:
        return xx - c[0] * dt, yy - c[1] * dt, zz - c[2] * dt
    if order_trace == 2:
        px = xx - c[0] * dt * 0.5
        py = yy - c[1] * dt * 0.5
        pz = zz - c[2] * dt * 0.5
        u, v, w = interpol_mac(vel, px, py, pz)
        return xx - u * dt, yy - v * dt, zz - w * dt
    raise ValueError(f"Unknown backtracing order {order_trace}")


def semi_lagrange(flags, vel, src, dt, dom: Domain, order_space: int = 1,
                  order_trace: int = 1):
    """One SL step for a cell-centered scalar grid; boundary ring (bnd=1)
    is zero, as the reference writes into a fresh temp grid. order_space=2
    uses cubic interpolation (getInterpolatedHi, interpolHigh.h)."""
    px, py, pz = _trace_centered(vel, dt, dom, order_trace)
    dst = interpol_hi(src, px, py, pz, order_space)
    return jnp.where(interior_mask(dom, 1), dst, jnp.zeros_like(dst))


def semi_lagrange_mac(flags, vel, src, dt, dom: Domain, order_space: int = 1,
                      order_trace: int = 1):
    """One SL step for a MAC grid (SemiLagrangeMAC, advection.cpp:45-77).

    Each component backtraces from its own face using the full velocity
    there, then looks up that component with the cell-centered convention
    (the lookup field carries the same face shift, so no coordinate
    adjustment: advection.cpp:49).
    """
    del order_space
    xx, yy, zz = _cell_centers(dom)
    comps = []
    getters = [macops.at_mac_x, macops.at_mac_y, macops.at_mac_z]
    n_comp = 3 if dom.is3d else 2
    if order_trace == 1:
        for c in range(n_comp):
            vface = getters[c](vel)
            px = xx - vface[0] * dt
            py = yy - vface[1] * dt
            pz = zz - vface[2] * dt
            comps.append(interpol(src[c], px, py, pz))
    elif order_trace == 2:
        # midpoint trace per component (advection.cpp:59-73); note the
        # reference uses src (not vel) for the trace here.
        offs = [(0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 0.5)]
        for c in range(n_comp):
            ox, oy, oz = offs[c]
            vface = getters[c](src)
            p1x = (xx - ox) - vface[0] * dt * 0.5
            p1y = (yy - oy) - vface[1] * dt * 0.5
            p1z = (zz - oz) - vface[2] * dt * 0.5
            u, v, w = interpol_mac(src, p1x, p1y, p1z)
            px = xx - u * dt
            py = yy - v * dt
            pz = zz - w * dt
            comps.append(interpol(src[c], px, py, pz))
    else:
        raise ValueError(f"Unknown backtracing order {order_trace}")
    if not dom.is3d:
        comps.append(jnp.zeros_like(comps[0]))
    dst = jnp.stack(comps)
    return jnp.where(interior_mask(dom, 1)[None], dst, jnp.zeros_like(dst))


def _maccormack_correct(flags, old, fwd, bwd, strength: float):
    """dst = fwd + strength*0.5*(old-bwd) in fluid cells (advection.cpp:82-93)."""
    corr = fwd + strength * 0.5 * (old - bwd)
    return jnp.where(fl.is_fluid(flags), corr, fwd)


def _maccormack_correct_mac(flags, old, fwd, bwd, strength: float, dom: Domain):
    """Per-component fluid check incl. the lower face neighbor
    (MacCormackCorrectMAC, advection.cpp:96-117)."""
    fluid = fl.is_fluid(flags)
    axes = ["x", "y", "z"]
    comps = []
    for c in range(3):
        ok = fluid
        # skip if lower neighbor along c is not fluid (guarded i>0 etc.)
        nb_fluid = shift(fluid, -1, axes[c])
        at_edge = _axis_coord(dom, axes[c]) == 0
        ok = ok & (nb_fluid | at_edge)
        corr = fwd[c] + strength * 0.5 * (old[c] - bwd[c])
        comps.append(jnp.where(ok, corr, fwd[c]))
    return jnp.stack(comps)


def _axis_coord(dom: Domain, axis: str):
    from ..core.masks import axis_index
    return axis_index(dom, axis)


def _corner_minmax(orig, ok_mask, ix, iy, iz, dom: Domain):
    """min/max (and any-ok) over the 2x2x2 cell corners at integer position
    (doClampComponent's getMinMax loop). ix/iy/iz are int32 arrays already
    truncated toward zero; clamped here to [0, size-2] per the reference.

    Packed-row form: values (+ optional ok flags) for all corners come from
    ONE row gather (see core/interp.py packed-corner rationale)."""
    from ..core.interp import build_corner_table
    sz, sy, sx = dom.shape
    i0 = jnp.clip(ix, 0, sx - 2)
    j0 = jnp.clip(iy, 0, sy - 2)
    k0 = jnp.clip(iz, 0, sz - 2) if dom.is3d else jnp.zeros_like(iz)

    if ok_mask is not None:
        packed = jnp.concatenate(
            [build_corner_table(orig),
             build_corner_table(ok_mask.astype(jnp.float32))], axis=1)
    else:
        packed = build_corner_table(orig)
    nc = 8 if dom.is3d else 4
    base = ((k0 * sy + j0) * sx + i0).reshape(-1)
    rows = packed[base]
    vals = rows[:, :nc]
    big = jnp.float32(3.4e38)
    if ok_mask is not None:
        ok = rows[:, nc:2 * nc] > 0.5
        minv = jnp.min(jnp.where(ok, vals, big), axis=1)
        maxv = jnp.max(jnp.where(ok, vals, -big), axis=1)
        have = jnp.any(ok, axis=1)
    else:
        minv = jnp.min(vals, axis=1)
        maxv = jnp.max(vals, axis=1)
        have = jnp.ones(base.shape, dtype=bool)
    return (minv.reshape(ix.shape), maxv.reshape(ix.shape),
            have.reshape(ix.shape))


def _trunc(x):
    """C-style (int) cast: truncation toward zero (toVec3i)."""
    return x.astype(jnp.int32)


def _maccormack_clamp(flags, vel, dst, orig, fwd, dt, clamp_mode: int,
                      dom: Domain):
    """MacCormackClamp for cell-centered grids (advection.cpp:242-270)."""
    xx, yy, zz = _cell_centers(dom)
    c = macops.get_centered(vel)
    vx, vy, vz = c[0] * dt, c[1] * dt, c[2] * dt
    # positions use Vec3(i,j,k) (integer cell coords) in doClampComponent
    gx, gy, gz = xx - 0.5, yy - 0.5, zz - 0.5
    ok_mask = (flags & (fl.TypeFluid | fl.TypeEmpty)) != 0

    minv, maxv, have = _corner_minmax(
        orig, ok_mask, _trunc(gx - vx), _trunc(gy - vy), _trunc(gz - vz), dom)
    if clamp_mode == 1:
        minv2, maxv2, have2 = _corner_minmax(
            orig, ok_mask, _trunc(gx + vx), _trunc(gy + vy), _trunc(gz + vz), dom)
        minv = jnp.minimum(minv, minv2)
        maxv = jnp.maximum(maxv, maxv2)
        have = have | have2
        clamped = jnp.clip(dst, minv, maxv)
    else:
        out = (dst < minv) | (dst > maxv)
        clamped = jnp.where(out, fwd, dst)
    res = jnp.where(have, clamped, fwd)

    if clamp_mode == 1:
        # revert to fwd when fwd/bwd lookups leave the grid or hit obstacles
        # (advection.cpp:254-266)
        pfx, pfy, pfz = _trunc(xx - vx), _trunc(yy - vy), _trunc(zz - vz)
        pbx, pby, pbz = _trunc(xx + vx), _trunc(yy + vy), _trunc(zz + vz)
        sz_, sy_, sx_ = dom.shape

        def bad(px, py, pz):
            b = (px < 0) | (py < 0) | (pz < 0) | (px > sx_ - 1) | (py > sy_ - 1)
            if dom.is3d:
                b = b | (pz > sz_ - 1)
            cx = jnp.clip(px, 0, sx_ - 1)
            cy = jnp.clip(py, 0, sy_ - 1)
            cz = jnp.clip(pz, 0, sz_ - 1)
            return b | fl.is_obstacle(flags[cz, cy, cx])

        res = jnp.where(bad(pfx, pfy, pfz) | bad(pbx, pby, pbz), fwd, res)

    return jnp.where(interior_mask(dom, 1), res, dst)


def _maccormack_clamp_mac(flags, vel, dst, orig, fwd, dt, clamp_mode: int,
                          dom: Domain):
    """MacCormackClampMAC (advection.cpp:272-291, doClampComponentMAC :192)."""
    xx, yy, zz = _cell_centers(dom)
    gx, gy, gz = xx - 0.5, yy - 0.5, zz - 0.5  # Vec3(i,j,k)
    getters = [macops.at_mac_x, macops.at_mac_y, macops.at_mac_z]
    axes = ["x", "y", "z"]
    ok_flag = (flags & (fl.TypeFluid | fl.TypeEmpty)) != 0
    n_comp = 3 if dom.is3d else 2
    comps = [dst[c] for c in range(3)]
    for c in range(n_comp):
        vface = getters[c](vel)
        vx, vy, vz = vface[0] * dt, vface[1] * dt, vface[2] * dt
        minv, maxv, _ = _corner_minmax(
            orig[c], None, _trunc(gx - vx), _trunc(gy - vy), _trunc(gz - vz), dom)
        if clamp_mode == 1:
            minv2, maxv2, _ = _corner_minmax(
                orig[c], None, _trunc(gx + vx), _trunc(gy + vy), _trunc(gz + vz), dom)
            minv = jnp.minimum(minv, minv2)
            maxv = jnp.maximum(maxv, maxv2)
            val = jnp.clip(dst[c], minv, maxv)
        else:
            out = (dst[c] < minv) | (dst[c] > maxv)
            val = jnp.where(out, fwd[c], dst[c])
        if clamp_mode == 2:
            # revert to 1st order near non fluid/empty faces (advection.cpp:205-208)
            nb_ok = shift(ok_flag, -1, axes[c])
            edge = _axis_coord(dom, axes[c]) == 0
            front = ok_flag & (nb_ok | edge)
            # note: reference reads flags at unclamped oPos/nbPos which are
            # always in bounds for the bnd=1 iteration space
            val = jnp.where(front, val, fwd[c])
        comps[c] = jnp.where(interior_mask(dom, 1), val, dst[c])
    return jnp.stack(comps)


# ---------------------------------------------------------------------------
# outflow boundary handling (applyOutflowBC, advection.cpp:327-396)

def _shifted_mask(mask, d: int, axis: str, dom: Domain):
    """Shift a boolean mask; out-of-bounds entries become False
    (flags.isInBounds check in the reference)."""
    from ..core.masks import axis_index
    res = shift(mask, d, axis)
    n = dom.shape[{"z": 0, "y": 1, "x": 2}[axis]]
    idx = axis_index(dom, axis)
    valid = (idx + d >= 0) & (idx + d < n)
    return res & valid


def apply_outflow_bc(flags, vel, vel_prev, dt, dom: Domain):
    """Convective open-boundary extrapolation into outflow cells
    (extrapolateVelConvectiveBC + copyChangedVels, advection.cpp:347-396)."""
    ts = jnp.maximum(1.0, dt * 4.0)
    fluid = fl.is_fluid(flags)
    outflow = fl.is_outflow(flags)
    fl_or_out = fluid | outflow

    # bulk velocity: 3x3x(3|1) neighborhood average over fluid/outflow cells
    rng = [-1, 0, 1]
    zrng = rng if dom.is3d else [0]
    acc = jnp.zeros_like(vel)
    cnt = jnp.zeros(dom.shape, dtype=vel.dtype)
    for dz in zrng:
        for dy in rng:
            for dx in rng:
                m = fl_or_out
                v = vel
                for d, ax in ((dx, "x"), (dy, "y"), (dz, "z")):
                    if d != 0:
                        m = _shifted_mask(m, d, ax, dom)
                        v = shift(v, d, ax)
                mf = m.astype(vel.dtype)
                acc = acc + v * mf[None]
                cnt = cnt + mf
    bulk = jnp.where(cnt[None] > 0, acc / jnp.maximum(cnt[None], 1), 0.0)

    axes = ["x", "y", "z"]
    n_comp = 3 if dom.is3d else 2
    dst = jnp.zeros_like(vel)
    total = jnp.zeros(dom.shape, dtype=vel.dtype)
    delta = vel - vel_prev
    for c in range(n_comp):
        ax = axes[c]
        factor = ts * jnp.maximum(1.0, bulk[c])
        fl_m1 = _shifted_mask(fluid, -1, ax, dom)
        fl_p1 = _shifted_mask(fluid, 1, ax, dom)
        fl_m2 = _shifted_mask(fluid, -2, ax, dom)
        fl_p2 = _shifted_mask(fluid, 2, ax, dom)
        d0 = fl_m1 | fl_p1
        lower = jnp.where(d0, fl_m1, fl_m2)
        upper = jnp.where(d0, fl_p1, fl_p2)
        contrib_low = delta / factor[None] + shift(vel, -1, ax)
        contrib_up = delta / factor[None] + shift(vel, 1, ax)
        dst = dst + jnp.where(lower[None], contrib_low, 0.0)
        dst = dst + jnp.where(upper[None], contrib_up, 0.0)
        total = total + lower.astype(vel.dtype) + upper.astype(vel.dtype)
    dst = jnp.where(total[None] > 0, dst / jnp.maximum(total[None], 1.0), dst)
    return jnp.where(outflow[None], dst, vel)


# ---------------------------------------------------------------------------
# drivers

def advect_real(flags, vel, grid, dt, order: int = 1, strength: float = 1.0,
                order_space: int = 1, clamp_mode: int = 2,
                order_trace: int = 1):
    """advectSemiLagrange for Real/levelset grids (advection.cpp:294-322)."""
    dom = domain_from_shape(grid.shape)
    fwd = semi_lagrange(flags, vel, grid, dt, dom, order_space, order_trace)
    if order == 1:
        return fwd
    if order == 2:
        bwd = semi_lagrange(flags, vel, fwd, -dt, dom, order_space, order_trace)
        new = _maccormack_correct(flags, grid, fwd, bwd, strength)
        return _maccormack_clamp(flags, vel, new, grid, fwd, dt, clamp_mode, dom)
    raise ValueError("advectSemiLagrange: only order 1 and 2 supported")


def advect_vec3(flags, vel, grid, dt, order: int = 1, strength: float = 1.0,
                order_space: int = 1, clamp_mode: int = 2,
                order_trace: int = 1):
    """advectSemiLagrange for cell-centered Vec3 grids
    (fnAdvectSemiLagrange<Grid<Vec3>>, advection.cpp:294-322).

    SemiLagrange<Vec3>, MacCormackCorrect<Vec3> and doClampComponent<Vec3>
    all act component-wise with positions/masks shared across components,
    so this is exactly per-component scalar advection."""
    return jnp.stack([advect_real(flags, vel, grid[c], dt, order, strength,
                                  order_space, clamp_mode, order_trace)
                      for c in range(3)])


def advect_mac(flags, vel, grid, dt, order: int = 1, strength: float = 1.0,
               order_space: int = 1, clamp_mode: int = 2,
               order_trace: int = 1):
    """advectSemiLagrange specialization for MAC grids (advection.cpp:407-441)."""
    dom = domain_from_shape(grid.shape[-3:])
    fwd = semi_lagrange_mac(flags, vel, grid, dt, dom, order_space, order_trace)
    if order == 1:
        return apply_outflow_bc(flags, fwd, grid, dt, dom)
    if order == 2:
        bwd = semi_lagrange_mac(flags, vel, fwd, -dt, dom, order_space, order_trace)
        new = _maccormack_correct_mac(flags, grid, fwd, bwd, strength, dom)
        new = _maccormack_clamp_mac(flags, vel, new, grid, fwd, dt, clamp_mode, dom)
        return apply_outflow_bc(flags, new, grid, dt, dom)
    raise ValueError("advectSemiLagrange: only order 1 and 2 supported")
