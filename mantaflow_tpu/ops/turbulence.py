"""Wavelet-turbulence up-res and related grid utilities.

Behavioral port of ``source/plugin/waveletturbulence.cpp``:
interpolateGrid[Vec3] (:37/:51), interpolateMACGrid (:73),
applySimpleNoise[Vec3|Real] (:94/:112), applyNoiseVec3 (:156),
computeEnergy (:191), computeWaveletCoeffs (:197 +
WaveletNoiseField::computeCoefficients, noisefield.cpp:233-292),
computeVorticity (:204), computeStrainRateMag (:232),
extrapolateSimpleFlags (:293), getCurl (:310), plus the UV-coordinate
machinery (grid.cpp:576-640: resetUvGrid, updateUvWeight).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import flags as fl
from ..core import mac as macops
from ..core.domain import Domain
from ..core.interp import interpol, interpol_hi, interpol_mac
from ..core.masks import interior_mask, shift
from ..utils.noise import _A_COEFFS, _P_COEFFS, WaveletNoiseField


def _cell_pos(dom: Domain, factor, offset):
    sz, sy, sx = dom.shape
    x = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx)
    y = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1)
    z = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1)
    px = jnp.broadcast_to(x * factor[0] + offset[0], dom.shape)
    py = jnp.broadcast_to(y * factor[1] + offset[1], dom.shape)
    pz = jnp.broadcast_to(z * factor[2] + offset[2], dom.shape)
    return px, py, pz


def _size_factor(src_size, tgt_size, scale=(1.0, 1.0, 1.0),
                 offset=(0.0, 0.0, 0.0)):
    """calcGridSizeFactorMod (waveletturbulence.cpp:24-36): grid-resolution
    conversion factor + half-cell shift."""
    f = tuple(float(src_size[c]) / tgt_size[c] / scale[c] for c in range(3))
    off = tuple(-offset[c] * f[c] + f[c] * 0.5 for c in range(3))
    return f, off


def interpolate_grid(target_dom: Domain, source, src_dom: Domain,
                     scale=(1.0, 1.0, 1.0), offset=(0.0, 0.0, 0.0),
                     order_space: int = 1):
    """interpolateGrid: resample a scalar grid to a new resolution."""
    f, off = _size_factor(src_dom.size, target_dom.size, scale, offset)
    px, py, pz = _cell_pos(target_dom, f, off)
    return interpol_hi(source, px, py, pz, order_space)


def interpolate_grid_vec3(target_dom: Domain, source, src_dom: Domain,
                          scale=(1.0, 1.0, 1.0), offset=(0.0, 0.0, 0.0),
                          order_space: int = 1):
    f, off = _size_factor(src_dom.size, target_dom.size, scale, offset)
    px, py, pz = _cell_pos(target_dom, f, off)
    return jnp.stack([interpol_hi(source[c], px, py, pz, order_space)
                      for c in range(3)])


def interpolate_mac_grid(target_dom: Domain, source, src_dom: Domain,
                         scale=(1.0, 1.0, 1.0), offset=(0.0, 0.0, 0.0),
                         order_space: int = 1):
    """interpolateMACGrid: per-component sampling at face positions
    (waveletturbulence.cpp:60-71; pos = ijk*factor+off, minus half the face
    axis).

    orderSpace=2 quirk: KnInterpolateMACGrid shifts pos by -0.5 on the face
    axis, but interpolCubicMAC (interpolHigh.h:174-180) adds the same +0.5
    back before a plain component-wise Vec3 cubic lookup — the shifts cancel,
    so cubic-MAC == per-component cell-centered cubic at the UNSHIFTED pos
    (with interpolCubic's centered-linear fallback near borders).
    """
    f, off = _size_factor(src_dom.size, target_dom.size, scale, offset)
    sz, sy, sx = target_dom.shape
    x = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx)
    y = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1)
    z = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1)
    base = [jnp.broadcast_to(x * f[0] + off[0], target_dom.shape),
            jnp.broadcast_to(y * f[1] + off[1], target_dom.shape),
            jnp.broadcast_to(z * f[2] + off[2], target_dom.shape)]
    comps = []
    for c in range(3 if target_dom.is3d else 2):
        if order_space == 2:
            comps.append(interpol_hi(source[c], base[0], base[1], base[2], 2))
        else:
            p = list(base)
            p[c] = p[c] - 0.5
            u, v, w = interpol_mac(source, p[0], p[1], p[2])
            comps.append([u, v, w][c])
    if not target_dom.is3d:
        comps.append(jnp.zeros_like(comps[0]))
    return jnp.stack(comps)


# ---------------------------------------------------------------------------
# noise application

def apply_simple_noise_vec3(flags, target, noise: WaveletNoiseField,
                            dom: Domain, scale: float = 1.0, weight=None,
                            time: float = 0.0):
    """applySimpleNoiseVec3: add curl noise in fluid cells."""
    px, py, pz = _cell_pos(dom, (1, 1, 1), (0.5, 0.5, 0.5))
    cx, cy, cz = noise.evaluate_curl(px, py, pz, time)
    factor = weight if weight is not None else 1.0
    fluid = fl.is_fluid(flags)
    add = jnp.stack([cx, cy, cz]) * scale * factor
    return jnp.where(fluid[None], target + add, target)


def apply_simple_noise_real(flags, target, noise: WaveletNoiseField,
                            dom: Domain, scale: float = 1.0, weight=None,
                            time: float = 0.0):
    px, py, pz = _cell_pos(dom, (1, 1, 1), (0.5, 0.5, 0.5))
    val = noise.evaluate(px, py, pz, time)
    factor = weight if weight is not None else 1.0
    fluid = fl.is_fluid(flags)
    return jnp.where(fluid, target + val * scale * factor, target)


def apply_noise_vec3(flags, target, noise: WaveletNoiseField, dom: Domain,
                     scale: float = 1.0, scale_spatial: float = 1.0,
                     weight=None, weight_dom: Domain | None = None,
                     uv=None, uv_dom: Domain | None = None,
                     time: float = 0.0):
    """applyNoiseVec3 (waveletturbulence.cpp:120-170): curl noise evaluated
    at advected UV coordinates, with on-the-fly interpolation when the
    uv/weight grids live at a different resolution."""
    fluid = fl.is_fluid(flags)
    src_dom = uv_dom or weight_dom
    interpolate = src_dom is not None and src_dom.size != dom.size
    if interpolate:
        f = tuple(float(src_dom.size[c]) / dom.size[c] for c in range(3))
    else:
        f = (1.0, 1.0, 1.0)
    qx, qy, qz = _cell_pos(dom, f, (0.0, 0.0, 0.0))

    w = 1.0
    if weight is not None:
        w = interpol(weight, qx, qy, qz) if interpolate else weight

    if uv is not None:
        if interpolate:
            px = interpol(uv[0], qx, qy, qz) / f[0]
            py = interpol(uv[1], qx, qy, qz) / f[1]
            pz = interpol(uv[2], qx, qy, qz) / f[2]
        else:
            px, py, pz = uv[0], uv[1], uv[2]
    else:
        px, py, pz = _cell_pos(dom, (1, 1, 1), (0.5, 0.5, 0.5))
    px, py, pz = (px * scale_spatial, py * scale_spatial, pz * scale_spatial)

    cx, cy, cz = noise.evaluate_curl(px, py, pz, time)
    add = jnp.stack([cx, cy, cz]) * scale * w
    return jnp.where(fluid[None], target + add, target)


# ---------------------------------------------------------------------------
# energy / vorticity / wavelet weights

def compute_energy(flags, vel, dom: Domain):
    """computeEnergy: 0.5|v|^2 at cell centers of fluid cells."""
    c = macops.get_centered(vel)
    e = 0.5 * (c[0] ** 2 + c[1] ** 2 + c[2] ** 2)
    return jnp.where(fl.is_fluid(flags), e, 0.0)


def compute_vorticity(vel, dom: Domain):
    """computeVorticity: centered curl + norm. Returns (curl(3,...), norm).
    GetCentered/CurlOp are bnd=1 kernels in the reference — their boundary
    ring stays zero — so mask the ring here the same way."""
    from ..core.masks import interior_mask
    ring = interior_mask(dom, 1)[None]
    cc = jnp.where(ring, macops.get_centered(vel), 0.0)
    curl = jnp.where(ring, macops.curl_centered(cc), 0.0)
    norm = jnp.sqrt(curl[0] ** 2 + curl[1] ** 2 + curl[2] ** 2)
    return curl, norm


def get_curl(vel, dom: Domain, comp: int):
    curl, _ = compute_vorticity(vel, dom)
    return curl[comp]


def compute_strain_rate_mag(vel, dom: Domain):
    """computeStrainRateMag (waveletturbulence.cpp:210-238)."""
    c = macops.get_centered(vel)
    dgx = shift(vel[0], 1, "x") - vel[0]
    dgy = shift(vel[1], 1, "y") - vel[1]
    dgz = shift(vel[2], 1, "z") - vel[2] if dom.is3d else jnp.zeros_like(dgx)

    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))

    ux = jnp.stack([d1(c[i], "x") for i in range(3)])
    uy = jnp.stack([d1(c[i], "y") for i in range(3)])
    uz = (jnp.stack([d1(c[i], "z") for i in range(3)]) if dom.is3d
          else jnp.zeros_like(ux))
    s12 = 0.5 * (ux[1] + uy[0])
    s13 = 0.5 * (ux[2] + uz[0])
    s23 = 0.5 * (uy[2] + uz[1])
    s2 = (dgx ** 2 + dgy ** 2 + dgz ** 2
          + 2 * s12 ** 2 + 2 * s13 ** 2 + 2 * s23 ** 2)
    return jnp.where(interior_mask(dom, 1), s2, 0.0)


def _down_up_neumann(a, axis: int):
    """Per-axis band-pass smoothing with Neumann (clamped) boundaries
    (downsampleNeumann/upsampleNeumann, noisefield.cpp:194-231)."""
    n = a.shape[axis]
    half = n // 2
    i = np.arange(half)
    down = jnp.zeros(a.shape[:axis] + (half,) + a.shape[axis + 1:], a.dtype)
    for m in range(-16, 16):
        idx = np.clip(2 * i + m, 0, n - 1)
        down = down + float(_A_COEFFS[m + 16]) * jnp.take(a, idx, axis=axis)
    j = np.arange(n)
    up = jnp.zeros_like(a)
    for m in range(-1, 3):
        idx = np.clip(j // 2 + m, 0, half - 1)
        up = up + 0.5 * float(_P_COEFFS[m + 1]) * jnp.take(down, idx,
                                                           axis=axis)
    return up


def compute_wavelet_coeffs(grid, dom: Domain):
    """computeWaveletCoeffs: sqrt|band-pass residual|, then 6-neighbor
    smoothing (noisefield.cpp:233-292)."""
    smooth = grid
    axes = [2, 1] + ([0] if dom.is3d else [])
    for ax in axes:
        smooth = _down_up_neumann(smooth, ax)
    resid = jnp.sqrt(jnp.abs(grid - smooth))
    factor = 1.0 / 6.0 if dom.is3d else 1.0 / 4.0
    acc = (shift(resid, 1, "x") + shift(resid, -1, "x")
           + shift(resid, 1, "y") + shift(resid, -1, "y"))
    if dom.is3d:
        acc = acc + shift(resid, 1, "z") + shift(resid, -1, "z")
    out = acc * factor
    return jnp.where(interior_mask(dom, 1), out, grid)


# ---------------------------------------------------------------------------
# UV machinery (grid.cpp:576-640)

def reset_uv_grid(dom: Domain, offset=(0.0, 0.0, 0.0)):
    """resetUvGrid: uv = cell index (+offset)."""
    sz, sy, sx = dom.shape
    x = jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx) + offset[0]
    y = jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1) + offset[1]
    z = jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1) + offset[2]
    return jnp.stack([jnp.broadcast_to(x, dom.shape),
                      jnp.broadcast_to(y, dom.shape),
                      jnp.broadcast_to(z, dom.shape)])


def _uv_grid_time(t, reset_time):
    """computeUvGridTime (grid.cpp:582): C fmod(t/resetTime, 1) — keeps the
    sign of t (negative just before t=0, so the t=0 call does NOT reset)."""
    x = t / reset_time
    return jnp.fmod(x, 1.0)


def _uv_ramp(t):
    """computeUvRamp (grid.cpp:586): triangle wave in 0..1."""
    w = 2.0 * t
    return jnp.where(w > 1.0, 2.0 - w, w)


def update_uv_weight(reset_time: float, index: int, num_uvs: int, uv,
                     time: float, dt: float, dom: Domain,
                     offset=(0.0, 0.0, 0.0)):
    """updateUvWeight (grid.cpp:602-629): ramped blending weight for
    time-staggered UV sets, normalized over all sets; resets the uv grid
    when its cycle wraps (currt < lastt), and stores (weight,0,0) into
    cell 0 of the grid — the reference's in-band weight channel read back
    by getUvWeight. Returns (uv, weight)."""
    t_off = reset_time / num_uvs
    lastt = _uv_grid_time(time + index * t_off - dt, reset_time)
    currt = _uv_grid_time(time + index * t_off, reset_time)
    w = _uv_ramp(currt)
    total = sum(_uv_ramp(_uv_grid_time(time + i * t_off, reset_time))
                for i in range(num_uvs))
    w = jnp.where(total <= 1e-6, 1.0, w / jnp.maximum(total, 1e-6))
    do_reset = currt < lastt
    fresh = reset_uv_grid(dom, offset)
    uv = jnp.where(do_reset, fresh, uv)
    # uv[0] = Vec3(uvWeight, 0, 0)
    uv = uv.at[0, 0, 0, 0].set(w)
    uv = uv.at[1, 0, 0, 0].set(0.0)
    uv = uv.at[2, 0, 0, 0].set(0.0)
    return uv, w


def extrapolate_simple_flags(flags, val, dom: Domain, distance: int = 4,
                             flag_from: int = fl.TypeFluid,
                             flag_to: int = fl.TypeObstacle):
    """extrapolateSimpleFlags: BFS-flood `val` from flagFrom cells into
    flagTo cells (waveletturbulence.cpp:244-308)."""
    from .extrapolation import _nb_avg
    inter = interior_mask(dom, 1)
    tmp = jnp.where(inter & ((flags & flag_from) != 0), 1, 0).astype(jnp.int32)
    is_vec = val.ndim == 4
    comps = [val[c] for c in range(val.shape[0])] if is_vec else [val]
    for d in range(1, 1 + distance):
        upd = None
        new_comps = []
        for a in comps:
            avg, nbs = _nb_avg(a, tmp, d, dom)
            if upd is None:
                upd = ((tmp == 0) & (nbs > 0) & inter
                       & ((flags & flag_to) != 0))
            new_comps.append(jnp.where(upd, avg, a))
        comps = new_comps
        tmp = jnp.where(upd, d + 1, tmp)
    return jnp.stack(comps) if is_vec else comps[0]
