"""Initialization / emission plugins.

Behavioral port of ``source/plugin/initplugins.cpp``: KnApplyNoiseInfl /
densityInflow (:27-43), KnAddNoise/addNoise (:45-51), applyEmission (:126),
checkSymmetry (:189), blurRealGrid/blurMacGrid (:641/:653).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.shapes import Shape, _cell_centers


def density_inflow(flags, density, noise, shape: Shape, dom: Domain,
                   scale: float = 1.0, sigma: float = 0.0, time: float = 0.0):
    """densityInflow: noise-modulated emission inside a shape's SDF band
    (initplugins.cpp:27-43). Raises density toward the noise target."""
    sdf = shape.compute_levelset(dom)
    px, py, pz = _cell_centers(dom)
    # KnApplyNoiseInfl evaluates at integer coords Vec3(i,j,k)
    val = noise.evaluate(px - 0.5, py - 0.5, pz - 0.5, time=time)
    if sigma > 0:
        factor = jnp.clip(1.0 - 0.5 / sigma * (sdf + sigma), 0.0, 1.0)
    else:
        factor = jnp.where(sdf <= 0.0, 1.0, 0.0)
    target = val * scale * factor
    ok = fl.is_fluid(flags) & (sdf <= sigma)
    return jnp.where(ok & (density < target), target, density)


def add_noise(flags, density, noise, dom: Domain, sdf=None, scale: float = 1.0,
              time: float = 0.0):
    """addNoise (initplugins.cpp:45-51)."""
    px, py, pz = _cell_centers(dom)
    val = noise.evaluate(px - 0.5, py - 0.5, pz - 0.5, time=time)
    ok = fl.is_fluid(flags)
    if sdf is not None:
        ok = ok & (sdf <= 0.0)
    return jnp.where(ok, density + val * scale, density)


def apply_emission(flags, target, source, dom: Domain, emission_texture=None,
                   is_absolute: bool = True):
    """applyEmission (initplugins.cpp:110-137): stamp source into target in
    fluid cells; absolute=max semantics, additive otherwise."""
    ok = fl.is_fluid(flags)
    if emission_texture is not None:
        ok = ok & (emission_texture > 0.0)
    if is_absolute:
        return jnp.where(ok, jnp.maximum(target, source), target)
    return jnp.where(ok, target + source, target)


def check_symmetry(arr, dom: Domain, axis: int = 0, bound: int = 0):
    """Max asymmetry of a scalar grid when mirrored along `axis`
    (checkSymmetry, initplugins.cpp:189). Returns a scalar."""
    jax_axis = {0: 2, 1: 1, 2: 0}[axis]
    flipped = jnp.flip(arr, axis=jax_axis)
    diff = jnp.abs(arr - flipped)
    return jnp.max(diff)


def _gauss_kernel_1d(sigma: float):
    import numpy as np
    # mantaflow's GaussianKernelCreator: radius chosen so the tail < 1e-2
    radius = max(1, int(2.0 * sigma + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return jnp.asarray(k.astype(np.float32)), radius


def blur_real_grid(grid, dom: Domain, sigma: float = 1.0):
    """Separable gaussian blur (blurRealGrid, initplugins.cpp:653)."""
    k, radius = _gauss_kernel_1d(sigma)
    out = grid
    axes = [2, 1] + ([0] if dom.is3d else [])
    for ax in axes:
        acc = jnp.zeros_like(out)
        n = out.shape[ax]
        for m in range(-radius, radius + 1):
            idx = jnp.clip(jnp.arange(n) + m, 0, n - 1)
            acc = acc + k[m + radius] * jnp.take(out, idx, axis=ax)
        out = acc
    return out


def blur_mac_grid(vel, dom: Domain, sigma: float = 1.0):
    """blurMacGrid (initplugins.cpp:641): per-component gaussian blur."""
    return jnp.stack([blur_real_grid(vel[c], dom, sigma) for c in range(3)])
