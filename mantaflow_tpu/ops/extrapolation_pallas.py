"""Pallas TPU kernels for BFS-layer extrapolation (ops/extrapolation.py).

The XLA form of one extrapolation layer launches per-component whole-grid
passes whose shifted marker/value reads each materialize in HBM — measured
15.9 ms for the two MAC extrapolations in the 128^3 developed FLIP step
(26% of the step). Here one kernel call advances ALL THREE components one
layer with a 3-z-plane window per field, so a layer costs one read + one
write of the six (marker, value) fields with every shift taken from VMEM.

Semantics are identical to extrapolation.py's update rule (behavioral port
of fastmarch.cpp:299-432): hit = int(marker_nb) == d over the 6-neighbor
stencil, avg = sum(hit*v)/max(nbs,1), upd = int(m)==0 & nbs>0 & interior,
v <- avg, m <- d+1. Markers travel as float32 (extrapolateMACFromWeight
keeps raw float weights in the boundary ring — reproduced).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.domain import Domain


def _sh2(a, dy: int, dx: int):
    """Static in-plane shift of (sy, sx), zero-filled: out[j,i] =
    a[j+dy, i+dx]. Zero fill is equality-safe: only non-interior positions
    read the fill, and those never update (see module docstring)."""
    sy, sx = a.shape
    if dy:
        z = jnp.zeros((abs(dy), sx), a.dtype)
        a = (jnp.concatenate([a[dy:], z], axis=0) if dy > 0
             else jnp.concatenate([z, a[:dy]], axis=0))
    if dx:
        z = jnp.zeros((sy, abs(dx)), a.dtype)
        a = (jnp.concatenate([a[:, dx:], z], axis=1) if dx > 0
             else jnp.concatenate([z, a[:, :dx]], axis=1))
    return a


def _extrap_layer_kernel(sc_ref, *refs, shape, n_pairs=3):
    """One BFS layer for ``n_pairs`` (marker, value) pairs. refs: per field
    [m0,v0,...] x 3 z-planes (dz=+1,0,-1) then 2*n_pairs outputs.
    sc_ref: [d, direction*1000, update_values] — direction is the additive
    offset extrapolateLsSimple applies per layer (0 for MAC fields);
    update_values=0 runs a marker-only layer (the levelset first layer
    marks neighbors without touching phi)."""
    sz, sy, sx = shape
    d = sc_ref[0]
    direction = sc_ref[1].astype(jnp.float32) / 1000.0
    upd_vals = sc_ref[2]
    t = pl.program_id(0)
    ins = refs[:6 * n_pairs]
    outs = refs[6 * n_pairs:]

    yi = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1)
    inter = ((yi >= 1) & (yi <= sy - 2) & (xi >= 1) & (xi <= sx - 2)
             & (t >= 1) & (t <= sz - 2))

    for c in range(n_pairs):
        def plane(fi, g):       # fi: 0=marker, 1=value; g: 0=t+1,1=t,2=t-1
            return ins[(c * 2 + fi) * 3 + g][0]

        m = plane(0, 1)
        v = plane(1, 1)
        acc = jnp.zeros((sy, sx), jnp.float32)
        nbs = jnp.zeros((sy, sx), jnp.float32)
        for mm, vv in (
                (_sh2(m, 0, 1), _sh2(v, 0, 1)),
                (_sh2(m, 0, -1), _sh2(v, 0, -1)),
                (_sh2(m, 1, 0), _sh2(v, 1, 0)),
                (_sh2(m, -1, 0), _sh2(v, -1, 0)),
                (plane(0, 0), plane(1, 0)),      # z+1
                (plane(0, 2), plane(1, 2))):     # z-1
            hit = (mm.astype(jnp.int32) == d).astype(jnp.float32)
            acc = acc + hit * vv
            nbs = nbs + hit
        avg = acc / jnp.maximum(nbs, 1.0) + direction
        upd = (m.astype(jnp.int32) == 0) & (nbs > 0) & inter
        outs[c * 2][0] = jnp.where(upd, (d + 1).astype(jnp.float32), m)
        outs[c * 2 + 1][0] = jnp.where(upd & (upd_vals > 0), avg, v)


@functools.lru_cache(maxsize=8)
def _layer_call(shape, interpret, n_pairs=3):
    sz, sy, sx = shape

    def zspec(dz):
        if dz == 0:
            return pl.BlockSpec((1, sy, sx), lambda t: (t, 0, 0),
                                memory_space=pltpu.VMEM)
        if dz == 1:
            return pl.BlockSpec((1, sy, sx),
                                lambda t: (jnp.minimum(t + 1, sz - 1), 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, sy, sx),
                            lambda t: (jnp.maximum(t - 1, 0), 0, 0),
                            memory_space=pltpu.VMEM)

    ospec = pl.BlockSpec((1, sy, sx), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM)
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for _ in range(2 * n_pairs):
        for dz in (1, 0, -1):
            specs.append(zspec(dz))
    kern = functools.partial(_extrap_layer_kernel, shape=shape,
                             n_pairs=n_pairs)
    call = pl.pallas_call(
        kern,
        grid=(sz,),
        in_specs=specs,
        out_specs=tuple([ospec] * (2 * n_pairs)),
        out_shape=tuple(jax.ShapeDtypeStruct(shape, jnp.float32)
                        for _ in range(2 * n_pairs)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )
    return call


def extrap_layers_pallas(vcomps, mcomps, dom: Domain, d_start: int,
                         n_layers: int, interpret: bool = False):
    """Advance all three (marker, value) pairs ``n_layers`` BFS layers
    starting at layer ``d_start``. vcomps/mcomps: lists of 3 (z,y,x)
    float32 arrays; returns updated lists."""
    call = _layer_call(dom.shape, interpret)
    for d in range(d_start, d_start + n_layers):
        # each field appears 3x: the three overlapping z-plane BlockSpecs
        # read the same array
        flat = []
        for c in range(3):
            for f in (mcomps[c], vcomps[c]):
                flat += [f, f, f]
        # scalars via full+concat: a list->asarray would bake a captured
        # const into the enclosing jit (see the const audit tests)
        sc = jnp.concatenate([jnp.full((1,), d, jnp.int32),
                              jnp.zeros((1,), jnp.int32),
                              jnp.ones((1,), jnp.int32)])
        out = call(sc, *flat)
        mcomps = [out[0], out[2], out[4]]
        vcomps = [out[1], out[3], out[5]]
    return vcomps, mcomps


def extrap_ls_layers_pallas(phi, marker, dom: Domain, direction: float,
                            distance: int, interpret: bool = False):
    """extrapolateLsSimple's layer loop (fastmarch.cpp:437-490) as the
    single-pair kernel: a marker-only first layer, then avg+direction
    value layers. Returns (phi, marker)."""
    call = _layer_call(dom.shape, interpret, n_pairs=1)

    def run(d, upd_vals, phi, marker):
        sc = jnp.concatenate([
            jnp.full((1,), d, jnp.int32),
            jnp.full((1,), int(direction * 1000), jnp.int32),
            jnp.full((1,), upd_vals, jnp.int32)])
        m, v = call(sc, marker, marker, marker, phi, phi, phi)
        return v, m

    phi, marker = run(1, 0, phi, marker)     # first layer: mark only
    for d in range(2, 1 + distance):
        phi, marker = run(d, 1, phi, marker)
    return phi, marker


def pallas_extrap_ok(dom: Domain) -> bool:
    import os
    return (jax.default_backend() == "tpu" and jax.device_count() == 1
            and dom.is3d
            and os.environ.get("MANTA_NO_PALLAS_EXTRAP", "") != "1")
