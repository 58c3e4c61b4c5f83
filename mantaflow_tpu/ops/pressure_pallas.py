"""Whole-solve-in-VMEM conjugate gradient: the entire PCG iteration as ONE
Pallas TPU kernel.

The XLA CG (ops/pressure.py solve_pressure_system, the port of
conjugategrad.cpp:210-290) streams every field through HBM on every
iteration: one 7-point apply + two dots + three axpys touch ~10 full grids,
~84 MB at 128^3 — ~0.13 ms/iteration, purely HBM-bound. On TPU the whole
working set (rhs, stencil, p/r/s/tmp) fits in VMEM for grids up to 128^3,
so this kernel runs the complete `lax.while_loop` CG *inside* pallas_call:
zero HBM traffic per iteration, the VPU is the only limit.

Semantics match solve_pressure_system with an identity preconditioner
exactly (same update order, same early-exit test, max-norm residual); only
float reduction order differs (z-block-wise accumulation instead of one
flat jnp.sum), which shifts results by ~1 ulp per dot.

Two stencil modes:
- ``unit_stencil`` (fractions-free systems — conjugategrad.h:155-190 builds
  Ai/Aj/Ak as plain -1 on fluid-neighbor links): the off-diagonals are
  recomputed in VMEM from the fluid mask; only A0 (which ghost fluid
  modifies, pressure.cpp:136-151) is an input. 7 resident fields.
- full stencil: Ai/Aj/Ak are passed in (fraction-weighted systems,
  initplugins.cpp:437 updateFractions). 10 resident fields.

The kernel requires rhs == 0 outside fluid (make_rhs guarantees this unless
enforce_compatibility adds a global constant): then r/s stay zero outside
fluid and the reference's "dst = src on non-fluid" ApplyMatrix rule
(conjugategrad.h:117-151) reduces to the plain masked stencil.

Buffer layout: every field is z-padded with TWO zero guard planes in front
and ONE behind (buffer index of global plane g is g+2), so every dynamic
z-slice a block needs — including the fluid mask one plane below the first
interior plane — stays in bounds with static sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.domain import Domain

_VMEM_BUDGET = 96 * 1024 * 1024  # leave headroom under the 128 MB/core VMEM


def _zblock(sz: int, cap: int = 16) -> int:
    """Largest divisor of sz that is <= cap (z-planes processed per block)."""
    for d in range(min(cap, sz), 0, -1):
        if sz % d == 0:
            return d
    return 1


def pallas_cg_supported(dom: Domain, unit_stencil: bool) -> bool:
    if not dom.is3d:
        return False
    sz, sy, sx = dom.shape
    n_fields = 7 if unit_stencil else 10
    byts = n_fields * (sz + 3) * sy * sx * 4
    return byts <= _VMEM_BUDGET


def _shift_x(a, d: int):
    """a shifted so out[..., c] = a[..., c+d], zero-filled (last axis)."""
    sx = a.shape[-1]
    z = jnp.zeros(a.shape[:-1] + (abs(d),), a.dtype)
    if d > 0:
        return jnp.concatenate([a[..., d:], z], axis=-1)
    if d < 0:
        return jnp.concatenate([z, a[..., :sx + d]], axis=-1)
    return a


def _shift_y(a, d: int):
    sy = a.shape[-2]
    z = jnp.zeros(a.shape[:-2] + (abs(d),) + a.shape[-1:], a.dtype)
    if d > 0:
        return jnp.concatenate([a[..., d:, :], z], axis=-2)
    if d < 0:
        return jnp.concatenate([z, a[..., :sy + d, :]], axis=-2)
    return a


def _cg_kernel(acc_ref, rhs_ref, a0_ref, fl_ref, ai_ref, aj_ref, ak_ref,
               p_ref, it_ref, rn_ref, r_ref, s_ref, tmp_ref, *,
               shape, max_iter, unit_stencil, zb):
    """Inputs/outputs/scratch are (sz+3, sy, sx): global plane g lives at
    buffer index g+2 (two zero guards in front, one behind). ai/aj/ak refs
    are 1-plane dummies in unit_stencil mode (never read)."""
    sz, sy, sx = shape
    nblk = sz // zb
    acc = acc_ref[0]

    iy = jax.lax.broadcasted_iota(jnp.int32, (1, sy, sx), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, sy, sx), 2)
    inter2d = ((iy >= 1) & (iy <= sy - 2) & (ix >= 1)
               & (ix <= sx - 2)).astype(jnp.float32)
    zi = jax.lax.broadcasted_iota(jnp.int32, (zb, 1, 1), 0)

    def zin_mask(z0):
        # global z of block-center plane i is (z0 - 2) + i (padded layout)
        gz = zi + (z0 - 2)
        return ((gz >= 1) & (gz <= sz - 2)).astype(jnp.float32)

    def apply_block(z0):
        """tmp[z0:z0+zb] = (A s)[...]; returns block dot(tmp, s)."""
        sblk = s_ref[pl.ds(z0 - 1, zb + 2)]
        s_c = sblk[1:zb + 1]
        s_zm = sblk[0:zb]
        s_zp = sblk[2:zb + 2]
        a0 = a0_ref[pl.ds(z0, zb)]
        if unit_stencil:
            fblk = fl_ref[pl.ds(z0 - 2, zb + 3)]
            f_zm = fblk[1:zb + 1]
            f_c = fblk[2:zb + 2]
            f_zp = fblk[3:zb + 3]
            m = f_c * inter2d * zin_mask(z0)
            ai = -(m * _shift_x(f_c, 1))
            aj = -(m * _shift_y(f_c, 1))
            ak = -(m * f_zp)
            # ak at plane z-1 couples (z-1, z): rebuild it from the mask one
            # plane down (the zero guard planes make the ends contribute 0)
            m_zm = f_zm * inter2d * zin_mask(z0 - 1)
            ak_zm = -(m_zm * f_c)
        else:
            ai = ai_ref[pl.ds(z0, zb)]
            aj = aj_ref[pl.ds(z0, zb)]
            ak = ak_ref[pl.ds(z0, zb)]
            ak_zm = ak_ref[pl.ds(z0 - 1, zb)]
        tmp = (a0 * s_c
               + ai * _shift_x(s_c, 1) + _shift_x(ai * s_c, -1)
               + aj * _shift_y(s_c, 1) + _shift_y(aj * s_c, -1)
               + ak * s_zp + ak_zm * s_zm)
        tmp_ref[pl.ds(z0, zb)] = tmp
        return jnp.sum(tmp * s_c)

    # guard planes of s are READ (z-neighbor slices at the ends): zero them
    # once — VMEM scratch starts uninitialized
    guard = jnp.zeros((2, sy, sx), jnp.float32)
    s_ref[pl.ds(0, 2)] = guard
    s_ref[pl.ds(sz + 2, 1)] = guard[:1]

    def init_block(b, sig):
        z0 = b * zb + 2
        rb = rhs_ref[pl.ds(z0, zb)]
        r_ref[pl.ds(z0, zb)] = rb
        s_ref[pl.ds(z0, zb)] = rb
        p_ref[pl.ds(z0, zb)] = jnp.zeros_like(rb)
        sn, rn = sig
        return (sn + jnp.sum(rb * rb), jnp.maximum(rn, jnp.max(jnp.abs(rb))))

    sigma0, rn0 = jax.lax.fori_loop(0, nblk, init_block,
                                    (jnp.float32(0.0), jnp.float32(0.0)))

    def cond(carry):
        it, _, _, done = carry
        return (it < max_iter) & (~done)

    def body(carry):
        it, sigma, _, _ = carry

        def dp_block(b, dp):
            return dp + apply_block(b * zb + 2)

        dp = jax.lax.fori_loop(0, nblk, dp_block, jnp.float32(0.0))
        alpha = jnp.where(jnp.abs(dp) > 0, sigma / dp, 0.0)

        def upd_block(b, c):
            sl = pl.ds(b * zb + 2, zb)
            p_ref[sl] = p_ref[sl] + alpha * s_ref[sl]
            rb = r_ref[sl] - alpha * tmp_ref[sl]
            r_ref[sl] = rb
            sn, rn = c
            return (sn + jnp.sum(rb * rb),
                    jnp.maximum(rn, jnp.max(jnp.abs(rb))))

        sigma_new, rn = jax.lax.fori_loop(
            0, nblk, upd_block, (jnp.float32(0.0), jnp.float32(0.0)))
        done = rn < acc
        # matches the XLA body: s/sigma freeze on the converging iteration
        beta = jnp.where(done, 0.0, sigma_new / sigma)

        def s_block(b, _):
            sl = pl.ds(b * zb + 2, zb)
            s_ref[sl] = r_ref[sl] + beta * s_ref[sl]
            return 0

        jax.lax.fori_loop(0, nblk, s_block, 0)
        sigma = jnp.where(done, sigma, sigma_new)
        return (it + 1, sigma, rn, done)

    it, _, rn, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), sigma0, rn0, rn0 < acc))
    it_ref[0] = it
    rn_ref[0] = rn


def cg_solve_pallas(rhs, stencil, dom: Domain, accuracy: float,
                    max_iter: int, fluid=None, unit_stencil: bool = True,
                    interpret: bool = False):
    """Run the whole CG solve as one Pallas kernel.

    Drop-in for the PcNone branch of solve_pressure_system (max-norm
    residual, identity preconditioner, rhs masked to fluid). Returns
    (pressure, iterations, resnorm).
    """
    sz, sy, sx = dom.shape
    a0, ai, aj, ak = stencil
    zpad = [(2, 1), (0, 0), (0, 0)]

    def zp(a):
        return jnp.pad(a, zpad)

    dummy = jnp.zeros((1, sy, sx), jnp.float32)
    if unit_stencil:
        if fluid is None:
            raise ValueError("unit_stencil needs the fluid mask")
        ins = (zp(rhs), zp(a0), zp(fluid.astype(jnp.float32)),
               dummy, dummy, dummy)
    else:
        ins = (zp(rhs), zp(a0), dummy, zp(ai), zp(aj), zp(ak))

    zb = _zblock(sz)
    kern = functools.partial(_cg_kernel, shape=dom.shape,
                             max_iter=int(max_iter),
                             unit_stencil=unit_stencil, zb=zb)
    grid_field = pl.BlockSpec(memory_space=pltpu.VMEM)
    acc_arr = jnp.full((1,), accuracy, jnp.float32)
    p_pad, iters, rn = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [grid_field] * 6,
        out_specs=(grid_field,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((sz + 3, sy, sx), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32),
                   jax.ShapeDtypeStruct((1,), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((sz + 3, sy, sx), jnp.float32)
                        for _ in range(3)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(acc_arr, *ins)
    return p_pad[2:sz + 2], iters[0], rn[0]
