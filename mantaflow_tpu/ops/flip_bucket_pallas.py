"""Pallas TPU kernel for bucketed particle advection.

The XLA form of ``flip_bucket.advect_bucketed`` materializes every tap's
(PPC, T) weight/accumulator intermediate in HBM (~26 ms at 64^3 x 459k
particles, memory-bound). This kernel runs the complete RK4 advection for
one z-plane of buckets with everything hot in VMEM.

Resolution-independent z-plane streaming (the round-4 redesign): instead of
keeping the whole padded velocity field VMEM-resident (which capped the
round-3 kernel at ~96^3 and hit Mosaic dynamic-sublane-alignment failures
at 128^3), the velocity arrives as FIVE overlapping z-plane BlockSpecs
(dz = -2..+2 around the current plane, double-buffered by the Pallas
pipeline) and the obstacle mask as three. Every in-plane tap is then a
STATIC slice; the per-plane y-block loop is a python loop, so occupancy
skipping keeps its (z, y-block) granularity from round 3.

Optionally the FLIP velocity blend (flipVelocityUpdate, flip.cpp:727-744)
is FUSED into the first RK stage: stage-1 positions are exactly the drift-0
positions the blend evaluates at, and its tap set (own {0,1}, cross
{-1,0,1}) is stage 1's, so v_new comes free and only the vel_old taps are
extra. models/flip.py moves the blend from the tail of step t to the head
of step t+1 (identical data flow — nothing reads particle velocities in
between) to exploit this.

Semantics are identical to the XLA path: BUILD_INDEX border clamping
(util/interpol.h:52-68), MAC per-component shifts (interpol.h:113-166), the
fork's RK4 weighting (util/integrator.h:49-72), stop-in-obstacle stage
zeroing + KnClampPositions + bisectBacktracePos (particle.h:485-525).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import flags as fl
from ..core.domain import Domain
# single source of truth for BUILD_INDEX clamping and the per-drift window
# tap tables: the Pallas kernels must stay bit-identical to the XLA path
from .flip_bucket import _MAC_SHIFTS, _TAPS, _axw
from .flip_bucket import _tap_weights as _tapw

_PAD = 2  # halo padding on every grid axis


def tile_occupancy(valid, dom: Domain, yb: int):
    """(sz, sy//yb) int32 tile-occupancy flags: does any valid particle sit
    in z-plane k, y-block j? Grid tiles with no particles are skipped by the
    bucket kernels (pl.when) — in a dam/pool scene most of the domain is
    empty air, so this roughly halves-to-quarters the particle-kernel work.
    ~one cheap XLA reduction over the valid mask per use."""
    sz, sy, sx = dom.shape
    P = valid.shape[0]
    occ = valid.reshape(P, sz, sy // yb, yb * sx)
    return jnp.any(jnp.any(occ, axis=0), axis=-1).astype(jnp.int32)


def tile_max_count(valid, dom: Domain, yb: int):
    """(sz, sy//yb) int32: the MAX per-cell occupancy over each tile.
    Buckets are gap-free per cell (binning and every rebin pass deliver
    valid slots contiguously from slot 0), so slot rows >= this count are
    invalid everywhere in the tile — the advection kernel skips whole
    slot-row CHUNKS per tile on it (round-5 PPC-slack compaction: at the
    escalated developed-state PPC=16 with ~8 real particles/cell, half of
    every (P, yb, sx) vector op was padding)."""
    sz, sy, sx = dom.shape
    P = valid.shape[0]
    cnt = jnp.sum(valid.astype(jnp.int32), axis=0)        # (T,) per cell
    cnt = cnt.reshape(sz, sy // yb, yb * sx)
    return jnp.max(cnt, axis=-1)


_PCHUNK = 4   # slot-chunk height for occupancy skipping (see tile_max_count)


def _advect_kernel(sc_ref, occ_ref, *refs, shape, ppc, yb,
                   integration_mode, stop_in_obstacle, ring_only,
                   with_blend, flip_ratio, sz_global=None):
    """One z-plane of buckets per grid step. refs layout (static counts):
    5 vel z-planes [dz=-2..2] · (3 vel_old z-planes if with_blend) ·
    (3 obstacle z-planes unless ring_only) · slab ins px py pz valid
    (+ vx vy vz if with_blend) · slab outs ox oy oz (+ ovx ovy ovz).

    Sharded operation (advect_blend_zshard): ``shape`` is the LOCAL z-slab
    shape, ``sz_global`` the global z extent, and sc_ref[2] this shard's
    global z offset — particle coordinates are always global."""
    sz, sy, sx = shape
    if sz_global is None:
        sz_global = sz
    kl = pl.program_id(0)                       # local plane (occ/blocks)
    kg = kl + sc_ref[2].astype(jnp.int32)       # global plane (coordinates)
    nold = 3 if with_blend else 0
    nobs = 0 if ring_only else 3
    velz = refs[:5]
    oldz = refs[5:5 + nold]
    obsz = refs[5 + nold:5 + nold + nobs]
    n_in = 7 if with_blend else 4
    slabs = refs[5 + nold + nobs:5 + nold + nobs + n_in]
    outs = refs[5 + nold + nobs + n_in:]

    P = ppc
    chunks = [(r0, min(r0 + _PCHUNK, P)) for r0 in range(0, P, _PCHUNK)]
    for j in range(sy // yb):        # python loop: y0/static slices per block
        y0 = j * yb
        # occ_ref now carries the tile MAX per-cell occupancy
        # (tile_max_count): slot chunk [r0, r1) has particles iff occ > r0
        for r0, r1 in chunks:
            px = slabs[0][r0:r1, 0, y0:y0 + yb, :]
            py = slabs[1][r0:r1, 0, y0:y0 + yb, :]
            pz = slabs[2][r0:r1, 0, y0:y0 + yb, :]
            val = slabs[3][r0:r1, 0, y0:y0 + yb, :]
            pv = tuple(slabs[4 + c][r0:r1, 0, y0:y0 + yb, :]
                       for c in range(3)) if with_blend else ()

            @pl.when(occ_ref[kl, j] <= r0)
            def _skip(px=px, py=py, pz=pz, pv=pv, y0=y0, r0=r0, r1=r1):
                outs[0][r0:r1, 0, y0:y0 + yb, :] = px
                outs[1][r0:r1, 0, y0:y0 + yb, :] = py
                outs[2][r0:r1, 0, y0:y0 + yb, :] = pz
                for c in range(3 if with_blend else 0):
                    outs[3 + c][r0:r1, 0, y0:y0 + yb, :] = pv[c]

            @pl.when(occ_ref[kl, j] > r0)
            def _compute(px=px, py=py, pz=pz, val=val, pv=pv, y0=y0,
                         r0=r0, r1=r1):
                _advect_tile(sc_ref, velz, oldz, obsz, px, py, pz, val, pv,
                             outs, k=kg, y0=y0, p0=r0,
                             shape=(sz_global, sy, sx), ppc=r1 - r0, yb=yb,
                             integration_mode=integration_mode,
                             stop_in_obstacle=stop_in_obstacle,
                             ring_only=ring_only, with_blend=with_blend,
                             flip_ratio=flip_ratio)


def _advect_tile(sc_ref, velz, oldz, obsz, px, py, pz, val, pv, outs, *, k,
                 y0, shape, ppc, yb, integration_mode, stop_in_obstacle,
                 ring_only, with_blend, flip_ratio, p0=0):
    p1 = p0 + ppc
    sz, sy, sx = shape
    P = ppc
    dt = sc_ref[0]
    live = val > 0.5
    cxi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 2)
    cyi = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 1) + y0

    def vel_plane(g, c, dz, dy, dx):
        """grid g (0: vel [dz -2..2], 1: vel_old [dz -1..1]) component c at
        z-plane k+dz, y rows [y0+dy, y0+dy+yb), x shifted by dx — all
        STATIC slices of the padded plane blocks."""
        ref = velz[dz + 2] if g == 0 else oldz[dz + 1]
        return ref[c, 0, y0 + _PAD + dy:y0 + _PAD + dy + yb,
                   _PAD + dx:_PAD + dx + sx]

    def obs_plane(dz, dy, dx):
        return obsz[dz + 1][0, y0 + _PAD + dy:y0 + _PAD + dy + yb,
                            _PAD + dx:_PAD + dx + sx]

    def obstacle_at(qx, qy, qz, taps):
        if ring_only:
            # only the bnd=1 ring is obstacle: flags-at-trunc(pos) is in the
            # ring iff the position fails the bounds test (see
            # flip_bucket.advect_bucketed ring_only)
            return ~in_bounds(qx, qy, qz)
        if taps == (0,):
            return obs_plane(0, 0, 0)[None, :, :] > 0.5
        ix = jnp.clip(qx.astype(jnp.int32), 0, sx - 1) - cxi
        iy = jnp.clip(qy.astype(jnp.int32), 0, sy - 1) - cyi
        iz = jnp.clip(qz.astype(jnp.int32), 0, sz - 1) - k
        hit = jnp.zeros((P, yb, sx), dtype=jnp.bool_)
        for dz in taps:
            mz = iz == dz
            for dy in taps:
                mzy = mz & (iy == dy)
                for dx in taps:
                    o = obs_plane(dz, dy, dx)
                    hit = hit | (mzy & (ix == dx) & (o[None] > 0.5))
        return hit

    def in_bounds(qx, qy, qz):
        return ((qx >= 1.0) & (qx < sx - 1.0) & (qy >= 1.0)
                & (qy < sy - 1.0) & (qz >= 1.0) & (qz < sz - 1.0))

    def eval_raw(qx, qy, qz, drift, grids):
        """Raw MAC interpolation of one or more grids with shared weights;
        returns [(u,v,w)] per grid."""
        own, cross, _ = _TAPS[drift]
        accs = [[] for _ in grids]
        for c in range(3):
            mx, my, mz = _MAC_SHIFTS[c]
            bx, wx1 = _axw(qx - mx, sx)
            by, wy1 = _axw(qy - my, sy)
            bz, wz1 = _axw(qz - mz, sz)
            tx = own if c == 0 else cross
            ty = own if c == 1 else cross
            tz = own if c == 2 else cross
            wx = _tapw(bx - cxi, wx1, tx)
            wy = _tapw(by - cyi, wy1, ty)
            wz = _tapw(bz - k, wz1, tz)
            a = [jnp.zeros((P, yb, sx), jnp.float32) for _ in grids]
            for iz, dz in enumerate(tz):
                for iy, dy in enumerate(ty):
                    wzy = wz[iz] * wy[iy]
                    for ix, dx in enumerate(tx):
                        w = wzy * wx[ix]
                        for gi, g in enumerate(grids):
                            a[gi] = a[gi] + w * vel_plane(g, c, dz, dy,
                                                          dx)[None]
            for gi in range(len(grids)):
                accs[gi].append(a[gi])
        return [tuple(acc) for acc in accs]

    def to_step(comps, qx, qy, qz, drift):
        """dt-scale + clamp + obstacle stage-zeroing of a raw evaluation."""
        _, _, obs_taps = _TAPS[drift]
        u = jnp.clip(comps[0] * dt, -1.0, 1.0)
        v = jnp.clip(comps[1] * dt, -1.0, 1.0)
        w = jnp.clip(comps[2] * dt, -1.0, 1.0)
        if stop_in_obstacle:
            bad = (~in_bounds(qx, qy, qz)
                   | obstacle_at(qx, qy, qz, obs_taps))
            u = jnp.where(bad, 0.0, u)
            v = jnp.where(bad, 0.0, v)
            w = jnp.where(bad, 0.0, w)
        return u, v, w

    def eval_u(qx, qy, qz, drift):
        (comps,) = eval_raw(qx, qy, qz, drift, (0,))
        return to_step(comps, qx, qy, qz, drift)

    # stage 1 (drift 0) — fused with the FLIP blend when requested: the
    # blend evaluates vel/vel_old at exactly these positions with exactly
    # this tap set (own {0,1} == _T0_OWN, cross {-1,0,1} == _T0_CROSS)
    if with_blend:
        (vnew, vold) = eval_raw(px, py, pz, 0.0, (0, 1))
        pending = sc_ref[1] > 0.5
        for c in range(3):
            blended = (flip_ratio * (pv[c] + (vnew[c] - vold[c]))
                       + (1.0 - flip_ratio) * vnew[c])
            outs[3 + c][p0:p1, 0, y0:y0 + yb, :] = jnp.where(
                live & pending, blended, pv[c])
        u0 = to_step(vnew, px, py, pz, 0.0)
    else:
        u0 = eval_u(px, py, pz, 0.0)

    if integration_mode == 0:
        du, dv, dw = u0
    elif integration_mode == 1:
        du, dv, dw = eval_u(px + 0.5 * u0[0], py + 0.5 * u0[1],
                            pz + 0.5 * u0[2], 0.5)
    elif integration_mode == 2:
        u1 = eval_u(px + 0.5 * u0[0], py + 0.5 * u0[1], pz + 0.5 * u0[2],
                    0.5)
        u2 = eval_u(px + 0.5 * u1[0], py + 0.5 * u1[1], pz + 0.5 * u1[2],
                    0.5)
        u3 = eval_u(px + u2[0], py + u2[1], pz + u2[2], 1.0)
        du = (2 * u0[0] + 2 * u1[0] + 2 * u2[0] + u3[0]) / 6.0
        dv = (2 * u0[1] + 2 * u1[1] + 2 * u2[1] + u3[1]) / 6.0
        dw = (2 * u0[2] + 2 * u1[2] + 2 * u2[2] + u3[2]) / 6.0
    else:
        raise ValueError("unknown integration type")

    nx = jnp.clip(px + jnp.clip(du, -1.0, 1.0), 0.0, sx - 1.0)
    ny = jnp.clip(py + jnp.clip(dv, -1.0, 1.0), 0.0, sy - 1.0)
    nz = jnp.clip(pz + jnp.clip(dw, -1.0, 1.0), 0.0, sz - 1.0)

    if stop_in_obstacle:
        in_obs = obstacle_at(nx, ny, nz, (-1, 0, 1))
        s = jnp.zeros((P, yb, sx), jnp.float32)
        for i in range(1, 5):
            ds = 1.0 / (1 << i)
            t = s + ds
            bx_ = px * (1.0 - t) + nx * t
            by_ = py * (1.0 - t) + ny * t
            bz_ = pz * (1.0 - t) + nz * t
            obs = obstacle_at(bx_, by_, bz_, (-1, 0, 1))
            s = jnp.where(obs, s, t)
        nx = jnp.where(in_obs, px * (1.0 - s) + nx * s, nx)
        ny = jnp.where(in_obs, py * (1.0 - s) + ny * s, ny)
        nz = jnp.where(in_obs, pz * (1.0 - s) + nz * s, nz)

    outs[0][p0:p1, 0, y0:y0 + yb, :] = jnp.where(live, nx, px)
    outs[1][p0:p1, 0, y0:y0 + yb, :] = jnp.where(live, ny, py)
    outs[2][p0:p1, 0, y0:y0 + yb, :] = jnp.where(live, nz, pz)


def _shift(a, k: int, axis: int):
    """jnp.roll(a, k, axis) with static k as two slices (Pallas-safe)."""
    n = a.shape[axis]
    k %= n
    if k == 0:
        return a
    lo = jax.lax.slice_in_dim(a, n - k, n, axis=axis)
    hi = jax.lax.slice_in_dim(a, 0, n - k, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _rebin_pass_kernel(*refs, pos_idx, n_axis, ppc, ax):
    """One in-plane rebin axis pass (flip_bucket._rebin_axis semantics)
    along block axis ``ax``, which spans the whole grid axis (x: ax=3 on
    (P, 1, rows, sx) blocks; y: ax=2 on (P, 1, sy, xb) blocks — natural
    layout, no HBM transposes). refs = 7 in (px py pz vx vy vz valid) +
    7 out; ``pos_idx`` selects the position channel of the pass axis."""
    occ_ref, ins, outs = refs[0], refs[1:8], refs[8:]

    @pl.when(occ_ref[pl.program_id(0), pl.program_id(1)] == 0)
    def _skip():  # no movers in these rows: fields pass through
        for i, o in zip(ins, outs):
            o[...] = i[...]

    @pl.when(occ_ref[pl.program_id(0), pl.program_id(1)] > 0)
    def _compute():
        _rebin_pass_tile(ins, outs, pos_idx=pos_idx, n_axis=n_axis,
                         ppc=ppc, ax=ax)


def _up0(a, k: int):
    """out[i] = a[i+k] along axis 0, zero/False-filled at the tail."""
    pad = jnp.zeros((k,) + a.shape[1:], a.dtype)
    return jnp.concatenate([a[k:], pad], axis=0)


def _down0(a, k: int):
    """out[i] = a[i-k] along axis 0, zero/False-filled at the head."""
    pad = jnp.zeros((k,) + a.shape[1:], a.dtype)
    return jnp.concatenate([pad, a[:-k]], axis=0)


def _ranked_deliver(cand, mark, P):
    """Ranked-shuffle compaction core (round 4): given K = len-3P stacked
    candidates ``cand`` (list of 6 field arrays, axis 0 = candidate) with
    int32 validity ``mark`` in ARRIVAL order, deliver each valid candidate
    to slot rank[q] (its exclusive valid-prefix count) by LSB-first bit
    moves of its distance q - rank[q]. Returns (delivered fields, total
    valid per column).

    Correctness: distances are weakly monotone over the valid subsequence
    and remain so after each bit stage (both multiples of the processed
    bits), which rules out valid-on-valid landings and crossings; source
    positions are cleared when pulled so stale duplicates can't re-move.
    Replaces the round-3 per-output-slot indicator contraction, whose
    vector work was O(P^2) per direction (3456 plane-ops at P=12) vs
    O(P log P) here (~700)."""
    K = mark.shape[0]
    inc = mark
    k = 1
    while k < K:
        inc = inc + _down0(inc, k)
        k *= 2
    total = inc[K - 1:K]                                  # valid per column
    rem = (jax.lax.broadcasted_iota(jnp.int32, mark.shape, 0)
           - (inc - mark)) * mark

    b = 1
    while b < K:
        cond = (_up0(mark, b) * (_up0(rem, b) & b)) != 0
        condi = cond.astype(jnp.int32)
        pulled = _down0(condi, b)                         # my element left
        cand = [jnp.where(cond, _up0(f, b), f) for f in cand]
        rem = jnp.where(cond, _up0(rem, b) - b, rem)
        mark = jnp.where(cond, 1, mark * (1 - pulled))
        b *= 2
    return cand, total


def _pass_compact(fields, validf, *, pos_idx, n_axis, ax, ppc):
    """Pure-array single-axis compaction: stack the three candidate groups
    (movers-from-right, stayers, movers-from-left — arrival order) in the
    DESTINATION frame along axis ``ax``, then _ranked_deliver them into the
    P output slots. Returns (fields', validf'); invalid output slots hold
    stale candidate values (callers park them once, in _finish_pass)."""
    P = ppc
    blk = fields[0].shape
    valid = validf > 0.5

    cax = jax.lax.broadcasted_iota(jnp.int32, blk, ax)
    p_axis = fields[pos_idx]

    e = jnp.clip(p_axis.astype(jnp.int32) - cax, -1, 1)
    tgt = cax + e
    e = jnp.where((tgt < 0) | (tgt >= n_axis), 0, e)
    e = jnp.where(valid, e, 2)

    # stacked candidates in arrival order, destination frame (the rolls'
    # wrapped rows only carry e != d slots: border movers are forced-stay)
    sels, cands = [], [[] for _ in range(6)]
    for d in (-1, 0, 1):
        # int32 0/1 from the start: Mosaic cannot concatenate/truncate
        # i1/i8 vectors, so no bool arrays may flow through shifts/moves
        sels.append(_shift((e == d).astype(jnp.int32), d, ax))
        for fi in range(6):
            cands[fi].append(_shift(fields[fi], d, ax))
    mark = jnp.concatenate(sels, axis=0)                  # (3P, ...)
    cand = [jnp.concatenate(c, axis=0) for c in cands]

    cand, total = _ranked_deliver(cand, mark, P)
    sidx = jax.lax.broadcasted_iota(jnp.int32, blk, 0)
    new_valid = sidx < total                              # first-`total` slots
    return [c[:P] for c in cand], new_valid.astype(jnp.float32)


def _rebin_pass_tile(ins, outs, *, pos_idx, n_axis, ppc, ax):
    """Ref-based wrapper over _pass_compact for the single-axis kernels."""
    fields = [r[...] for r in ins[:6]]
    nf, nv = _pass_compact(fields, ins[6][...], pos_idx=pos_idx,
                           n_axis=n_axis, ax=ax, ppc=ppc)
    for fi, o in enumerate(outs[:6]):
        o[...] = nf[fi]
    outs[6][...] = nv


def _park_invalid(outs, new_valid, dom, z_base=None):
    """Host-side (XLA) fixup: park invalid slots at cell centers with zero
    velocity (matches flip_bucket._rebin_axis). Under z-slab sharding
    ``dom`` is the local slab and ``z_base`` its global z offset — parked
    z centers must stay GLOBAL coordinates."""
    from .flip_bucket import _cell_centers
    ccx, ccy, ccz = _cell_centers(dom)
    if z_base is not None:
        ccz = ccz + jnp.asarray(z_base, jnp.float32)
    centers = (ccx, ccy, ccz)
    fixed = []
    for fi in range(3):
        fixed.append(jnp.where(new_valid, outs[fi], centers[fi][None, :]))
    for fi in range(3, 6):
        fixed.append(jnp.where(new_valid, outs[fi], 0.0))
    return fixed


def _rebin_zpass_kernel(occ_ref, *refs, ppc, sz):
    """z rebin pass as a 3-plane streaming kernel: output plane t's
    candidates are (movers down from t+1, stayers of t, movers up from
    t-1), read through three overlapping z-plane BlockSpecs per field, so
    the pass needs NO transposed layout and no ring state — the +-1-plane
    movement window makes plane t's result local to planes t-1..t+1.
    In-plane columns are independent, so blocks cover a y-slice (grid dim
    1) — whole (P, sy, sx) plane blocks hit the 100MB scoped-VMEM cap at
    the escalated PPC=18 (bench OOM, round 5)."""
    ins = refs[:21]          # 7 fields x 3 planes (t+1, t, t-1 order)
    outs = refs[21:]
    t = pl.program_id(0)
    P = ppc

    def plane(fi, g):        # g: 0 = t+1, 1 = t, 2 = t-1
        return ins[fi * 3 + g][:, 0]

    @pl.when(occ_ref[t, pl.program_id(1)] == 0)
    def _skip():  # no z-movers near this plane: fields pass through
        for fi in range(7):
            outs[fi][:, 0] = plane(fi, 1)

    @pl.when(occ_ref[t, pl.program_id(1)] > 0)
    def _compute():
        blk = plane(0, 1).shape                      # (P, yb, sx)
        ok_hi = (t < sz - 1).astype(jnp.int32)       # plane t+1 exists
        ok_lo = (t > 0).astype(jnp.int32)
        sels, cands = [], [[] for _ in range(6)]
        # arrival order: movers from t+1 (e=-1), stayers, movers from t-1
        for d, g, ok in ((-1, 0, ok_hi), (0, 1, 1), (1, 2, ok_lo)):
            s = t - d                                # source plane
            pz = plane(2, g)
            valid = plane(6, g) > 0.5
            e = jnp.clip(pz.astype(jnp.int32) - s, -1, 1)
            tgt = s + e
            e = jnp.where((tgt < 0) | (tgt >= sz), 0, e)
            sel = jnp.where(valid, (e == d).astype(jnp.int32), 0) * ok
            sels.append(sel)
            for fi in range(6):
                cands[fi].append(plane(fi, g))
        mark = jnp.concatenate(sels, axis=0)
        cand = [jnp.concatenate(c, axis=0) for c in cands]
        cand, total = _ranked_deliver(cand, mark, P)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (P,) + blk[1:], 0)
        for fi in range(6):
            outs[fi][:, 0] = cand[fi][:P]
        outs[6][:, 0] = (sidx < total).astype(jnp.float32)


def _rebin_zpass_stream_kernel(occ_ref, *refs, ppc, sz, yb):
    """z rebin pass with ONE plane read per field per grid step: the
    3-overlapping-BlockSpec form (_rebin_zpass_kernel) reads every (PPC,
    plane) slab three times (~1.9 GB of redundant HBM reads per pass at
    128^3 PPC=16); here the previous two planes live in a fixed-role VMEM
    scratch ring (row fi*2: plane t-1, row fi*2+1: plane t-2) rotated by
    static-index VMEM copies at the end of each step (the p2g pattern —
    Mosaic requires static scratch indices). Step t emits output plane
    t-1 from (incoming plane t, scratch t-1, scratch t-2); at t == sz the
    input spec's clamped re-read of plane sz-1 is masked by ok_hi."""
    ins, outs, scr = refs[:7], refs[7:14], refs[14]
    P = ppc
    t = pl.program_id(0)
    sy, sx = ins[0].shape[2], ins[0].shape[3]

    @pl.when(t == 0)
    def _init():   # planes -1 and -2 are empty
        scr[...] = jnp.zeros_like(scr)

    k = t - 1
    kc = jnp.maximum(k, 0)
    ok_hi = ((k < sz - 1) & (t < sz)).astype(jnp.int32)  # plane k+1 usable
    ok_lo = (k > 0).astype(jnp.int32)

    @pl.when(t >= 1)
    def _emit():
        for j in range(sy // yb):
            y0 = j * yb

            @pl.when(occ_ref[kc, j] == 0)
            def _skip(y0=y0):  # no z-movers near this tile: pass-through
                for fi in range(7):
                    outs[fi][:, 0, y0:y0 + yb, :] = \
                        scr[fi * 2, :, y0:y0 + yb, :]

            @pl.when(occ_ref[kc, j] > 0)
            def _comp(y0=y0):
                # candidate groups in arrival order: movers down from k+1
                # (the incoming block), stayers of k (slot A), movers up
                # from k-1 (slot B) — _rebin_zpass_kernel semantics
                srcs = (
                    ([ins[fi][:, 0, y0:y0 + yb, :] for fi in range(6)],
                     ins[6][:, 0, y0:y0 + yb, :], k + 1, -1, ok_hi),
                    ([scr[fi * 2, :, y0:y0 + yb, :] for fi in range(6)],
                     scr[12, :, y0:y0 + yb, :], k, 0, jnp.int32(1)),
                    ([scr[fi * 2 + 1, :, y0:y0 + yb, :] for fi in range(6)],
                     scr[13, :, y0:y0 + yb, :], k - 1, 1, ok_lo),
                )
                sels, cands = [], [[] for _ in range(6)]
                for fields, validf, s_src, d, ok in srcs:
                    pzi = fields[2].astype(jnp.int32)
                    e = jnp.clip(pzi - s_src, -1, 1)
                    tgt = s_src + e
                    e = jnp.where((tgt < 0) | (tgt >= sz), 0, e)
                    sel = jnp.where(validf > 0.5,
                                    (e == d).astype(jnp.int32), 0) * ok
                    sels.append(sel)
                    for fi in range(6):
                        cands[fi].append(fields[fi])
                mark = jnp.concatenate(sels, axis=0)
                cand = [jnp.concatenate(c, axis=0) for c in cands]
                cand, total = _ranked_deliver(cand, mark, P)
                sidx = jax.lax.broadcasted_iota(jnp.int32, (P, yb, sx), 0)
                for fi in range(6):
                    outs[fi][:, 0, y0:y0 + yb, :] = cand[fi][:P]
                outs[6][:, 0, y0:y0 + yb, :] = \
                    (sidx < total).astype(jnp.float32)

    # rotate: B <- A, A <- incoming plane t (skipped on the final step —
    # it must not pollute A with the clamped re-read of plane sz-1)
    @pl.when(t < sz)
    def _rot():
        for fi in range(7):
            scr[fi * 2 + 1] = scr[fi * 2]
            scr[fi * 2] = ins[fi][:, 0]


def _z_streamable(P: int, dom: Domain, yb: int) -> bool:
    """Opt-in (MANTA_REBIN_ZSTREAM=1) + VMEM gate for the streaming z
    pass: 14 scratch planes + 14 blocks (double-buffered) + the
    ranked-deliver temporaries. Measured on v5e @128^3 dev PPC=16 (round
    5): 6.84 ms vs the 3-BlockSpec form's 5.7-6.8 (run-to-run spread) —
    the ring-rotation VMEM copies (14 planes/step) eat roughly what the
    deleted redundant-but-pipelined HBM re-reads cost, so the simpler
    3-spec kernel stays the default; the streaming form is kept as the
    lower-HBM-pressure alternative (useful when HBM is contended, e.g.
    overlapping collectives)."""
    import os as _os
    if _os.environ.get("MANTA_REBIN_ZSTREAM", "") != "1":
        return False
    sz, sy, sx = dom.shape
    est = 14 * P * sy * sx * 4 * 3 + 36 * P * yb * sx * 4
    return est < 80 * 2**20


def _axis_movers(bk, dom: Domain, axis: int):
    """(P, T) bool: valid slots whose truncated pass-axis coordinate leaves
    the bucket cell (with the border force-stay clamp) — exactly the slots
    a rebin pass moves. A block (or a whole pass) with none is the
    IDENTITY, because buckets are always gap-free at pass entry (binning
    and every pass park invalid slots at the tail)."""
    from .flip_bucket import _cell_coords
    cs = _cell_coords(dom)
    n_axis = (dom.shape[2], dom.shape[1], dom.shape[0])[axis]
    p_axis = (bk.px, bk.py, bk.pz)[axis]
    caxis = cs[axis]
    e = jnp.clip(p_axis.astype(jnp.int32) - caxis, -1, 1)
    tgt = caxis + e
    e = jnp.where((tgt < 0) | (tgt >= n_axis), 0, e)
    return bk.valid & (e != 0)


def _rebin_axis_pallas(bk, dom: Domain, axis: int, interpret: bool = False,
                       z_base=None):
    """One rebin axis pass, natural (P, z, y, x) layout throughout —
    x/y passes compact in-block along their axis; the z pass streams three
    overlapping z-plane windows. (Round 3 transposed the y/z passes into
    pass-axis-last layouts: 4 full HBM transpose round-trips of 7 (PPC, T)
    fields per rebin, ~1.7 ms at 64^3 — all gone.)"""
    sz, sy, sx = dom.shape
    P, T = bk.ppc, bk.ncells

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    movers = _axis_movers(bk, dom, axis)
    mv = resh(movers)

    if axis == 2:                           # z pass: 3-plane streaming
        yb2 = 32 if sy % 32 == 0 else sy    # y-blocked: VMEM ∝ P*yb2*sx
        mzb = jnp.any(mv.reshape(P, sz, sy // yb2, yb2 * sx),
                      axis=(0, 3))                               # (sz, nyb)
        occ3 = (mzb | jnp.pad(mzb[1:], ((0, 1), (0, 0)))
                | jnp.pad(mzb[:-1], ((1, 0), (0, 0))))
        occ = occ3.astype(jnp.int32)
        mz = jnp.any(mzb, axis=1)

        def zspec(dz):
            if dz == 0:
                return pl.BlockSpec((P, 1, yb2, sx),
                                    lambda t, j: (0, t, j, 0),
                                    memory_space=pltpu.VMEM)
            if dz == 1:
                return pl.BlockSpec((P, 1, yb2, sx),
                                    lambda t, j: (0,
                                                  jnp.minimum(t + 1, sz - 1),
                                                  j, 0),
                                    memory_space=pltpu.VMEM)
            return pl.BlockSpec((P, 1, yb2, sx),
                                lambda t, j: (0, jnp.maximum(t - 1, 0), j,
                                              0),
                                memory_space=pltpu.VMEM)

        def run_pass_stream(bk):
            fields = [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
                      resh(bk.vy), resh(bk.vz),
                      resh(bk.valid.astype(jnp.float32))]
            islab = pl.BlockSpec((P, 1, sy, sx),
                                 lambda t: (0, jnp.minimum(t, sz - 1), 0, 0),
                                 memory_space=pltpu.VMEM)
            oslab = pl.BlockSpec((P, 1, sy, sx),
                                 lambda t: (0, jnp.maximum(t - 1, 0), 0, 0),
                                 memory_space=pltpu.VMEM)
            kern = functools.partial(_rebin_zpass_stream_kernel, ppc=P,
                                     sz=sz, yb=yb2)
            outs = pl.pallas_call(
                kern,
                grid=(sz + 1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                         + [islab] * 7,
                out_specs=tuple([oslab] * 7),
                out_shape=tuple(
                    jax.ShapeDtypeStruct((P, sz, sy, sx), jnp.float32)
                    for _ in range(7)),
                scratch_shapes=[pltpu.VMEM((14, P, sy, sx), jnp.float32)],
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(occ, *fields)
            return _finish_pass(bk, outs, dom, z_base)

        def run_pass(bk):
            if _z_streamable(P, dom, yb2):
                return run_pass_stream(bk)
            fields = [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
                      resh(bk.vy), resh(bk.vz),
                      resh(bk.valid.astype(jnp.float32))]
            ins, specs = [], [pl.BlockSpec(memory_space=pltpu.SMEM)]
            for f in fields:
                for dz in (1, 0, -1):       # kernel order: t+1, t, t-1
                    ins.append(f)
                    specs.append(zspec(dz))
            ospec = pl.BlockSpec((P, 1, yb2, sx), lambda t, j: (0, t, j, 0),
                                 memory_space=pltpu.VMEM)
            kern = functools.partial(_rebin_zpass_kernel, ppc=P, sz=sz)
            outs = pl.pallas_call(
                kern,
                grid=(sz, sy // yb2),
                in_specs=specs,
                out_specs=tuple([ospec] * 7),
                out_shape=tuple(
                    jax.ShapeDtypeStruct((P, sz, sy, sx), jnp.float32)
                    for _ in range(7)),
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                interpret=interpret,
            )(occ, *ins)
            return _finish_pass(bk, outs, dom, z_base)

        return jax.lax.cond(jnp.any(mz), run_pass, lambda b: b, bk)

    if axis == 0:                           # x pass: rows of full-x blocks
        pos_idx, ax, n_axis = 0, 3, sx
        rb = 8
        while sy % (2 * rb) == 0 and P * 2 * rb * sx * 4 * 30 < 4 * 2**20:
            rb *= 2
        if sy % rb != 0:
            rb = sy
        blkshape = (P, 1, rb, sx)
        grid = (sz, sy // rb)
        spec = pl.BlockSpec(blkshape, lambda i, j: (0, i, j, 0),
                            memory_space=pltpu.VMEM)
        occ = jnp.any(mv.reshape(P, sz, sy // rb, rb * sx),
                      axis=(0, 3)).astype(jnp.int32)
    else:                                   # y pass: full-y, x-blocked
        pos_idx, ax, n_axis = 1, 2, sy
        xb = sx if sx <= 128 or sx % 128 != 0 else 128
        # delivery temporaries scale with 3P * sy * xb: halve xb while the
        # working-set estimate exceeds ~24MB (escalated-PPC VMEM safety;
        # the z-pass OOM at PPC=18 is the cautionary tale)
        while xb > 32 and xb % 2 == 0 and 3 * P * sy * xb * 4 > 24 * 2**20:
            xb //= 2
        blkshape = (P, 1, sy, xb)
        grid = (sz, sx // xb)
        spec = pl.BlockSpec(blkshape, lambda i, j: (0, i, 0, j),
                            memory_space=pltpu.VMEM)
        occ = jnp.any(mv.reshape(P, sz, sy, sx // xb, xb),
                      axis=(0, 2, 4)).astype(jnp.int32)

    def run_pass(bk):
        kern = functools.partial(_rebin_pass_kernel, pos_idx=pos_idx,
                                 n_axis=n_axis, ppc=P, ax=ax)
        ins = [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
               resh(bk.vy), resh(bk.vz), resh(bk.valid.astype(jnp.float32))]
        outs = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 7,
            out_specs=tuple([spec] * 7),
            out_shape=tuple(jax.ShapeDtypeStruct((P, sz, sy, sx),
                                                 jnp.float32)
                            for _ in range(7)),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(occ, *ins)
        return _finish_pass(bk, outs, dom, z_base)

    # whole-pass skip: nothing moves along this axis (calm/early states)
    return jax.lax.cond(jnp.any(movers), run_pass, lambda b: b, bk)


def _rebin_xy_kernel(occx_ref, occy_ref, *refs, ppc, sy, sx, yb, xb):
    """Fused x+y rebin passes for one z-plane: both are plane-local, so one
    kernel does both compactions with a SINGLE HBM round trip over the 7
    bucket fields (the 3-pass form pays a full read+write of ~2x7x(PPC,T)
    per pass — at 128^3 PPC=16 that's ~1.9 GB ≈ 2 ms of pure bandwidth the
    fusion deletes). Stage 1 x-compacts each y-block from ins into outs
    (occx skip: VMEM pass-through copy); stage 2 y-compacts each x-block of
    outs IN PLACE (occy skip: no work at all). occy is computed on the
    x-DILATED pre-pass y-mover columns, because the x stage can carry a
    y-mover one cell across an x-block boundary."""
    ins, outs = refs[:7], refs[7:]
    P = ppc
    k = pl.program_id(0)

    for j in range(sy // yb):            # stage 1: x pass, ins -> outs
        y0 = j * yb

        @pl.when(occx_ref[k, j] == 0)
        def _copy(y0=y0):
            for i, o in zip(ins, outs):
                o[:, 0, y0:y0 + yb, :] = i[:, 0, y0:y0 + yb, :]

        @pl.when(occx_ref[k, j] > 0)
        def _cx(y0=y0):
            fields = [ins[fi][:, 0, y0:y0 + yb, :] for fi in range(6)]
            nf, nv = _pass_compact(fields, ins[6][:, 0, y0:y0 + yb, :],
                                   pos_idx=0, n_axis=sx, ax=2, ppc=P)
            for fi in range(6):
                outs[fi][:, 0, y0:y0 + yb, :] = nf[fi]
            outs[6][:, 0, y0:y0 + yb, :] = nv

    for i in range(sx // xb):            # stage 2: y pass, outs in place
        x0 = i * xb

        @pl.when(occy_ref[k, i] > 0)
        def _cy(x0=x0):
            fields = [outs[fi][:, 0, :, x0:x0 + xb] for fi in range(6)]
            nf, nv = _pass_compact(fields, outs[6][:, 0, :, x0:x0 + xb],
                                   pos_idx=1, n_axis=sy, ax=1, ppc=P)
            for fi in range(6):
                outs[fi][:, 0, :, x0:x0 + xb] = nf[fi]
            outs[6][:, 0, :, x0:x0 + xb] = nv


def _xy_block_sizes(P: int, sy: int, sx: int):
    """(yb, xb) for the fused xy kernel — same policies as the standalone
    x/y passes (x: ~4MB of delivery temporaries; y: <=24MB working set)."""
    yb = 8
    while sy % (2 * yb) == 0 and P * 2 * yb * sx * 4 * 30 < 4 * 2**20:
        yb *= 2
    if sy % yb != 0:
        yb = sy
    xb = sx if sx <= 128 or sx % 128 != 0 else 128
    while xb > 32 and xb % 2 == 0 and 3 * P * sy * xb * 4 > 24 * 2**20:
        xb //= 2
    return yb, xb


def _xy_fusable(P: int, dom: Domain) -> bool:
    """The fused kernel holds full (P, sy, sx) planes of all 7 fields in
    VMEM twice (in + out, double-buffered) plus the y-stage delivery
    temporaries — gate on a conservative estimate against the 100MB cap
    (escalated-PPC safety; the z-pass OOM at PPC=18 is the precedent)."""
    sz, sy, sx = dom.shape
    _, xb = _xy_block_sizes(P, sy, sx)
    est = 14 * P * sy * sx * 4 * 2 + 12 * 3 * P * sy * xb * 4
    return est < 80 * 2**20


def _rebin_xy_pallas(bk, dom: Domain, interpret: bool = False, z_base=None):
    """Fused x+y rebin passes (see _rebin_xy_kernel); drop-in for the
    axis-0 + axis-1 _rebin_axis_pallas sequence, one _finish_pass."""
    sz, sy, sx = dom.shape
    P, T = bk.ppc, bk.ncells
    yb, xb = _xy_block_sizes(P, sy, sx)

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    mvx = resh(_axis_movers(bk, dom, 0))
    mvy = resh(_axis_movers(bk, dom, 1))
    occx = jnp.any(mvx.reshape(P, sz, sy // yb, yb * sx),
                   axis=(0, 3)).astype(jnp.int32)
    # x moves carry slots +-1 cell along x: dilate the y-mover columns so
    # an x-block-boundary crosser still lights its destination block
    coly = jnp.any(mvy, axis=(0, 2))                       # (sz, sx)
    coly = (coly | jnp.pad(coly[:, 1:], ((0, 0), (0, 1)))
            | jnp.pad(coly[:, :-1], ((0, 0), (1, 0))))
    occy = jnp.any(coly.reshape(sz, sx // xb, xb),
                   axis=2).astype(jnp.int32)

    def run_pass(bk):
        kern = functools.partial(_rebin_xy_kernel, ppc=P, sy=sy, sx=sx,
                                 yb=yb, xb=xb)
        ins = [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
               resh(bk.vy), resh(bk.vz), resh(bk.valid.astype(jnp.float32))]
        slab = pl.BlockSpec((P, 1, sy, sx), lambda k: (0, k, 0, 0),
                            memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kern,
            grid=(sz,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
                     + [slab] * 7,
            out_specs=tuple([slab] * 7),
            out_shape=tuple(jax.ShapeDtypeStruct((P, sz, sy, sx),
                                                 jnp.float32)
                            for _ in range(7)),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(occx, occy, *ins)
        return _finish_pass(bk, outs, dom, z_base)

    return jax.lax.cond(jnp.any(occx > 0) | jnp.any(occy > 0),
                        run_pass, lambda b: b, bk)


def _finish_pass(bk, outs, dom: Domain, z_base=None):
    """Flatten pass outputs, park invalid slots, account drops."""
    P, T = bk.ppc, bk.ncells
    flat = [o.reshape(P, T) for o in outs[:6]]
    new_valid = outs[6].reshape(P, T) > 0.5
    flat = _park_invalid(flat, new_valid, dom, z_base)
    total = jnp.sum(bk.valid.astype(jnp.int32))
    dropped = bk.dropped + (
        total - jnp.sum(new_valid.astype(jnp.int32))).astype(jnp.int32)
    from .flip_bucket import Buckets
    return Buckets(px=flat[0], py=flat[1], pz=flat[2], vx=flat[3],
                   vy=flat[4], vz=flat[5], valid=new_valid, dropped=dropped)


def rebin_pallas(bk, dom: Domain, interpret: bool = False):
    """Pallas rebin, natural (P, z, y, x) layout throughout: the plane-local
    x+y passes fused into one kernel (one HBM round trip instead of two,
    VMEM permitting — _xy_fusable), then the 3-plane streaming z pass.
    Drop-in for flip_bucket.rebin."""
    if _xy_fusable(bk.ppc, dom):
        bk = _rebin_xy_pallas(bk, dom, interpret)
    else:
        bk = _rebin_axis_pallas(bk, dom, 0, interpret)
        bk = _rebin_axis_pallas(bk, dom, 1, interpret)
    bk = _rebin_axis_pallas(bk, dom, 2, interpret)
    return bk


def _pick_yb(sy: int) -> int:
    """y-block size for the in-kernel occupancy loop: ~8 blocks per plane
    (matches round 3's skip granularity at 64^3 without blowing up the
    unrolled kernel size at larger grids)."""
    yb = max(8, sy // 8)
    return yb if sy % yb == 0 else sy


def _advect_call(bk, flags, vel, dt, dom: Domain, integration_mode,
                 stop_in_obstacle, ring_only, interpret,
                 vel_old=None, pending=None, flip_ratio: float = 0.0,
                 z_base=None, sz_global: int | None = None,
                 prehalo: bool = False):
    """Shared driver for advect_pallas / advect_blend_pallas.

    Sharded use (advect_blend_zshard): ``dom`` is the LOCAL slab domain,
    ``vel``/``vel_old``/``flags`` arrive PRE-HALOED+padded (lz+4, sy+4,
    sx+4), ``z_base`` is the shard's global z offset and ``sz_global``
    the global z extent."""
    import dataclasses

    sz, sy, sx = dom.shape
    P, T = bk.ppc, bk.ncells
    with_blend = vel_old is not None
    pad = [(0, 0), (_PAD, _PAD), (_PAD, _PAD), (_PAD, _PAD)]
    velp = vel if prehalo else jnp.pad(vel, pad)

    def zplane(dz, nc=3):
        # overlapping z-plane windows via the block index: plane k+dz of
        # the padded field lives at padded plane index k + _PAD + dz
        return pl.BlockSpec((nc, 1, sy + 2 * _PAD, sx + 2 * _PAD),
                            lambda k, dz=dz: (0, k + _PAD + dz, 0, 0),
                            memory_space=pltpu.VMEM)

    def zplane3(dz):
        return pl.BlockSpec((1, sy + 2 * _PAD, sx + 2 * _PAD),
                            lambda k, dz=dz: (k + _PAD + dz, 0, 0),
                            memory_space=pltpu.VMEM)

    pend = (jnp.full((1,), 1.0, jnp.float32) if pending is None
            else jnp.asarray(pending, jnp.float32).reshape(1))
    zb = (jnp.zeros((1,), jnp.float32) if z_base is None
          else jnp.asarray(z_base, jnp.float32).reshape(1))
    ins = [jnp.concatenate([jnp.full((1,), dt, jnp.float32), pend, zb])]
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM),     # (dt, pending)
             pl.BlockSpec(memory_space=pltpu.SMEM)]     # occupancy
    yb = _pick_yb(sy)
    ins.append(tile_max_count(bk.valid, dom, yb))
    for dz in range(-2, 3):
        ins.append(velp)
        specs.append(zplane(dz))
    if with_blend:
        oldp = vel_old if prehalo else jnp.pad(vel_old, pad)
        for dz in range(-1, 2):
            ins.append(oldp)
            specs.append(zplane(dz))
    if not ring_only:
        obsp = flags if prehalo else jnp.pad(
            ((flags & fl.TypeObstacle) != 0).astype(jnp.float32), pad[1:])
        for dz in range(-1, 2):
            ins.append(obsp)
            specs.append(zplane3(dz))

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    slab = pl.BlockSpec((P, 1, sy, sx), lambda k: (0, k, 0, 0),
                        memory_space=pltpu.VMEM)
    ins += [resh(bk.px), resh(bk.py), resh(bk.pz),
            resh(bk.valid.astype(jnp.float32))]
    specs += [slab] * 4
    if with_blend:
        ins += [resh(bk.vx), resh(bk.vy), resh(bk.vz)]
        specs += [slab] * 3
    n_out = 6 if with_blend else 3

    kern = functools.partial(_advect_kernel, shape=dom.shape, ppc=P, yb=yb,
                             integration_mode=integration_mode,
                             stop_in_obstacle=stop_in_obstacle,
                             ring_only=ring_only, with_blend=with_blend,
                             flip_ratio=float(flip_ratio),
                             sz_global=sz_global)
    out = pl.pallas_call(
        kern,
        grid=(sz,),
        in_specs=specs,
        out_specs=tuple([slab] * n_out),
        out_shape=tuple(jax.ShapeDtypeStruct((P, sz, sy, sx), jnp.float32)
                        for _ in range(n_out)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ins)
    nx, ny, nz = (o.reshape(P, T) for o in out[:3])
    if with_blend:
        nvx, nvy, nvz = (o.reshape(P, T) for o in out[3:])
        return dataclasses.replace(bk, px=nx, py=ny, pz=nz, vx=nvx, vy=nvy,
                                   vz=nvz)
    return dataclasses.replace(bk, px=nx, py=ny, pz=nz)


def advect_pallas(bk, flags, vel, dt, dom: Domain, integration_mode: int = 2,
                  stop_in_obstacle: bool = True, ring_only: bool = False,
                  interpret: bool = False):
    """Pallas advection over the bucket layout; drop-in for the positions
    part of flip_bucket.advect_bucketed."""
    return _advect_call(bk, flags, vel, dt, dom, integration_mode,
                        stop_in_obstacle, ring_only, interpret)


def advect_blend_pallas(bk, flags, vel, vel_old, dt, pending, flip_ratio,
                        dom: Domain, integration_mode: int = 2,
                        stop_in_obstacle: bool = True,
                        ring_only: bool = False, interpret: bool = False):
    """Fused flipVelocityUpdate + advection: applies the FLIP blend of
    (vel, vel_old) at the pre-advection (drift-0) positions when
    ``pending`` is true, then advects — one kernel, shared stage-1 taps
    (see module docstring). Equals flip_update_bucketed followed by
    advect_bucketed."""
    return _advect_call(bk, flags, vel, dt, dom, integration_mode,
                        stop_in_obstacle, ring_only, interpret,
                        vel_old=vel_old, pending=pending,
                        flip_ratio=flip_ratio)


# ---------------------------------------------------------------------------
# fused single-kernel rebin: all three axis passes streamed over z


def _pass_e(pcoord, validb, cax, n_axis):
    """Move direction per slot in {-1,0,1} (2 = invalid): truncate the
    position to its cell, clamp border escapes to stay (same safety net as
    flip_bucket._rebin_axis)."""
    e = jnp.clip(pcoord.astype(jnp.int32) - cax, -1, 1)
    tgt = cax + e
    e = jnp.where((tgt < 0) | (tgt >= n_axis), 0, e)
    return jnp.where(validb, e, 2)


def _compact_plane(fields, validb, e, ax):
    """Stable 3-way-merge compaction of one plane along in-plane axis `ax`
    (0=y/sublanes, 1=x/lanes). fields are 6x(P, sy, sx); returns
    (fields', validf') — invalid slots hold zeros (parking happens once, in
    the final z-pass). Same rank/offset algebra as _rebin_pass_tile."""
    P = fields[0].shape[0]
    plane = fields[0].shape[1:]
    want = [e == d for d in (-1, 0, 1)]
    run = [jnp.zeros(plane, jnp.int32) for _ in range(3)]
    cs = [[] for _ in range(3)]
    for p in range(P):
        for di in range(3):
            run[di] = run[di] + want[di][p].astype(jnp.int32)
            cs[di].append(run[di])
    o0 = _shift(run[0], -1, ax)
    o1 = _shift(run[0], -2, ax) + _shift(run[1], -1, ax)
    cs = [jnp.stack(c) for c in cs]
    fs = (jnp.where(want[0], cs[0] - 1, 0)
          + jnp.where(want[1], cs[1] - 1 + o0[None], 0)
          + jnp.where(want[2], cs[2] - 1 + o1[None], 0))
    news = [[] for _ in range(6)]
    vrows = []
    for s in range(P):
        accs = [jnp.zeros(plane, jnp.float32) for _ in range(6)]
        vrow = jnp.zeros(plane, jnp.float32)
        for di, d in enumerate((-1, 0, 1)):
            ind = (want[di] & (fs == s)).astype(jnp.float32)
            for fi in range(6):
                accs[fi] = accs[fi] + _shift(
                    jnp.sum(ind * fields[fi], axis=0), d, ax)
            vrow = vrow + _shift(jnp.sum(ind, axis=0), d, ax)
        for fi in range(6):
            news[fi].append(accs[fi])
        vrows.append(vrow)
    return [jnp.stack(n) for n in news], jnp.stack(vrows)


def _xy_plane(fields, validf, sy, sx):
    """x-pass then y-pass for one z-plane (both are plane-local)."""
    P = fields[0].shape[0]
    validb = validf > 0.5
    cx = jax.lax.broadcasted_iota(jnp.int32, (P, sy, sx), 2)
    fields, validf = _compact_plane(fields, validb,
                                    _pass_e(fields[0], validb, cx, sx), 1)
    validb = validf > 0.5
    cy = jax.lax.broadcasted_iota(jnp.int32, (P, sy, sx), 1)
    fields, validf = _compact_plane(fields, validb,
                                    _pass_e(fields[1], validb, cy, sy), 0)
    return fields, validf


def _rebin_fused_kernel(occ_ref, *refs, sz, sy, sx, ppc):
    """Streaming all-axes rebin: grid step t computes the xy-compacted
    plane t into a 3-slot ring buffer, then emits the z-pass result for
    plane t-1 from ring slots t-2..t (missing neighbors are empty planes).
    occ_ref is (sz+2,) plane occupancy padded with zeros both sides."""
    ins, outs, scr = refs[:7], refs[7:14], refs[14]
    P = ppc
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 3)

    def write_slot(sl, fields, validf):
        for fi in range(6):
            scr[pl.ds(sl * 7 + fi, 1)] = fields[fi][None]
        scr[pl.ds(sl * 7 + 6, 1)] = validf[None]

    def zero_slot(sl):
        z = jnp.zeros((1, P, sy, sx), jnp.float32)
        for fi in range(7):
            scr[pl.ds(sl * 7 + fi, 1)] = z

    @pl.when(t == 0)
    def _zero_xym1():     # ring slot of plane -1 = mod(-1,3) = 2
        zero_slot(jnp.int32(2))

    @pl.when((t < sz) & (occ_ref[t + 1] > 0))
    def _xy():
        fields = [ins[fi][:, 0] for fi in range(6)]
        f2, v2 = _xy_plane(fields, ins[6][:, 0], sy, sx)
        write_slot(slot, f2, v2)

    @pl.when(((t < sz) & (occ_ref[t + 1] == 0)) | (t == sz))
    def _xy_empty():
        zero_slot(slot)

    k = t - 1
    occ3 = occ_ref[jnp.maximum(k, 0)] + occ_ref[t] + occ_ref[t + 1]

    ccx = jax.lax.broadcasted_iota(jnp.int32, (P, sy, sx), 2).astype(
        jnp.float32) + 0.5
    ccy = jax.lax.broadcasted_iota(jnp.int32, (P, sy, sx), 1).astype(
        jnp.float32) + 0.5

    @pl.when((t >= 1) & (occ3 > 0))
    def _emit():
        # 2D parking coordinates: indexing the 3D iota (ccx[s]) SIGABRTs
        # the Mosaic compiler ("limits[i] <= dim(i)"); the rows are
        # s-independent anyway, so build them at plane rank
        ccx2 = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 1).astype(
            jnp.float32) + 0.5
        ccy2 = jax.lax.broadcasted_iota(jnp.int32, (sy, sx), 0).astype(
            jnp.float32) + 0.5

        def read_slot(j):          # plane j -> ring slot mod(j, 3), j >= -1
            sl = jax.lax.rem(j + 3, 3)
            fs_ = [scr[pl.ds(sl * 7 + fi, 1)][0] for fi in range(6)]
            return fs_, scr[pl.ds(sl * 7 + 6, 1)][0]
        # candidate groups in arrival order: g0 movers from k+1 (ez=-1),
        # g1 stayers at k, g2 movers from k-1 (ez=+1)
        srcs = []
        for j, d in ((k + 1, -1), (k, 0), (k - 1, 1)):
            fields, validf = read_slot(j)
            e = jnp.clip(fields[2].astype(jnp.int32) - j, -1, 1)
            tgt = j + e
            e = jnp.where((tgt < 0) | (tgt >= sz), 0, e)
            e = jnp.where(validf > 0.5, e, 2)
            w = e == d
            run = jnp.zeros((sy, sx), jnp.int32)
            cs = []
            for p in range(P):
                run = run + w[p].astype(jnp.int32)
                cs.append(run)
            srcs.append((fields, w, jnp.stack(cs), run))
        off = [jnp.zeros((sy, sx), jnp.int32), srcs[0][3],
               srcs[0][3] + srcs[1][3]]
        zc = k.astype(jnp.float32) + 0.5
        for s in range(P):
            accs = [jnp.zeros((sy, sx), jnp.float32) for _ in range(6)]
            vrow = jnp.zeros((sy, sx), jnp.float32)
            for gi in range(3):
                fields, w, cs, _ = srcs[gi]
                ind = (w & (cs - 1 + off[gi][None] == s)).astype(jnp.float32)
                for fi in range(6):
                    accs[fi] = accs[fi] + jnp.sum(ind * fields[fi], axis=0)
                vrow = vrow + jnp.sum(ind, axis=0)
            hit = vrow > 0.5
            outs[0][s, 0] = jnp.where(hit, accs[0], ccx2)
            outs[1][s, 0] = jnp.where(hit, accs[1], ccy2)
            outs[2][s, 0] = jnp.where(hit, accs[2], zc)
            for fi in range(3, 6):
                outs[fi][s, 0] = jnp.where(hit, accs[fi], 0.0)
            outs[6][s, 0] = vrow

    @pl.when((t >= 1) & (occ3 == 0))
    def _emit_parked():
        zc = k.astype(jnp.float32) + 0.5
        outs[0][...] = ccx[:, None]
        outs[1][...] = ccy[:, None]
        outs[2][...] = jnp.zeros((P, 1, sy, sx), jnp.float32) + zc
        for fi in range(3, 7):
            outs[fi][...] = jnp.zeros((P, 1, sy, sx), jnp.float32)


def rebin_fused(bk, dom: Domain, interpret: bool = False):
    """All three rebin passes as ONE streaming Pallas kernel (drop-in for
    rebin_pallas / flip_bucket.rebin). Avoids the 3-pass form's transposed
    y/z layouts (4 full HBM transpose round-trips of 7 (PPC,T) fields) and
    its per-pass XLA parking fixups: per step the kernel xy-compacts one
    z-plane in VMEM and z-merges it with its ring-buffered neighbors."""
    sz, sy, sx = dom.shape
    P, T = bk.ppc, bk.ncells

    def resh(a):
        return a.reshape(P, sz, sy, sx)

    ins = [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx), resh(bk.vy),
           resh(bk.vz), resh(bk.valid.astype(jnp.float32))]
    occ = jnp.pad(
        jnp.any(bk.valid.reshape(P, sz, sy * sx), axis=(0, 2)), (1, 1)
    ).astype(jnp.int32)
    in_spec = pl.BlockSpec((P, 1, sy, sx),
                           lambda t: (0, jnp.minimum(t, sz - 1), 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((P, 1, sy, sx),
                            lambda t: (0, jnp.maximum(t - 1, 0), 0, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_rebin_fused_kernel, sz=sz, sy=sy, sx=sx, ppc=P)
    outs = pl.pallas_call(
        kern,
        grid=(sz + 1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [in_spec] * 7,
        out_specs=tuple([out_spec] * 7),
        out_shape=tuple(jax.ShapeDtypeStruct((P, sz, sy, sx), jnp.float32)
                        for _ in range(7)),
        scratch_shapes=[pltpu.VMEM((21, P, sy, sx), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(occ, *ins)
    flat = [o.reshape(P, T) for o in outs[:6]]
    new_valid = outs[6].reshape(P, T) > 0.5
    total = jnp.sum(bk.valid.astype(jnp.int32))
    dropped = bk.dropped + (
        total - jnp.sum(new_valid.astype(jnp.int32))).astype(jnp.int32)
    from .flip_bucket import Buckets
    return Buckets(px=flat[0], py=flat[1], pz=flat[2], vx=flat[3],
                   vy=flat[4], vz=flat[5], valid=new_valid, dropped=dropped)


# ---------------------------------------------------------------------------
# multi-chip: z-slab-sharded fused advect+blend (SURVEY §2.16 cell-block
# particle sharding — halos ride the ICI)


def _halo_z(a, h: int, axis_name: str, n: int, zaxis: int):
    """Concatenate h-plane z halos from both mesh neighbors (lax.ppermute;
    edge shards get ppermute's zero fill, which matches the unsharded
    jnp.pad — out-of-range planes are never weight-selected)."""
    nl = a.shape[zaxis]
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]
    low = jax.lax.ppermute(
        jax.lax.slice_in_dim(a, nl - h, nl, axis=zaxis), axis_name, fwd)
    high = jax.lax.ppermute(
        jax.lax.slice_in_dim(a, 0, h, axis=zaxis), axis_name, bwd)
    return jnp.concatenate([low, a, high], axis=zaxis)


def advect_blend_zshard_spmd(bk, flags, vel, vel_old, dt, pending,
                             flip_ratio, dom: Domain, mesh,
                             axis_name: str = "z",
                             integration_mode: int = 2,
                             stop_in_obstacle: bool = True,
                             ring_only: bool = False):
    """advect_blend_pallas over a z-slab domain decomposition: grids and
    the z-major flat bucket axis sharded over mesh axis ``axis_name``
    (shard_flip_bucket_state layout); each shard exchanges +-2-plane
    velocity (and obstacle) halos with its neighbors via lax.ppermute,
    then runs the LOCAL plane-streaming kernel with its global z offset.
    Semantics identical to the single-chip kernel — particle coordinates
    stay global, weights for out-of-slab planes come from the halos."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    sz, sy, sx = dom.shape
    n = int(mesh.shape[axis_name])
    if sz % n != 0:
        raise ValueError(f"z extent {sz} not divisible by mesh axis {n}")
    lz = sz // n
    if lz < 2:
        raise ValueError("z slab of 1 plane unsupported")
    local_dom = Domain(size=(sx, sy, lz), dim=3)
    interpret = jax.default_backend() != "tpu"

    def body(px, py, pz, vx, vy, vz, valid, flags_l, vel_l, old_l, dtv,
             pend):
        zb = jax.lax.axis_index(axis_name) * lz
        pad_yx = [(0, 0), (0, 0), (_PAD, _PAD), (_PAD, _PAD)]
        velp = jnp.pad(_halo_z(vel_l, _PAD, axis_name, n, 1), pad_yx)
        oldp = jnp.pad(_halo_z(old_l, _PAD, axis_name, n, 1), pad_yx)
        if ring_only:
            obsp = None
        else:
            obs = ((flags_l & fl.TypeObstacle) != 0).astype(jnp.float32)
            obsp = jnp.pad(_halo_z(obs, _PAD, axis_name, n, 0), pad_yx[1:])
        from .flip_bucket import Buckets
        bk_l = Buckets(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                       valid=valid > 0.5, dropped=jnp.int32(0))
        out = _advect_call(bk_l, obsp, velp, dtv, local_dom,
                           integration_mode, stop_in_obstacle, ring_only,
                           interpret, vel_old=oldp, pending=pend,
                           flip_ratio=flip_ratio, z_base=zb, sz_global=sz,
                           prehalo=True)
        return out.px, out.py, out.pz, out.vx, out.vy, out.vz

    bspec = P(None, axis_name)
    gspec = P(axis_name)
    mspec = P(None, axis_name)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(bspec,) * 7 + (gspec, mspec, mspec, P(), P()),
        out_specs=(bspec,) * 6,
        check_vma=False)
    npx, npy, npz, nvx, nvy, nvz = f(
        bk.px, bk.py, bk.pz, bk.vx, bk.vy, bk.vz,
        bk.valid.astype(jnp.float32), flags, vel, vel_old,
        jnp.asarray(dt, jnp.float32), jnp.asarray(pending, jnp.float32))
    return dataclasses.replace(bk, px=npx, py=npy, pz=npz, vx=nvx, vy=nvy,
                               vz=nvz)


def _rebin_zpass_kernel_sh(sc_ref, occ_ref, *refs, ppc, sz_global):
    """Sharded z rebin pass over halo-extended input: ins are 7 fields x 3
    planes of the (P, lz+2, sy, sx) extended arrays at ext indices t+2,
    t+1, t (global zb+t+1, zb+t, zb+t-1); output plane t is global zb+t.
    Same candidate semantics as _rebin_zpass_kernel with global plane
    indices for the border force-stay tests."""
    ins = refs[:21]
    outs = refs[21:]
    t = pl.program_id(0)
    P = ppc
    tg = t + sc_ref[0]                           # global output plane

    def plane(fi, g):        # g: 0 = global t+1, 1 = t, 2 = t-1
        return ins[fi * 3 + g][:, 0]

    @pl.when(occ_ref[t] == 0)
    def _skip():
        for fi in range(7):
            outs[fi][:, 0] = plane(fi, 1)

    @pl.when(occ_ref[t] > 0)
    def _compute():
        blk = plane(0, 1).shape                  # (P, sy, sx)
        ok_hi = (tg < sz_global - 1).astype(jnp.int32)
        ok_lo = (tg > 0).astype(jnp.int32)
        sels, cands = [], [[] for _ in range(6)]
        for d, g, ok in ((-1, 0, ok_hi), (0, 1, 1), (1, 2, ok_lo)):
            s = tg - d                           # global source plane
            pz = plane(2, g)
            valid = plane(6, g) > 0.5
            e = jnp.clip(pz.astype(jnp.int32) - s, -1, 1)
            tgt = s + e
            e = jnp.where((tgt < 0) | (tgt >= sz_global), 0, e)
            sel = jnp.where(valid, (e == d).astype(jnp.int32), 0) * ok
            sels.append(sel)
            for fi in range(6):
                cands[fi].append(plane(fi, g))
        mark = jnp.concatenate(sels, axis=0)
        cand = [jnp.concatenate(c, axis=0) for c in cands]
        cand, total = _ranked_deliver(cand, mark, P)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (P,) + blk[1:], 0)
        for fi in range(6):
            outs[fi][:, 0] = cand[fi][:P]
        outs[6][:, 0] = (sidx < total).astype(jnp.float32)


def _rebin_z_sharded(bk, local_dom: Domain, zb, sz_global: int,
                     axis_name: str, n: int, interpret: bool):
    """z rebin pass for one z-slab shard: +-1-plane halos of all seven
    bucket fields from the mesh neighbors (lax.ppermute over ICI), then
    the local 3-plane streaming kernel with global plane offsets."""
    lz, sy, sx = local_dom.shape
    P, T = bk.ppc, bk.ncells

    def resh(a):
        return a.reshape(P, lz, sy, sx)

    fields = [resh(bk.px), resh(bk.py), resh(bk.pz), resh(bk.vx),
              resh(bk.vy), resh(bk.vz),
              resh(bk.valid.astype(jnp.float32))]
    ext = [_halo_z(f, 1, axis_name, n, 1) for f in fields]

    # movers per EXTENDED plane (global coords): occupancy for output
    # plane t needs movers in global planes t-1..t+1 — exactly ext t..t+2
    pzi = ext[2].astype(jnp.int32)
    validb = ext[6] > 0.5
    pidx = (jnp.arange(lz + 2, dtype=jnp.int32)[None, :, None, None]
            + jnp.asarray(zb, jnp.int32) - 1)
    e = jnp.clip(pzi - pidx, -1, 1)
    tgt = pidx + e
    e = jnp.where((tgt < 0) | (tgt >= sz_global), 0, e)
    movers = validb & (e != 0)
    mz_ext = jnp.any(movers, axis=(0, 2, 3))            # (lz+2,)
    occ = (mz_ext[:-2] | mz_ext[1:-1] | mz_ext[2:]).astype(jnp.int32)

    def run_pass(bk):
        def zspec(g):        # g: 0 = ext t+2, 1 = t+1, 2 = t
            return pl.BlockSpec((P, 1, sy, sx),
                                lambda t, g=g: (0, t + 2 - g, 0, 0),
                                memory_space=pltpu.VMEM)

        ins, specs = [], [pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM)]
        for f in ext:
            for g in (0, 1, 2):
                ins.append(f)
                specs.append(zspec(g))
        ospec = pl.BlockSpec((P, 1, sy, sx), lambda t: (0, t, 0, 0),
                             memory_space=pltpu.VMEM)
        kern = functools.partial(_rebin_zpass_kernel_sh, ppc=P,
                                 sz_global=sz_global)
        sc = jnp.asarray(zb, jnp.int32).reshape(1)
        outs = pl.pallas_call(
            kern,
            grid=(lz,),
            in_specs=specs,
            out_specs=tuple([ospec] * 7),
            out_shape=tuple(
                jax.ShapeDtypeStruct((P, lz, sy, sx), jnp.float32)
                for _ in range(7)),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sc, occ, *ins)
        return _finish_pass(bk, outs, local_dom, z_base=zb)

    return jax.lax.cond(jnp.any(occ > 0), run_pass, lambda b: b, bk)


def rebin_zshard_spmd(bk, dom: Domain, mesh, axis_name: str = "z"):
    """Full rebin under z-slab sharding (drop-in for flip_bucket.rebin on
    a sharded FlipBucketState): the x/y passes are purely in-plane, so the
    single-chip Pallas passes run unchanged on each local slab; the z pass
    exchanges +-1-plane field halos over ICI (_rebin_z_sharded). Per-shard
    drop counts are psum'd. Matches SURVEY §2.16 cell-block particle
    sharding."""
    import dataclasses

    from jax.sharding import PartitionSpec as P

    sz, sy, sx = dom.shape
    n = int(mesh.shape[axis_name])
    if sz % n != 0:
        raise ValueError(f"z extent {sz} not divisible by mesh axis {n}")
    lz = sz // n
    local_dom = Domain(size=(sx, sy, lz), dim=3)
    interpret = jax.default_backend() != "tpu"

    def body(px, py, pz, vx, vy, vz, validf):
        from .flip_bucket import Buckets
        zb = jax.lax.axis_index(axis_name) * lz
        bk_l = Buckets(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                       valid=validf > 0.5, dropped=jnp.int32(0))
        if _xy_fusable(bk_l.ppc, local_dom):
            bk_l = _rebin_xy_pallas(bk_l, local_dom, interpret, z_base=zb)
        else:
            bk_l = _rebin_axis_pallas(bk_l, local_dom, 0, interpret,
                                      z_base=zb)
            bk_l = _rebin_axis_pallas(bk_l, local_dom, 1, interpret,
                                      z_base=zb)
        bk_l = _rebin_z_sharded(bk_l, local_dom, zb, sz, axis_name, n,
                                interpret)
        dropped = jax.lax.psum(bk_l.dropped, axis_name)
        return (bk_l.px, bk_l.py, bk_l.pz, bk_l.vx, bk_l.vy, bk_l.vz,
                bk_l.valid.astype(jnp.float32), dropped)

    bspec = P(None, axis_name)
    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(bspec,) * 7,
        out_specs=(bspec,) * 7 + (P(),),
        check_vma=False)
    npx, npy, npz, nvx, nvy, nvz, nvalid, ndrop = f(
        bk.px, bk.py, bk.pz, bk.vx, bk.vy, bk.vz,
        bk.valid.astype(jnp.float32))
    return dataclasses.replace(bk, px=npx, py=npy, pz=npz, vx=nvx, vy=nvy,
                               vz=nvz, valid=nvalid > 0.5,
                               dropped=bk.dropped + ndrop)
