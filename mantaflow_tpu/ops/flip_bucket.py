"""Cell-bucketed particle pipeline: every FLIP transfer as dense stencil math.

TPU-native redesign of the particle side of ``plugin/flip.cpp``. The round-2
flat layout moved data with XLA gathers/scatters, whose TPU cost is ~15 ns
per *index* regardless of row width — at 0.5M particles each of the ~10
particle passes in a FLIP step paid 7-9 ms. Here particles live in a padded
per-cell bucket layout ``(PPC, T)`` (T = flat cell count, PPC = max
particles per cell), so every transfer becomes a *dense* windowed stencil:

- velocity evaluation (advection RK4 stages, ``interpolMAC``
  interpol.h:131-166) = per-tap separable weights x rolled grids;
- p2g (``mapPartsToMAC`` flip.cpp:637-662) = per-tap weighted reductions
  over the bucket axis, rolled back into the grid;
- g2p / FLIP blend (``flipVelocityUpdate`` flip.cpp:727-744) = the same
  window weights applied to (vel, vel_old);
- union particle levelset (``unionParticleLevelset`` flip.cpp:300-363) =
  27-neighborhood min over rolled buckets;
- ``markFluidCells`` counts (flip.cpp:166-190) = a free reduction over the
  bucket axis.

Rebinning after advection exploits the CFL contract (particles move at most
one cell per step; displacements are clamped to guarantee it): three 1-D
axis passes, each packing the <=3*PPC candidates per cell (left/stay/right)
back into PPC slots with a cumsum + indicator contraction. No sort, no
scatter, no gather anywhere in the step.

Numerics per particle are identical to the flat path (same BUILD_INDEX
clamping, same nested weight products); only float *summation order* in p2g
differs, so bucketed == flat to ~1e-5.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flags as fl
from ..core.domain import Domain
from ..core.masks import interior_mask
from ..core.particles import Particles, make_particles

_BIG = float(1e10)  # python float: inlines as a literal, never a device-const buffer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Buckets:
    """Padded per-cell particle store: slot-major (PPC, T) arrays.

    Invalid slots hold the owning cell's center (harmless window math) and
    zero velocity. ``dropped`` counts particles lost to bucket overflow
    (diagnostic; zero in practice at sane particle densities).
    """
    px: jnp.ndarray      # (P, T) float32 — absolute grid coords
    py: jnp.ndarray
    pz: jnp.ndarray
    vx: jnp.ndarray      # (P, T) float32 — particle velocity channels
    vy: jnp.ndarray
    vz: jnp.ndarray
    valid: jnp.ndarray   # (P, T) bool
    dropped: jnp.ndarray  # () int32

    @property
    def ppc(self) -> int:
        return self.px.shape[0]

    @property
    def ncells(self) -> int:
        return self.px.shape[1]

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _cell_coords(dom: Domain):
    """Flat-index cell coordinates (T,) int32: x fastest (grid.h:77-79)."""
    sz, sy, sx = dom.shape
    t = jnp.arange(sz * sy * sx, dtype=jnp.int32)
    cx = t % sx
    cy = (t // sx) % sy
    cz = t // (sx * sy)
    return cx, cy, cz


def _cell_centers(dom: Domain):
    cx, cy, cz = _cell_coords(dom)
    return (cx.astype(jnp.float32) + 0.5, cy.astype(jnp.float32) + 0.5,
            cz.astype(jnp.float32) + 0.5)


# ---------------------------------------------------------------------------
# binning


def bin_from_particles(parts: Particles, pvel, dom: Domain,
                       ppc: int = 12) -> Buckets:
    """Host-side initial binning of a flat particle set (setup only; the
    in-step rebin below never leaves the device)."""
    sz, sy, sx = dom.shape
    T = sz * sy * sx
    pos = np.asarray(parts.pos)
    vel = np.asarray(pvel)
    active = np.asarray(parts.active_mask())

    i = np.clip(pos[:, 0].astype(np.int64), 0, sx - 1)
    j = np.clip(pos[:, 1].astype(np.int64), 0, sy - 1)
    k = np.clip(pos[:, 2].astype(np.int64), 0, sz - 1)
    key = (k * sy + j) * sx + i
    key = np.where(active, key, T)  # inactive sort to the end

    order = np.argsort(key, kind="stable")
    skey = key[order]
    idx = np.arange(len(skey))
    is_start = np.ones(len(skey), bool)
    is_start[1:] = skey[1:] != skey[:-1]
    run_start = np.maximum.accumulate(np.where(is_start, idx, 0))
    slot = idx - run_start
    keep = (skey < T) & (slot < ppc)

    ccx, ccy, ccz = (np.asarray(a) for a in _cell_centers(dom))
    bpx = np.broadcast_to(ccx, (ppc, T)).copy()
    bpy = np.broadcast_to(ccy, (ppc, T)).copy()
    bpz = np.broadcast_to(ccz, (ppc, T)).copy()
    bvx = np.zeros((ppc, T), np.float32)
    bvy = np.zeros((ppc, T), np.float32)
    bvz = np.zeros((ppc, T), np.float32)
    bvalid = np.zeros((ppc, T), bool)

    sp = pos[order][keep]
    sv = vel[order][keep]
    tgt_s = slot[keep]
    tgt_c = skey[keep]
    bpx[tgt_s, tgt_c] = sp[:, 0]
    bpy[tgt_s, tgt_c] = sp[:, 1]
    bpz[tgt_s, tgt_c] = sp[:, 2]
    bvx[tgt_s, tgt_c] = sv[:, 0]
    bvy[tgt_s, tgt_c] = sv[:, 1]
    bvz[tgt_s, tgt_c] = sv[:, 2]
    bvalid[tgt_s, tgt_c] = True
    dropped = int(np.sum((skey < T) & (slot >= ppc)))

    return Buckets(px=jnp.asarray(bpx), py=jnp.asarray(bpy),
                   pz=jnp.asarray(bpz), vx=jnp.asarray(bvx),
                   vy=jnp.asarray(bvy), vz=jnp.asarray(bvz),
                   valid=jnp.asarray(bvalid), dropped=jnp.int32(dropped))


def rebin_to_ppc(bk: Buckets, dom: Domain, ppc: int) -> Buckets:
    """Host-side re-bin of an existing bucket set at a different PPC
    (used by the auto-escalation driver when a step overflowed)."""
    import dataclasses as _dc
    from ..core.particles import make_particles

    valid = np.asarray(bk.valid).reshape(-1)
    pos = np.stack([np.asarray(a).reshape(-1)[valid]
                    for a in (bk.px, bk.py, bk.pz)], axis=-1)
    vel = np.stack([np.asarray(a).reshape(-1)[valid]
                    for a in (bk.vx, bk.vy, bk.vz)], axis=-1)
    parts = make_particles(pos, capacity=len(pos))
    out = bin_from_particles(parts, jnp.asarray(vel), dom, ppc=ppc)
    if int(out.dropped) != 0:
        raise ValueError(f"rebin_to_ppc: ppc={ppc} still overflows "
                         f"(max occupancy {max_cell_occupancy(bk, dom)})")
    return _dc.replace(out, dropped=bk.dropped)


def max_cell_occupancy(bk: Buckets, dom: Domain) -> int:
    """Host-side max per-cell particle count by POSITION (not by stored
    bucket): the minimum PPC a rebin of this state needs."""
    sz, sy, sx = dom.shape
    valid = np.asarray(bk.valid).reshape(-1)
    if not valid.any():
        return 0
    i = np.clip(np.asarray(bk.px).reshape(-1)[valid].astype(np.int64),
                0, sx - 1)
    j = np.clip(np.asarray(bk.py).reshape(-1)[valid].astype(np.int64),
                0, sy - 1)
    k = np.clip(np.asarray(bk.pz).reshape(-1)[valid].astype(np.int64),
                0, sz - 1)
    return int(np.bincount((k * sy + j) * sx + i,
                           minlength=sx * sy * sz).max())


def to_particles(bk: Buckets, dom: Domain, capacity: int | None = None):
    """Flatten buckets back to a flat Particles + pvel (host/test path)."""
    valid = np.asarray(bk.valid).reshape(-1)
    pos = np.stack([np.asarray(bk.px).reshape(-1)[valid],
                    np.asarray(bk.py).reshape(-1)[valid],
                    np.asarray(bk.pz).reshape(-1)[valid]], axis=-1)
    vel = np.stack([np.asarray(bk.vx).reshape(-1)[valid],
                    np.asarray(bk.vy).reshape(-1)[valid],
                    np.asarray(bk.vz).reshape(-1)[valid]], axis=-1)
    parts = make_particles(pos, capacity)
    pvel = np.zeros((parts.capacity, 3), np.float32)
    pvel[:len(vel)] = vel
    return parts, jnp.asarray(pvel)


# ---------------------------------------------------------------------------
# windowed weights (BUILD_INDEX semantics on (P, T) arrays)


def _axw(p, n: int):
    """interpol.h BUILD_INDEX per-axis base+weight with border clamping
    (same math as core.interp._axis_weights, on bucket-shaped arrays)."""
    idx = p.astype(jnp.int32)
    w = p - idx.astype(p.dtype)
    lo = p < 0.0
    idx = jnp.where(lo, 0, idx)
    w = jnp.where(lo, jnp.zeros_like(w), w)
    hi = p >= (n - 1)
    idx = jnp.where(hi, n - 2, idx)
    w = jnp.where(hi, jnp.ones_like(w), w)
    return idx, w


def _tap_weights(b_rel, w1, taps):
    """Weight attached to cell (bucket + d) for each window tap d: the
    linear pair (1-w1, w1) lands at slots b_rel, b_rel+1."""
    out = []
    for d in taps:
        out.append(jnp.where(b_rel == d, 1.0 - w1, 0.0)
                   + jnp.where(b_rel == (d - 1), w1, 0.0))
    return out


_MAC_SHIFTS = ((0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0))


def _mac_eval(vel_grids, dom: Domain, px, py, pz, cx, cy, cz,
              own_taps, cross_taps):
    """interpolMAC at bucket positions via separable window taps.

    ``vel_grids`` is a list of one or more (3,Z,Y,X) MAC grids evaluated
    with *shared* weights (vel + vel_old for the FLIP blend). Returns a list
    of (u, v, w) tuples of (P, T) arrays.
    """
    sz, sy, sx = dom.shape
    outs = [[] for _ in vel_grids]
    for c in range(3):
        ox, oy, oz = _MAC_SHIFTS[c]
        bx, wx1 = _axw(px - ox, sx)
        by, wy1 = _axw(py - oy, sy)
        bz, wz1 = _axw(pz - oz, sz)
        tx = own_taps if c == 0 else cross_taps
        ty = own_taps if c == 1 else cross_taps
        tz = own_taps if c == 2 else cross_taps
        wx = _tap_weights(bx - cx, wx1, tx)
        wy = _tap_weights(by - cy, wy1, ty)
        wz = _tap_weights(bz - cz, wz1, tz)
        flats = [g[c].reshape(-1) for g in vel_grids]
        accs = [jnp.float32(0.0) for _ in vel_grids]
        for iz, dz in enumerate(tz):
            for iy, dy in enumerate(ty):
                wzy = wz[iz] * wy[iy]
                inners = [jnp.float32(0.0) for _ in vel_grids]
                for ix, dx in enumerate(tx):
                    off = (dz * sy + dy) * sx + dx
                    for gi, gf in enumerate(flats):
                        inners[gi] = inners[gi] + wx[ix] * jnp.roll(gf, -off)
                for gi in range(len(vel_grids)):
                    accs[gi] = accs[gi] + wzy * inners[gi]
        for gi in range(len(vel_grids)):
            outs[gi].append(accs[gi])
    return [tuple(o) for o in outs]


def _obstacle_at(obs_flat, dom: Domain, px, py, pz, cx, cy, cz,
                 taps=(-1, 0, 1)):
    """flags-at-trunc(pos) obstacle test (particle.h:485-492 semantics) as a
    27-tap indicator select; positions guaranteed within +-1 cell of the
    bucket."""
    sz, sy, sx = dom.shape
    ix = jnp.clip(px.astype(jnp.int32), 0, sx - 1) - cx
    iy = jnp.clip(py.astype(jnp.int32), 0, sy - 1) - cy
    iz = jnp.clip(pz.astype(jnp.int32), 0, sz - 1) - cz
    hit = jnp.zeros(px.shape, bool)
    for dz in taps:
        mz = iz == dz
        for dy in taps:
            mzy = mz & (iy == dy)
            for dx in taps:
                off = (dz * sy + dy) * sx + dx
                hit = hit | (mzy & (ix == dx) & jnp.roll(obs_flat, -off))
    return hit


def _in_bounds_pt(px, py, pz, dom: Domain, bnd):
    sz, sy, sx = dom.shape
    return ((px >= bnd) & (px < sx - bnd) & (py >= bnd) & (py < sy - bnd)
            & (pz >= bnd) & (pz < sz - bnd))


# ---------------------------------------------------------------------------
# advection (advectInGrid particle.h:527-551, integrator.h:49-72 RK4)

# Window taps per drift bound (how far a stage position can sit from its
# bucket cell): stage-1 positions are exactly in-bucket (drift 0), RK
# midpoints drift <= 0.5 cells, the final stage <= 1 cell (displacements are
# clamped to 1 cell/axis — the CFL contract). Sizing windows per stage cuts
# the tap count from 300/stage to 54..108.
_TAPS = {
    0.0: ((0, 1), (-1, 0, 1), (0,)),
    0.5: ((-1, 0, 1, 2), (-1, 0, 1), (-1, 0, 1)),
    1.0: ((-1, 0, 1, 2), (-2, -1, 0, 1, 2), (-1, 0, 1)),
}


def advect_bucketed(bk: Buckets, flags, vel, dt, dom: Domain,
                    integration_mode: int = 2,
                    stop_in_obstacle: bool = True,
                    ring_only: bool = False) -> Buckets:
    """RK4/RK2/Euler particle advection on the bucket layout. Stage
    displacements are clamped to one cell per axis (the CFL contract the
    window taps rely on; benchmark scenes run CFL<=1 so the clamp never
    engages).

    ``ring_only=True`` asserts statically that the ONLY obstacle cells are
    the domain boundary ring (bnd=1), so every flags-at-trunc(pos) obstacle
    probe (particle.h:485-492) reduces to the bounds test — trunc(pos) is in
    the ring iff pos < 1 or pos >= n-1 on some axis. Bit-identical to the
    general path for such scenes; scenes with interior obstacles must keep
    the default."""
    cx, cy, cz = _cell_coords(dom)
    obs_flat = ((flags.reshape(-1) & fl.TypeObstacle) != 0)
    live = bk.valid

    def obstacle_probe(px, py, pz, taps):
        if ring_only:
            return ~_in_bounds_pt(px, py, pz, dom, 1)
        return _obstacle_at(obs_flat, dom, px, py, pz, cx, cy, cz, taps)

    def eval_u(px, py, pz, drift):
        own, cross, obs_taps = _TAPS[drift]
        (uvw,) = _mac_eval([vel], dom, px, py, pz, cx, cy, cz, own, cross)
        u = jnp.clip(uvw[0] * dt, -1.0, 1.0)
        v = jnp.clip(uvw[1] * dt, -1.0, 1.0)
        w = jnp.clip(uvw[2] * dt, -1.0, 1.0)
        if stop_in_obstacle:
            if ring_only:
                bad = ~_in_bounds_pt(px, py, pz, dom, 1)
            elif obs_taps == (0,):
                bad = (~_in_bounds_pt(px, py, pz, dom, 1)
                       | obs_flat[None, :])
            else:
                bad = (~_in_bounds_pt(px, py, pz, dom, 1)
                       | _obstacle_at(obs_flat, dom, px, py, pz, cx, cy, cz,
                                      obs_taps))
            u = jnp.where(bad, 0.0, u)
            v = jnp.where(bad, 0.0, v)
            w = jnp.where(bad, 0.0, w)
        return u, v, w

    x0, y0, z0 = bk.px, bk.py, bk.pz
    u0 = eval_u(x0, y0, z0, 0.0)
    if integration_mode == 0:
        du, dv, dw = u0
    elif integration_mode == 1:
        u1 = eval_u(x0 + 0.5 * u0[0], y0 + 0.5 * u0[1], z0 + 0.5 * u0[2],
                    0.5)
        du, dv, dw = u1
    elif integration_mode == 2:
        # fork RK4 weights (2,2,2,1)/6 (util/integrator.h:49-72 "zl")
        u1 = eval_u(x0 + 0.5 * u0[0], y0 + 0.5 * u0[1], z0 + 0.5 * u0[2],
                    0.5)
        u2 = eval_u(x0 + 0.5 * u1[0], y0 + 0.5 * u1[1], z0 + 0.5 * u1[2],
                    0.5)
        u3 = eval_u(x0 + u2[0], y0 + u2[1], z0 + u2[2], 1.0)
        du = (2 * u0[0] + 2 * u1[0] + 2 * u2[0] + u3[0]) / 6.0
        dv = (2 * u0[1] + 2 * u1[1] + 2 * u2[1] + u3[1]) / 6.0
        dw = (2 * u0[2] + 2 * u1[2] + 2 * u2[2] + u3[2]) / 6.0
    else:
        raise ValueError("unknown integration type")

    nx = x0 + jnp.clip(du, -1.0, 1.0)
    ny = y0 + jnp.clip(dv, -1.0, 1.0)
    nz = z0 + jnp.clip(dw, -1.0, 1.0)

    # KnClampPositions (particle.h:508-525)
    sz, sy, sx = dom.shape
    nx = jnp.clip(nx, 0.0, sx - 1.0)
    ny = jnp.clip(ny, 0.0, sy - 1.0)
    nz = jnp.clip(nz, 0.0, sz - 1.0)
    if stop_in_obstacle:
        in_obs = obstacle_probe(nx, ny, nz, (-1, 0, 1))
        # bisectBacktracePos (particle.h:494-505): 4 bisection probes
        s = jnp.zeros_like(nx)
        for i in range(1, 5):
            ds = 1.0 / (1 << i)
            t = s + ds
            bx_ = x0 * (1.0 - t) + nx * t
            by_ = y0 * (1.0 - t) + ny * t
            bz_ = z0 * (1.0 - t) + nz * t
            obs = obstacle_probe(bx_, by_, bz_, (-1, 0, 1))
            s = jnp.where(obs, s, t)
        fx = x0 * (1.0 - s) + nx * s
        fy = y0 * (1.0 - s) + ny * s
        fz = z0 * (1.0 - s) + nz * s
        nx = jnp.where(in_obs, fx, nx)
        ny = jnp.where(in_obs, fy, ny)
        nz = jnp.where(in_obs, fz, nz)

    nx = jnp.where(live, nx, x0)
    ny = jnp.where(live, ny, y0)
    nz = jnp.where(live, nz, z0)
    return dataclasses.replace(bk, px=nx, py=ny, pz=nz)


# ---------------------------------------------------------------------------
# rebinning: three 1-D axis passes of dense compaction


def _rebin_axis(bk: Buckets, dom: Domain, axis: int) -> Buckets:
    """Move particles whose position along `axis` left the bucket cell to
    the +-1 neighbor. Destination slots per cell are unique and arrival
    order is (from c+1, stay, from c-1) with source order preserved inside
    each group, so the pass is exactly a stable 3-way merge: stack the three
    rolled candidate groups along the slot axis, stable-sort the 3*PPC
    column by group key (invalid candidates keyed last), keep the first PPC
    rows. One lax.sort per pass — no ranks, no one-hot contraction (an
    earlier dot_general form hit a pathological XLA:CPU concatenate-fusion
    emitter: 90 s/step at 16^3). axis: 0=x, 1=y, 2=z."""
    sz, sy, sx = dom.shape
    P, T = bk.ppc, bk.ncells
    cx, cy, cz = _cell_coords(dom)
    caxis = (cx, cy, cz)[axis]
    n_axis = (sx, sy, sz)[axis]
    stride = (1, sx, sx * sy)[axis]
    p_axis = (bk.px, bk.py, bk.pz)[axis]

    e = jnp.clip(p_axis.astype(jnp.int32) - caxis, -1, 1)
    # movers beyond the axis border can't exist (obstacle ring + clamp);
    # force-stay as a safety net rather than corrupting a wrapped row
    tgt = caxis + e
    e = jnp.where((tgt < 0) | (tgt >= n_axis), 0, e)
    e = jnp.where(bk.valid, e, 2)  # invalid slots belong to no block

    total = jnp.sum(bk.valid.astype(jnp.int32))
    fields = (bk.px, bk.py, bk.pz, bk.vx, bk.vy, bk.vz)

    # candidate groups in arrival order (g=0: movers from c+1, g=1: stayers,
    # g=2: movers from c-1), rolled into the destination cell's frame; the
    # wrap rows of the roll only ever carry e!=d slots (border movers were
    # forced to stay above), so they are keyed invalid
    keys = []
    cand = [[] for _ in range(6)]
    for g, d in enumerate((-1, 0, 1)):
        sel = jnp.roll(e == d, d * stride, axis=-1)
        keys.append(jnp.where(sel, jnp.int32(g), jnp.int32(3)))
        for fi in range(6):
            cand[fi].append(jnp.roll(fields[fi], d * stride, axis=-1))
    key = jnp.concatenate(keys, axis=0)                    # (3P, T)
    ops = [jnp.concatenate(c, axis=0) for c in cand]
    sorted_ = jax.lax.sort([key] + ops, dimension=0, is_stable=True,
                           num_keys=1)
    new_valid = sorted_[0][:P] < 3
    outs = [s[:P] for s in sorted_[1:]]
    dropped = (bk.dropped
               + (total - jnp.sum(new_valid.astype(jnp.int32))).astype(
                   jnp.int32))

    # park invalid slots at the cell center with zero velocity
    ccx, ccy, ccz = _cell_centers(dom)
    centers = (ccx, ccy, ccz)
    for fi in range(3):
        outs[fi] = jnp.where(new_valid, outs[fi], centers[fi][None, :])
    for fi in range(3, 6):
        outs[fi] = jnp.where(new_valid, outs[fi], 0.0)

    return Buckets(px=outs[0], py=outs[1], pz=outs[2], vx=outs[3],
                   vy=outs[4], vz=outs[5], valid=new_valid, dropped=dropped)


def rebin(bk: Buckets, dom: Domain) -> Buckets:
    """Full rebin after advection (displacement <= 1 cell per axis)."""
    bk = _rebin_axis(bk, dom, 0)
    bk = _rebin_axis(bk, dom, 1)
    bk = _rebin_axis(bk, dom, 2)
    return bk


# ---------------------------------------------------------------------------
# transfers at drift-0 positions (right after rebin)

_T0_OWN = (0, 1)
_T0_CROSS = (-1, 0, 1)


def p2g_mac(bk: Buckets, dom: Domain):
    """mapPartsToMAC (flip.cpp:637-662) as dense per-tap reductions: for
    each window tap, reduce weight/weighted-velocity over the bucket axis
    and roll the per-cell partials onto the target faces. Returns
    (vel, stomped weight) with the flat path's epsilon semantics."""
    sz, sy, sx = dom.shape
    T = bk.ncells
    cx, cy, cz = _cell_coords(dom)
    af = bk.valid.astype(jnp.float32)
    pvel = (bk.vx, bk.vy, bk.vz)

    vels, weights = [], []
    for c in range(3):
        ox, oy, oz = _MAC_SHIFTS[c]
        bx, wx1 = _axw(bk.px - ox, sx)
        by, wy1 = _axw(bk.py - oy, sy)
        bz, wz1 = _axw(bk.pz - oz, sz)
        tx = _T0_OWN if c == 0 else _T0_CROSS
        ty = _T0_OWN if c == 1 else _T0_CROSS
        tz = _T0_OWN if c == 2 else _T0_CROSS
        wx = _tap_weights(bx - cx, wx1, tx)
        wy = _tap_weights(by - cy, wy1, ty)
        wz = _tap_weights(bz - cz, wz1, tz)
        acc = jnp.zeros((T,), jnp.float32)
        wsum = jnp.zeros((T,), jnp.float32)
        vc = pvel[c]
        for iz, dz in enumerate(tz):
            for iy, dy in enumerate(ty):
                wzy = wz[iz] * wy[iy] * af
                for ix, dx in enumerate(tx):
                    w = wzy * wx[ix]
                    off = (dz * sy + dy) * sx + dx
                    wsum = wsum + jnp.roll(jnp.sum(w, axis=0), off)
                    acc = acc + jnp.roll(jnp.sum(w * vc, axis=0), off)
        vels.append(acc)
        weights.append(wsum)
    weight = jnp.stack(weights).reshape((3,) + dom.shape)
    vel_acc = jnp.stack(vels).reshape((3,) + dom.shape)
    weight_st = jnp.where(weight < 1e-6, 0.0, weight)
    vel = jnp.where(weight_st > 0, vel_acc / jnp.maximum(weight_st, 1e-30),
                    0.0)
    return vel, weight_st


def flip_update_bucketed(bk: Buckets, vel, vel_old, flip_ratio: float,
                         dom: Domain) -> Buckets:
    """flipVelocityUpdate (flip.cpp:727-744): one shared-weight window pass
    over both grids, then the FLIP/PIC blend."""
    cx, cy, cz = _cell_coords(dom)
    v_old, v_new = _mac_eval([vel_old, vel], dom, bk.px, bk.py, bk.pz,
                             cx, cy, cz, _T0_OWN, _T0_CROSS)
    news = []
    for c, (pv) in enumerate((bk.vx, bk.vy, bk.vz)):
        blended = (flip_ratio * (pv + (v_new[c] - v_old[c]))
                   + (1.0 - flip_ratio) * v_new[c])
        news.append(jnp.where(bk.valid, blended, pv))
    return dataclasses.replace(bk, vx=news[0], vy=news[1], vz=news[2])


def counts_bucketed(bk: Buckets, dom: Domain):
    """Per-cell particle counts (gridParticleIndex counter, flip.cpp:274)."""
    return jnp.sum(bk.valid.astype(jnp.int32), axis=0).reshape(dom.shape)


def mark_fluid_cells_bucketed(bk: Buckets, flags, dom: Domain):
    """markFluidCells (flip.cpp:166-190) from bucket counts."""
    cleared = jnp.where(fl.is_fluid(flags),
                        (flags | fl.TypeEmpty) & ~fl.TypeFluid, flags)
    occupied = counts_bucketed(bk, dom) > 0
    mark = occupied & fl.is_empty(cleared)
    return jnp.where(mark, (cleared | fl.TypeFluid) & ~fl.TypeEmpty, cleared)


def union_levelset_bucketed(bk: Buckets, dom: Domain,
                            radius_factor: float = 1.0):
    """unionParticleLevelset (flip.cpp:300-363): per-cell min of
    |center - p| - radius over the (2*rw+1)^3 neighborhood buckets, with
    rw = int(radius)+1 cells so the window covers the particle radius
    (matches the flat path's widening for radius_factor > ~1.14)."""
    sz, sy, sx = dom.shape
    radius = 0.5 * ((math.sqrt(3.0) if dom.is3d else math.sqrt(2.0))
                    * (radius_factor + 0.01))
    rw = int(radius) + 1
    ccx, ccy, ccz = _cell_centers(dom)
    # squared-distance form: offsets relative to the particle's OWN cell
    # center are computed once; each neighborhood offset is then 3 FMAs and
    # a min-reduce over slots (sqrt deferred to the folded (T,) result)
    ex = jnp.where(bk.valid, bk.px - ccx[None, :], 0.0)
    ey = jnp.where(bk.valid, bk.py - ccy[None, :], 0.0)
    ez = jnp.where(bk.valid, bk.pz - ccz[None, :], 0.0)
    r2 = ex * ex + ey * ey + ez * ez
    d2min = jnp.full((bk.ncells,), _BIG)
    cx, cy, cz = _cell_coords(dom)
    taps = range(-rw, rw + 1)
    for dz in taps:
        for dy in taps:
            for dx in taps:
                off = (dz * sy + dy) * sx + dx
                # distance^2 from own-bucket particles to center of c+d,
                # folded to the destination cell with a (T,) roll
                c2 = float(dx * dx + dy * dy + dz * dz)
                d2 = r2 - 2.0 * (ex * dx + ey * dy + ez * dz) + c2
                part = jnp.min(jnp.where(bk.valid, d2, _BIG), axis=0)
                rolled = jnp.roll(part, off)
                # guard the roll's wraparound: the source cell c-d must
                # exist (for rw >= 2 wrapped rows reach past the masked
                # bnd=1 ring)
                src_ok = ((cx - dx >= 0) & (cx - dx < sx)
                          & (cy - dy >= 0) & (cy - dy < sy)
                          & (cz - dz >= 0) & (cz - dz < sz))
                d2min = jnp.minimum(d2min, jnp.where(src_ok, rolled, _BIG))
    phi = jnp.where(d2min >= _BIG, radius,
                    jnp.sqrt(jnp.maximum(d2min, 0.0)) - radius)
    phi = jnp.minimum(phi, radius).reshape(dom.shape)
    return jnp.where(interior_mask(dom, 1), phi, 0.5)
