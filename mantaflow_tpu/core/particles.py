"""Particle system: fixed-capacity SoA arrays with alive masks.

Behavioral port of ``source/particle.h/.cpp`` re-designed for XLA's static
shapes: where the reference uses a growable AoS vector with lazy deletion +
compaction (particle.h:104-156), state here is a fixed-capacity pytree —
``pos (N,3)``, ``flags (N,)``, ``count`` — and "deleted" is a flag bit, so
every kernel is a masked vector op. Compaction is unnecessary for
correctness (masked ops skip dead particles); capacity is chosen at sampling
time with headroom for reseeding.

Covered here: particle advection (GridAdvectKernel + integratePointSet,
particle.h:457-551 / util/integrator.h:23-72 — including this fork's RK4
weighting (2,2,2,1)/6, integrator.h:53-57 "zl"), position clamping with
bisection backtrace (particle.h:494-525), projectOutOfBnd (:581-607),
pushOutofObs (plugin/flip.cpp:580-601), and host-side samplers
(plugin/flip.cpp:32-165).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .domain import Domain
from . import flags as fl
from .interp import interpol, interpol_mac, interpol_mac_fast, mac_corner_tables

# particle flag bits (particle.h:35-42)
PNONE = 0
PNEW = 1 << 0
PSPRAY = 1 << 1
PBUBBLE = 1 << 2
PFOAM = 1 << 3
PTRACER = 1 << 4
PDELETE = 1 << 10
PINVALID = 1 << 30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Particles:
    pos: jnp.ndarray    # (N, 3) float32, (x, y, z)
    flags: jnp.ndarray  # (N,) int32
    count: jnp.ndarray  # () int32 — logical size <= capacity N

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def active_mask(self):
        n = self.pos.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        return (idx < self.count) & ((self.flags & PDELETE) == 0)


def make_particles(positions: np.ndarray, capacity: int | None = None,
                   pflag: int = 0) -> Particles:
    """Build a Particles pytree from host positions (M,3); capacity rounds
    up with headroom for later reseeding."""
    m = positions.shape[0]
    if capacity is None:
        capacity = max(int(m * 1.5) + 1024, 1024)
        capacity = ((capacity + 1023) // 1024) * 1024
    pos = np.zeros((capacity, 3), np.float32)
    pos[:m] = positions
    flags = np.full((capacity,), PINVALID | PDELETE, np.int32)
    flags[:m] = pflag
    return Particles(pos=jnp.asarray(pos), flags=jnp.asarray(flags),
                     count=jnp.int32(m))


# ---------------------------------------------------------------------------
# host-side samplers (deterministic; RNG is numpy PCG, statistically matching
# the reference's RandomStream(9832) jitter)

def _sample_cells(cell_mask: np.ndarray, dom: Domain, discretization: int,
                  randomness: float, seed: int = 9832) -> np.ndarray:
    """Subsample each masked cell with discretization^d jittered positions
    (sampleFlagsWithParticles layout, flip.cpp:40-52)."""
    d = discretization
    is3d = dom.is3d
    ks, js, is_ = np.nonzero(cell_mask)
    ncell = len(is_)
    sub = (np.arange(d) + 0.5) / d
    if is3d:
        dz, dy, dx = np.meshgrid(sub, sub, sub, indexing="ij")
    else:
        dz = np.full((1, d, d), 0.5)
        dy, dx = np.meshgrid(sub, sub, indexing="ij")
        dy, dx = dy[None], dx[None]
    nsub = dx.size
    base = np.stack([
        is_[:, None] + dx.reshape(1, -1),
        js[:, None] + dy.reshape(1, -1),
        ks[:, None] + dz.reshape(1, -1),
    ], axis=-1).reshape(ncell * nsub, 3)
    if randomness > 0:
        # exact reference jitter: RandomStream(9832).getVec3() per subsample
        # in FOR_IJK(k,j,i) x (dk,dj,di) order (flip.cpp:44-48)
        from ..utils.mtrand import RandomStream
        jlen = np.float32(randomness / d)
        stream = RandomStream(seed)
        base = base.astype(np.float32)
        base += jlen * (np.float32(1.0) - np.float32(2.0)
                        * stream.get_vec3s(base.shape[0]))
    if not is3d:
        base[:, 2] = 0.5
    return base.astype(np.float32)


def sample_flags_with_particles(flags_np: np.ndarray, dom: Domain,
                                discretization: int, randomness: float,
                                capacity: int | None = None,
                                headroom: float | None = None) -> Particles:
    """sampleFlagsWithParticles (flip.cpp:32-55): seed fluid cells.
    `headroom` overrides the default 1.5x capacity factor (use ~1.0 for
    pipelines that never reseed)."""
    mask = (flags_np & fl.TypeFluid) != 0
    mask &= (flags_np & fl.TypeObstacle) == 0
    pts = _sample_cells(mask, dom, discretization, randomness)
    if capacity is None and headroom is not None:
        capacity = ((int(len(pts) * headroom) + 1023) // 1024) * 1024
    return make_particles(pts, capacity)


def sample_levelset_positions(phi_np: np.ndarray, flags_np: np.ndarray,
                              dom: Domain, discretization: int,
                              randomness: float,
                              refill_empty: bool = False) -> np.ndarray:
    """sampleLevelsetWithParticles positions (flip.cpp:61-105): seed cells
    with phi<1.733, then reject subsamples with interpolated phi > 0.
    refill_empty skips cells currently flagged fluid (flip.cpp:80-81)."""
    mask = (phi_np < 1.733) & ((flags_np & fl.TypeObstacle) == 0)
    if refill_empty:
        mask &= (flags_np & fl.TypeFluid) == 0
    pts = _sample_cells(mask, dom, discretization, randomness)
    phiv = np.asarray(interpol(jnp.asarray(phi_np), pts[:, 0], pts[:, 1],
                               pts[:, 2]))
    return pts[phiv <= 0.0]


def sample_levelset_with_particles(phi_np: np.ndarray, flags_np: np.ndarray,
                                   dom: Domain, discretization: int,
                                   randomness: float,
                                   capacity: int | None = None) -> Particles:
    pts = sample_levelset_positions(phi_np, flags_np, dom, discretization,
                                    randomness)
    return make_particles(pts, capacity)


def sample_shape_positions(shape, flags_np: np.ndarray, dom: Domain,
                           discretization: int, randomness: float,
                           exclude_phi: np.ndarray | None = None,
                           refill_empty: bool = False) -> np.ndarray:
    """sampleShapeWithParticles positions (flip.cpp:109-160)."""
    mask = (flags_np & fl.TypeObstacle) == 0
    if refill_empty:
        mask &= (flags_np & fl.TypeFluid) == 0
    pts = _sample_cells(mask, dom, discretization, randomness)
    inside = np.asarray(shape.is_inside(jnp.asarray(pts[:, 0]),
                                        jnp.asarray(pts[:, 1]),
                                        jnp.asarray(pts[:, 2])))
    keep = inside
    if exclude_phi is not None:
        ev = np.asarray(interpol(jnp.asarray(exclude_phi), pts[:, 0],
                                 pts[:, 1], pts[:, 2]))
        keep &= ev > 0.0
    return pts[keep]


def sample_shape_with_particles(shape, flags_np: np.ndarray, dom: Domain,
                                discretization: int, randomness: float,
                                capacity: int | None = None,
                                exclude_phi: np.ndarray | None = None) -> Particles:
    pts = sample_shape_positions(shape, flags_np, dom, discretization,
                                 randomness, exclude_phi=exclude_phi)
    return make_particles(pts, capacity)


# ---------------------------------------------------------------------------
# advection (GridAdvectKernel + integratePointSet)

def _trunc_i(x):
    return x.astype(jnp.int32)


def _flags_at(flags, pos, dom: Domain):
    """flags value at toVec3i(pos), clipped (callers pre-check bounds)."""
    sz, sy, sx = dom.shape
    i = jnp.clip(_trunc_i(pos[:, 0]), 0, sx - 1)
    j = jnp.clip(_trunc_i(pos[:, 1]), 0, sy - 1)
    k = jnp.clip(_trunc_i(pos[:, 2]), 0, sz - 1)
    return flags[k, j, i]


def _in_bounds(pos, dom: Domain, bnd: int):
    sz, sy, sx = dom.shape
    ok = ((pos[:, 0] >= bnd) & (pos[:, 0] < sx - bnd)
          & (pos[:, 1] >= bnd) & (pos[:, 1] < sy - bnd))
    if dom.is3d:
        ok &= (pos[:, 2] >= bnd) & (pos[:, 2] < sz - bnd)
    return ok


def _vel_at(vel, pos, tables=None):
    u, v, w = interpol_mac_fast(vel, pos[:, 0], pos[:, 1], pos[:, 2],
                                tables=tables)
    return jnp.stack([u, v, w], axis=-1)


def advect_in_grid(parts: Particles, flags, vel, dt, dom: Domain,
                   integration_mode: int = 0, delete_in_obstacle: bool = True,
                   stop_in_obstacle: bool = True, skip_new: bool = False,
                   ptype=None, exclude: int = 0) -> Particles:
    """ParticleSystem::advectInGrid (particle.h:527-551)."""
    pflags0 = parts.flags
    skip = (pflags0 & PDELETE) != 0
    if ptype is not None:
        skip = skip | ((ptype & exclude) != 0)
    if skip_new:
        skip = skip | ((pflags0 & PNEW) != 0)
    idx = jnp.arange(parts.capacity, dtype=jnp.int32)
    skip = skip | (idx >= parts.count)

    new_delete = jnp.zeros(parts.capacity, dtype=bool)
    # one packed table shared across all RK evaluations: each velocity
    # evaluation (incl. the obstacle-flag check) is a single row gather
    from .interp import build_mac_pack, interpol_mac_packed
    need_flags = delete_in_obstacle or stop_in_obstacle
    pack = build_mac_pack(vel, flags if need_flags else None)

    def eval_u(pos, new_delete):
        if need_flags:
            u0, v0, w0, flag_at = interpol_mac_packed(
                pack, dom.shape, pos[:, 0], pos[:, 1], pos[:, 2],
                with_flags=True)
        else:
            u0, v0, w0 = interpol_mac_packed(pack, dom.shape, pos[:, 0],
                                             pos[:, 1], pos[:, 2])
        u = jnp.stack([u0, v0, w0], axis=-1) * dt
        u = jnp.where(skip[:, None], 0.0, u)
        if need_flags:
            bad = (~_in_bounds(pos, dom, 1)
                   | ((flag_at & fl.TypeObstacle) != 0))
            bad = bad & ~skip
            if stop_in_obstacle:
                u = jnp.where(bad[:, None], 0.0, u)
            if delete_in_obstacle:
                new_delete = new_delete | bad
        return u, new_delete

    x0 = parts.pos
    u0, new_delete = eval_u(x0, new_delete)
    if integration_mode == 0:  # IntEuler
        pos = x0 + u0
    elif integration_mode == 1:  # IntRK2 (midpoint)
        u1, new_delete = eval_u(x0 + 0.5 * u0, new_delete)
        pos = x0 + u1
    elif integration_mode == 2:
        # IntRK4, this fork's weighting (2*u0+2*u1+2*u2+u3)/6
        # (util/integrator.h:49-72 incl. the added uTotal += u line :57)
        u1, new_delete = eval_u(x0 + 0.5 * u0, new_delete)
        u2, new_delete = eval_u(x0 + 0.5 * u1, new_delete)
        u3, new_delete = eval_u(x0 + u2, new_delete)
        pos = x0 + (2 * u0 + 2 * u1 + 2 * u2 + u3) / 6.0
    else:
        raise ValueError("unknown integration type")

    pflags = pflags0
    if delete_in_obstacle:
        # final check (KnDeleteInObstacle, particle.h:485-492)
        bad = (~_in_bounds(pos, dom, 1)
               | ((_flags_at(flags, pos, dom) & fl.TypeObstacle) != 0))
        live = (pflags0 & PDELETE) == 0
        pflags = jnp.where(live & (new_delete | bad), pflags0 | PDELETE,
                           pflags0)
    else:
        # KnClampPositions (particle.h:508-525)
        sz, sy, sx = dom.shape
        # per-column scalar bounds: scalars inline as HLO literals, while a
        # (3,) jnp.array here would be hoisted to a device-const buffer
        # (jax 0.9.0's cpp fast path drops such consts on non-first
        # executables: "supplied N buffers but expected M")
        clipped = jnp.stack([jnp.clip(pos[:, 0], 0.0, sx - 1.0),
                             jnp.clip(pos[:, 1], 0.0, sy - 1.0),
                             jnp.clip(pos[:, 2], 0.0, sz - 1.0)], axis=-1)
        out = ~_in_bounds(pos, dom, 0)
        pos = jnp.where(out[:, None], clipped, pos)
        if stop_in_obstacle:
            in_obs = (_flags_at(flags, pos, dom) & fl.TypeObstacle) != 0
            fixed = _bisect_backtrace(flags, x0, pos, dom)
            pos = jnp.where(in_obs[:, None], fixed, pos)
        excl = jnp.zeros(parts.capacity, dtype=bool)
        if ptype is not None:
            excl = (ptype & exclude) != 0
        pos = jnp.where(((pflags0 & PDELETE) != 0)[:, None], parts.pos,
                        jnp.where(excl[:, None], x0, pos))

    pos = jnp.where(skip[:, None], parts.pos, pos)
    return dataclasses.replace(parts, pos=pos, flags=pflags)


def _bisect_backtrace(flags, old, new, dom: Domain):
    """bisectBacktracePos (particle.h:494-505): 4-step bisection toward the
    last non-obstacle point on the segment old->new."""
    s = jnp.zeros(old.shape[0], dtype=old.dtype)
    for i in range(1, 5):
        ds = 1.0 / (1 << i)
        cand = old * (1.0 - (s + ds))[:, None] + new * (s + ds)[:, None]
        obs = (_flags_at(flags, cand, dom) & fl.TypeObstacle) != 0
        s = jnp.where(obs, s, s + ds)
    return old * (1.0 - s)[:, None] + new * s[:, None]


def project_out_of_bnd(parts: Particles, dom: Domain, bnd: float,
                       plane: str = "xXyYzZ", ptype=None,
                       exclude: int = 0) -> Particles:
    """projectOutOfBnd (particle.h:581-607)."""
    sz, sy, sx = dom.shape
    sizes = [sx, sy, sz]
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    pos = parts.pos
    cols = [pos[:, 0], pos[:, 1], pos[:, 2]]
    n_ax = 3 if dom.is3d else 2
    for a in range(n_ax):
        lo, hi = "xyz"[a], "XYZ"[a]
        if lo in plane:
            cols[a] = jnp.where(active, jnp.maximum(cols[a], bnd), cols[a])
        if hi in plane:
            cols[a] = jnp.where(active, jnp.minimum(cols[a], sizes[a] - bnd),
                                cols[a])
    return dataclasses.replace(parts, pos=jnp.stack(cols, axis=-1))


def push_out_of_obs(parts: Particles, flags, phi_obs, dom: Domain,
                    shift: float = 0.0, thresh: float = 0.0, ptype=None,
                    exclude: int = 0) -> Particles:
    """pushOutofObs (flip.cpp:580-601): move particles along the obstacle-SDF
    gradient until phiObs >= thresh."""
    active = parts.active_mask()
    if ptype is not None:
        active = active & ((ptype & exclude) == 0)
    pos = parts.pos
    inb = _in_bounds(jnp.floor(pos), dom, 0) & _in_bounds(pos, dom, 0)
    v = interpol(phi_obs, pos[:, 0], pos[:, 1], pos[:, 2])

    sz, sy, sx = dom.shape
    i = jnp.clip(_trunc_i(pos[:, 0]), 1, sx - 2)
    j = jnp.clip(_trunc_i(pos[:, 1]), 1, sy - 2)
    k = jnp.clip(_trunc_i(pos[:, 2]), 1, sz - 2) if dom.is3d else jnp.zeros_like(i)
    gx = 0.5 * (phi_obs[k, j, i + 1] - phi_obs[k, j, i - 1])
    gy = 0.5 * (phi_obs[k, j + 1, i] - phi_obs[k, j - 1, i])
    if dom.is3d:
        gz = 0.5 * (phi_obs[k + 1, j, i] - phi_obs[k - 1, j, i])
    else:
        gz = jnp.zeros_like(gx)
    norm = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    ok = active & inb & (v < thresh) & (norm >= 1e-6)
    scale = jnp.where(norm > 0, (thresh - v + shift) / jnp.maximum(norm, 1e-12), 0.0)
    delta = jnp.stack([gx, gy, gz], axis=-1) * scale[:, None]
    new_pos = jnp.where(ok[:, None], pos + delta, pos)
    return dataclasses.replace(parts, pos=new_pos)
