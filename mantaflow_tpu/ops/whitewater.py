"""Whitewater: spray/foam/bubble secondary particles for FLIP.

Behavioral port of ``source/plugin/secondaryparticles.cpp``:
flipComputeSecondaryParticlePotentials (:93 — trapped-air, wave-crest and
kinetic-energy potentials + neighbor ratio in one pass),
flipSampleSecondaryParticles (:202, 'single' + 'multiple'/MoreCylinders
modes), flipUpdateSecondaryParticles (:425, 'linear' + 'cubic' spline modes
incl. anti-tunneling), flipDeleteParticlesInObstacle (:471),
debugGridInfo (:480),
setFlagsFromLevelset (:519), setMACFromLevelset (:530).

TPU redesign: the per-cell pairwise neighborhood loops become static window
shifts; per-particle sampling becomes candidate enumeration + stream
compaction into dead slots (as in ops.flip.adjust_number); the serial
RandomStream is a counter-based jax PRNG (deterministic per call).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core import mac as macops
from ..core.domain import Domain
from ..core.interp import interpol, interpol_mac
from ..core.masks import axis_index, interior_mask, shift
from ..core.particles import (PBUBBLE, PDELETE, PFOAM, PNEW, PSPRAY,
                              Particles)
from .flip import _cell_of


def _clamp_potential(v, tau_min, tau_max):
    return jnp.clip((v - tau_min) / jnp.maximum(tau_max - tau_min, 1e-30),
                    0.0, 1.0)


def _normalized(vx, vy, vz, eps=1e-12):
    n = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    inv = jnp.where(n > eps, 1.0 / jnp.maximum(n, eps), 0.0)
    return vx * inv, vy * inv, vz * inv, n


def compute_secondary_particle_potentials(
        flags, vel, phi, dom: Domain, radius: int = 3,
        tau_min_ta: float = 5.0, tau_max_ta: float = 20.0,
        tau_min_wc: float = 2.0, tau_max_wc: float = 8.0,
        tau_min_ke: float = 5.0, tau_max_ke: float = 50.0,
        scale_from_manta: float = 0.05,
        itype: int = fl.TypeFluid,
        jtype: int = fl.TypeObstacle | fl.TypeOutflow | fl.TypeInflow):
    """Returns (potTA, potWC, potKE, neighborRatio, normal)."""
    s = scale_from_manta
    # surface normal = normalized grad(phi); GradientOp is a bnd=1 kernel
    # over a cleared grid, so the boundary ring holds zero normals
    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))
    inter1 = interior_mask(dom, 1)
    gx = jnp.where(inter1, d1(phi, "x"), 0.0)
    gy = jnp.where(inter1, d1(phi, "y"), 0.0)
    gz = jnp.where(inter1, d1(phi, "z"), 0.0) if dom.is3d \
        else jnp.zeros_like(gx)
    nx, ny, nz, _ = _normalized(gx, gy, gz)

    cc = macops.get_centered(vel)
    vx, vy, vz = cc[0] * s, cc[1] * s, cc[2] * s

    is_i = (flags & itype) != 0
    is_j = (flags & jtype) != 0
    valid_nb = interior_mask(dom, 1) & ~is_j

    h = (1.732 if dom.is3d else 1.414) * radius
    vdiff = jnp.zeros(dom.shape, jnp.float32)
    kappa = jnp.zeros(dom.shape, jnp.float32)
    count_fluid = jnp.zeros(dom.shape, jnp.float32)
    count_max = jnp.zeros(dom.shape, jnp.float32)

    zr = range(-radius, radius + 1) if dom.is3d else [0]
    for dz in zr:
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                def sh(a):
                    return shift(shift(shift(a, dx, "x"), dy, "y"), dz, "z")
                ok = sh(valid_nb)
                count_fluid += jnp.where(ok & sh(is_i), 1.0, 0.0)
                count_max += jnp.where(ok, 1.0, 0.0)

                xij = (-s * dx, -s * dy, -s * dz)  # xi - xj
                nxij = jnp.sqrt(sum(c * c for c in xij))
                uxij = tuple(c / nxij for c in xij)
                dvx = vx - sh(vx)
                dvy = vy - sh(vy)
                dvz = vz - sh(vz)
                uvx, uvy, uvz, nvij = _normalized(dvx, dvy, dvz)
                # NOTE: the reference divides the SCALED |xij| by the
                # UNSCALED h (secondaryparticles.cpp:69-71) — replicated
                wdist = 1.0 - nxij / h
                term = nvij * (1.0 - (uvx * uxij[0] + uvy * uxij[1]
                                      + uvz * uxij[2])) * wdist
                vdiff += jnp.where(ok, term, 0.0)

                dotn = uxij[0] * nx + uxij[1] * ny + uxij[2] * nz
                kterm = (1.0 - (nx * sh(nx) + ny * sh(ny) + nz * sh(nz))) \
                    * wdist
                kappa += jnp.where(ok & (dotn < 0), kterm, 0.0)

    ratio = count_fluid / jnp.maximum(count_max, 1.0)
    pot_ta = _clamp_potential(vdiff, tau_min_ta, tau_max_ta)
    uvx, uvy, uvz, _ = _normalized(vx, vy, vz)
    crest_ok = (uvx * nx + uvy * ny + uvz * nz) >= 0.6
    pot_wc = jnp.where(crest_ok, _clamp_potential(kappa, tau_min_wc,
                                                  tau_max_wc), 0.0)
    ek = 0.5 * 125.0 * (vx * vx + vy * vy + vz * vz)
    pot_ke = _clamp_potential(ek, tau_min_ke, tau_max_ke)

    m = is_i & interior_mask(dom, radius)
    zero = jnp.zeros(dom.shape, jnp.float32)
    return (jnp.where(m, pot_ta, zero), jnp.where(m, pot_wc, zero),
            jnp.where(m, pot_ke, zero), jnp.where(m, ratio, zero),
            jnp.stack([nx, ny, nz]))


def sample_secondary_particles(parts: Particles, v_sec, l_sec, flags, vel,
                               pot_ta, pot_wc, pot_ke, neighbor_ratio,
                               dom: Domain, l_min: float, l_max: float,
                               c_s: float, c_b: float, k_ta: float,
                               k_wc: float, dt, max_per_cell: int = 4,
                               seed: int = 9832,
                               itype: int = fl.TypeFluid,
                               mode: str = "single"):
    """flipSampleSecondaryParticles (:202): emit up to max_per_cell new
    particles per emission cylinder into dead slots. 'single' (:161) uses one
    randomly offset cylinder per fluid cell with cell-sampled potentials;
    'multiple' (:110, MoreCylinders) uses 2^dim fixed sub-cylinders per cell
    (radius 0.25) with potentials and velocity interpolated at each
    sub-center. Returns (parts, v_sec, l_sec)."""
    if mode not in ("single", "multiple"):
        raise ValueError('Unknown mode: use "single" or "multiple" instead!')
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    cap = parts.capacity

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    cz, cy, cx = jnp.unravel_index(jnp.arange(n), dom.shape)

    if mode == "single":
        n_cyl, cyl_r = 1, 0.5
        # one randomized cylinder center per cell, uniform in the cell
        off = jax.random.uniform(ks[0], (n_cyl, n, 3))
        xi = jnp.stack([cx[None, :] + off[:, :, 0],
                        cy[None, :] + off[:, :, 1],
                        (cz[None, :] + off[:, :, 2]) if dom.is3d
                        else jnp.full((n_cyl, n), 0.5)], axis=-1)
        ta = jnp.broadcast_to(pot_ta.reshape(-1)[None], (n_cyl, n))
        wc = jnp.broadcast_to(pot_wc.reshape(-1)[None], (n_cyl, n))
        ke = jnp.broadcast_to(pot_ke.reshape(-1)[None], (n_cyl, n))
    else:
        # 2 sub-cylinders per dimension at cell-center +- 0.25
        r0 = 0.25
        subs = [(-r0, -r0, -r0), (-r0, -r0, r0), (-r0, r0, -r0),
                (-r0, r0, r0), (r0, -r0, -r0), (r0, -r0, r0),
                (r0, r0, -r0), (r0, r0, r0)] if dom.is3d else \
            [(-r0, -r0, 0.0), (-r0, r0, 0.0), (r0, -r0, 0.0), (r0, r0, 0.0)]
        n_cyl, cyl_r = len(subs), r0
        xi = jnp.stack([
            jnp.stack([cx.astype(jnp.float32) + dxy[0],
                       cy.astype(jnp.float32) + dxy[1],
                       (cz.astype(jnp.float32) + dxy[2]) if dom.is3d
                       else jnp.full((n,), 0.5)], axis=-1)
            for dxy in subs])  # (n_cyl, n, 3)
        flat_xi = xi.reshape(n_cyl * n, 3)
        ta = interpol(pot_ta, flat_xi[:, 0], flat_xi[:, 1],
                      flat_xi[:, 2]).reshape(n_cyl, n)
        wc = interpol(pot_wc, flat_xi[:, 0], flat_xi[:, 1],
                      flat_xi[:, 2]).reshape(n_cyl, n)
        ke = interpol(pot_ke, flat_xi[:, 0], flat_xi[:, 1],
                      flat_xi[:, 2]).reshape(n_cyl, n)

    n_new = (ke * (k_ta * ta + k_wc * wc) * dt).astype(jnp.int32)
    n_new = jnp.where(((flags & itype) != 0).reshape(-1)[None],
                      jnp.minimum(n_new, max_per_cell), 0)  # (n_cyl, n)

    m_idx = jnp.arange(max_per_cell, dtype=jnp.int32)[None, :, None]
    cand_ok = (m_idx < n_new[:, None, :]).reshape(-1)
    ncand = n_cyl * max_per_cell * n

    flat_xi = xi.reshape(n_cyl * n, 3)
    u, v, w = interpol_mac(vel, flat_xi[:, 0], flat_xi[:, 1], flat_xi[:, 2])
    vi_cyl = jnp.stack([u, v, w], axis=-1).reshape(n_cyl, n, 3)
    # broadcast cylinder centers/velocities to their max_per_cell candidates
    bx = jnp.broadcast_to(xi[:, None], (n_cyl, max_per_cell, n, 3)
                          ).reshape(ncand, 3)
    vi = jnp.broadcast_to(vi_cyl[:, None], (n_cyl, max_per_cell, n, 3)
                          ).reshape(ncand, 3)
    # cylinder offsets around the motion direction
    r = cyl_r * jnp.sqrt(jax.random.uniform(ks[1], (ncand,)))
    theta = jax.random.uniform(ks[2], (ncand,)) * 2 * jnp.pi
    hh = jax.random.uniform(ks[3], (ncand,)) * jnp.sqrt(
        jnp.sum((vi * dt) ** 2, axis=-1))
    dirv = vi * dt
    e1x, e1y, e1z, _ = _normalized(dirv[:, 2], jnp.zeros(ncand), -dirv[:, 0])
    e2 = jnp.cross(jnp.stack([e1x, e1y, e1z], -1), dirv)
    e2x, e2y, e2z, _ = _normalized(e2[:, 0], e2[:, 1], e2[:, 2])
    uvi = vi / jnp.maximum(jnp.linalg.norm(vi, axis=-1, keepdims=True), 1e-12)
    xd = (bx + (r * jnp.cos(theta))[:, None] * jnp.stack([e1x, e1y, e1z], -1)
          + (r * jnp.sin(theta))[:, None] * jnp.stack([e2x, e2y, e2z], -1)
          + hh[:, None] * uvi)
    if not dom.is3d:
        xd = xd.at[:, 2].set(0.5)
    vd = (r * jnp.cos(theta))[:, None] * jnp.stack([e1x, e1y, e1z], -1) \
        + (r * jnp.sin(theta))[:, None] * jnp.stack([e2x, e2y, e2z], -1) + vi

    temp = (ke + ta + wc) / 3.0  # (n_cyl, n)
    life = ((l_max - l_min)
            * jnp.broadcast_to(temp[:, None], (n_cyl, max_per_cell, n))
            ).reshape(-1) + l_min \
        + jax.random.uniform(ks[4], (ncand,)) * 0.1
    ratio = jnp.broadcast_to(neighbor_ratio.reshape(-1)[None, None],
                             (n_cyl, max_per_cell, n)).reshape(-1)
    ptype = jnp.where(ratio < c_s, PSPRAY,
                      jnp.where(ratio > c_b, PBUBBLE, PFOAM)).astype(jnp.int32)

    # stream-compact candidates into dead slots
    alive = parts.active_mask()
    dead = ~alive
    dead_slots = jnp.nonzero(dead, size=cap, fill_value=cap)[0]
    cand_ids = jnp.nonzero(cand_ok, size=cap, fill_value=ncand)[0]
    rr = jnp.arange(cap, dtype=jnp.int32)
    valid = (rr < jnp.sum(dead)) & (rr < jnp.sum(cand_ok))
    tgt = jnp.where(valid, dead_slots, cap)
    src = jnp.clip(cand_ids, 0, ncand - 1)
    pos = parts.pos.at[tgt].set(xd[src], mode="drop")
    flags_p = parts.flags.at[tgt].set(ptype[src], mode="drop")
    v_sec = v_sec.at[tgt].set(vd[src], mode="drop")
    l_sec = l_sec.at[tgt].set(life[src], mode="drop")
    new_parts = dataclasses.replace(parts, pos=pos, flags=flags_p,
                                    count=jnp.int32(cap))
    return new_parts, v_sec, l_sec


def _cubic_spline_weight(h, ell, dim: int):
    """cubicSpline (:226): SPH cubic spline with support 2h, normalized for
    `dim` dimensions."""
    c = 10.0 / (7.0 * jnp.pi * h * h) if dim == 2 else 1.0 / (jnp.pi * h ** 3)
    q = ell / h
    return jnp.where(q < 1.0, c * (1.0 - 1.5 * q * q + 0.75 * q ** 3),
                     jnp.where(q < 2.0, c * 0.25 * (2.0 - q) ** 3, 0.0))


def _cubic_neighborhood_velocity(parts: Particles, flags, vel, dom: Domain,
                                 radius: int, itype: int):
    """The cubic-mode fluid velocity (:310): a cubic-spline-weighted average
    of cell-centered velocities over fluid (itype) cells in a (2r+1)^dim box
    around each particle, center cell excluded, weighted by the distance from
    the particle to each neighbor's integer coordinate.

    TPU form: per offset, roll the centered-velocity+mask stack so row t of
    the packed table holds neighbor t+off; one packed gather per <=30-offset
    chunk replaces the per-particle triple loop."""
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    cc = macops.get_centered(vel)
    ok = ((flags & itype) != 0).astype(jnp.float32)
    ix = jnp.broadcast_to(jnp.arange(sx).reshape(1, 1, sx), dom.shape)
    iy = jnp.broadcast_to(jnp.arange(sy).reshape(1, sy, 1), dom.shape)
    iz = jnp.broadcast_to(jnp.arange(sz).reshape(sz, 1, 1), dom.shape)

    offs = []
    zr = range(-radius, radius + 1) if dom.is3d else [0]
    for dz in zr:
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                offs.append((dx, dy, dz))

    dim = 3 if dom.is3d else 2
    dist = 1.732 if dom.is3d else 1.414
    h = radius * dist
    pos = parts.pos
    base = jnp.stack([pos[:, 0].astype(jnp.int32),
                      pos[:, 1].astype(jnp.int32),
                      pos[:, 2].astype(jnp.int32)], axis=-1)
    flat, _ = _cell_of(parts, dom)

    num = jnp.zeros((pos.shape[0], 3), jnp.float32)
    den = jnp.zeros((pos.shape[0],), jnp.float32)
    for c0 in range(0, len(offs), 30):
        chunk = offs[c0:c0 + 30]
        planes = []
        for (dx, dy, dz) in chunk:
            def sh(a):
                return shift(shift(shift(a, dx, "x"), dy, "y"), dz, "z")
            inb = ((ix + dx >= 0) & (ix + dx < sx)
                   & (iy + dy >= 0) & (iy + dy < sy)
                   & (iz + dz >= 0) & (iz + dz < sz)).astype(jnp.float32)
            m = sh(ok) * inb  # wrap-around rows masked off explicitly
            planes += [sh(cc[0]) * m, sh(cc[1]) * m, sh(cc[2]) * m, m]
        pack = jnp.stack(planes, axis=-1).reshape(n, len(chunk) * 4)
        rows = pack[flat].reshape(pos.shape[0], len(chunk), 4)
        doff = jnp.asarray(chunk, jnp.float32)  # (K,3)
        # xi - xj with xj the neighbor's integer coordinate (reference quirk)
        d = pos[:, None, :] - (base[:, None, :].astype(jnp.float32)
                               + doff[None, :, :])
        if not dom.is3d:
            d = d.at[:, :, 2].set(0.0)
        ell = jnp.sqrt(jnp.sum(d * d, axis=-1))
        wgt = _cubic_spline_weight(h, ell, dim) * rows[:, :, 3]
        num = num + jnp.sum(rows[:, :, :3] * wgt[:, :, None], axis=1)
        den = den + jnp.sum(wgt, axis=1)
    return num / jnp.maximum(den, 1e-12)[:, None]


def update_secondary_particles(parts: Particles, v_sec, l_sec, f_sec, flags,
                               vel, neighbor_ratio, dom: Domain, gravity,
                               k_b: float, k_d: float, c_s: float,
                               c_b: float, dt, exclude: int = 0,
                               antitunneling: int = 0,
                               itype: int = fl.TypeFluid,
                               mode: str = "linear", radius: int = 1):
    """flipUpdateSecondaryParticles (:425). 'linear' (:237) drives bubbles/
    foam with the trilinearly interpolated grid velocity; 'cubic' (:312)
    drives them with the cubic-spline neighborhood average over fluid cells
    in a radius-`radius` box. Returns (parts, v_sec, l_sec)."""
    if mode not in ("linear", "cubic"):
        raise ValueError('Unknown mode: use "linear" or "cubic" instead!')
    g = jnp.asarray(gravity, jnp.float32)
    active = parts.active_mask()
    if exclude:
        active = active & ((parts.flags & exclude) == 0)
    pos = parts.pos
    flat, inb = _cell_of(parts, dom)
    kill = active & ~inb
    ratio = neighbor_ratio.reshape(-1)[flat]

    is_spray = ratio < c_s
    is_bubble = ratio > c_b
    is_foam = ~is_spray & ~is_bubble

    if mode == "linear":
        u, v, w = interpol_mac(vel, pos[:, 0], pos[:, 1], pos[:, 2])
        v_grid = jnp.stack([u, v, w], axis=-1)
    else:
        v_grid = _cubic_neighborhood_velocity(parts, flags, vel, dom,
                                              radius, itype)

    v_spray = v_sec + dt * (f_sec + g[None, :])
    vj = (v_grid - v_sec) / dt
    v_bubble = v_sec + dt * (k_b * (-g[None, :]) + k_d * vj)
    new_v = jnp.where(is_spray[:, None], v_spray,
                      jnp.where(is_bubble[:, None], v_bubble, v_sec))
    move_v = jnp.where(is_foam[:, None], v_grid, new_v)

    # anti-tunneling: kill particles whose sub-sampled path hits an obstacle
    for ct in range(1, max(antitunneling, 1)):
        frac = ct / float(antitunneling)
        probe = pos + frac * dt * move_v
        pf, pinb = _cell_of(
            dataclasses.replace(parts, pos=probe), dom)
        hit = ~pinb | ((flags.reshape(-1)[pf] & fl.TypeObstacle) != 0)
        kill = kill | (active & hit)

    new_pos = pos + dt * move_v
    new_life = l_sec - dt
    kill = kill | (active & (new_life <= 0.0))

    new_flags = parts.flags
    tmask = active & ~kill
    new_flags = jnp.where(tmask & is_spray,
                          (new_flags | PSPRAY) & ~(PBUBBLE | PFOAM), new_flags)
    new_flags = jnp.where(tmask & is_bubble,
                          (new_flags | PBUBBLE) & ~(PSPRAY | PFOAM), new_flags)
    new_flags = jnp.where(tmask & is_foam,
                          (new_flags | PFOAM) & ~(PSPRAY | PBUBBLE), new_flags)
    new_flags = jnp.where(kill, new_flags | PDELETE, new_flags)

    upd = (active & ~kill)[:, None]
    return (dataclasses.replace(parts,
                                pos=jnp.where(upd, new_pos, pos),
                                flags=new_flags),
            jnp.where(upd, new_v, v_sec),
            jnp.where(active & ~kill, new_life, l_sec))


def delete_particles_in_obstacle(parts: Particles, flags, dom: Domain):
    """flipDeleteParticlesInObstacle."""
    flat, inb = _cell_of(parts, dom)
    cf = flags.reshape(-1)[flat]
    bad = ~inb | ((cf & (fl.TypeObstacle | fl.TypeOutflow)) != 0)
    live = parts.active_mask()
    new_flags = jnp.where(live & bad, parts.flags | PDELETE, parts.flags)
    return dataclasses.replace(parts, flags=new_flags)


def set_flags_from_levelset(flags, phi, exclude: int = fl.TypeObstacle,
                            itype: int = fl.TypeFluid):
    return jnp.where((phi < 0) & ((flags & exclude) == 0), jnp.int32(itype),
                     flags)


def set_mac_from_levelset(vel, phi, dom: Domain, c):
    sz, sy, sx = dom.shape
    x = jnp.broadcast_to(jnp.arange(sx, dtype=jnp.float32).reshape(1, 1, sx),
                         dom.shape)
    y = jnp.broadcast_to(jnp.arange(sy, dtype=jnp.float32).reshape(1, sy, 1),
                         dom.shape)
    z = jnp.broadcast_to(jnp.arange(sz, dtype=jnp.float32).reshape(sz, 1, 1),
                         dom.shape)
    p = interpol(phi, x, y, z)
    m = p > 0
    return jnp.stack([jnp.where(m, c[i], vel[i]) for i in range(3)])


# ---------------------------------------------------------------------------
# Legacy per-potential kernels (secondaryparticles.cpp:540-701). Same physics
# as compute_secondary_particle_potentials but with the legacy conventions:
# jtype SELECTS neighbors (default fluid) instead of excluding them, the
# distance falloff divides by the UNSCALED h = sqrt(dim)*radius, and each
# potential is computed independently. Neighbors outside the grid contribute
# nothing (the C++ kernels read out of bounds there; not reproducible).


def _legacy_neighborhood(dom: Domain, radius: int):
    zr = range(-radius, radius + 1) if dom.is3d else [0]
    for dz in zr:
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if dx == 0 and dy == 0 and dz == 0:
                    continue
                yield dx, dy, dz


def _inb_shift(dom: Domain, dx: int, dy: int, dz: int):
    """Mask: the neighbor at (+dx,+dy,+dz) exists (no wraparound reads)."""
    sz, sy, sx = dom.shape
    ix = axis_index(dom, "x")
    iy = axis_index(dom, "y")
    ok = ((ix + dx >= 0) & (ix + dx < sx) & (iy + dy >= 0) & (iy + dy < sy))
    if dom.is3d:
        iz = axis_index(dom, "z")
        ok = ok & (iz + dz >= 0) & (iz + dz < sz)
    return jnp.broadcast_to(ok, dom.shape)


def compute_potential_trapped_air(flags, vel, dom: Domain, radius: int,
                                  tau_min: float, tau_max: float,
                                  scale_from_manta: float,
                                  itype: int = fl.TypeFluid,
                                  jtype: int = fl.TypeFluid):
    """flipComputePotentialTrappedAir (secondaryparticles.cpp:541-588)."""
    s = scale_from_manta
    cc = macops.get_centered(vel)
    vx, vy, vz = cc[0] * s, cc[1] * s, cc[2] * s
    is_j = (flags & jtype) != 0
    h = (1.732 if dom.is3d else 1.414) * radius

    vdiff = jnp.zeros(dom.shape, jnp.float32)
    for dx, dy, dz in _legacy_neighborhood(dom, radius):
        def sh(a):
            return shift(shift(shift(a, dx, "x"), dy, "y"), dz, "z")
        ok = _inb_shift(dom, dx, dy, dz) & sh(is_j)
        xij = (-s * dx, -s * dy, -s * dz)  # xi - xj
        nxij = jnp.sqrt(sum(c * c for c in xij))
        uxij = tuple(c / nxij for c in xij)
        dvx, dvy, dvz = vx - sh(vx), vy - sh(vy), vz - sh(vz)
        uvx, uvy, uvz, nvij = _normalized(dvx, dvy, dvz)
        term = nvij * (1.0 - (uvx * uxij[0] + uvy * uxij[1]
                              + uvz * uxij[2])) * (1.0 - nxij / h)
        vdiff += jnp.where(ok, term, 0.0)

    pot = _clamp_potential(vdiff, tau_min, tau_max)
    m = ((flags & itype) != 0) & interior_mask(dom, 1)
    return jnp.where(m, pot, 0.0)


def compute_potential_kinetic_energy(flags, vel, dom: Domain,
                                     tau_min: float, tau_max: float,
                                     scale_from_manta: float,
                                     itype: int = fl.TypeFluid):
    """flipComputePotentialKineticEnergy (secondaryparticles.cpp:591-614)."""
    s = scale_from_manta
    cc = macops.get_centered(vel)
    ek = 0.5 * 125.0 * ((cc[0] * s) ** 2 + (cc[1] * s) ** 2
                        + (cc[2] * s) ** 2)
    pot = _clamp_potential(ek, tau_min, tau_max)
    return jnp.where((flags & itype) != 0, pot, 0.0)


def compute_potential_wave_crest(flags, vel, dom: Domain, radius: int,
                                 normal, tau_min: float, tau_max: float,
                                 scale_from_manta: float,
                                 itype: int = fl.TypeFluid,
                                 jtype: int = fl.TypeFluid):
    """flipComputePotentialWaveCrest (secondaryparticles.cpp:617-664)."""
    s = scale_from_manta
    cc = macops.get_centered(vel)
    vx, vy, vz = cc[0] * s, cc[1] * s, cc[2] * s
    nx, ny, nz = normal[0], normal[1], normal[2]
    is_j = (flags & jtype) != 0
    h = (1.732 if dom.is3d else 1.414) * radius

    kappa = jnp.zeros(dom.shape, jnp.float32)
    for dx, dy, dz in _legacy_neighborhood(dom, radius):
        def sh(a):
            return shift(shift(shift(a, dx, "x"), dy, "y"), dz, "z")
        ok = _inb_shift(dom, dx, dy, dz) & sh(is_j)
        xij = (-s * dx, -s * dy, -s * dz)
        nxij = jnp.sqrt(sum(c * c for c in xij))
        uxij = tuple(c / nxij for c in xij)
        dotn = uxij[0] * nx + uxij[1] * ny + uxij[2] * nz
        kterm = (1.0 - (nx * sh(nx) + ny * sh(ny) + nz * sh(nz))) \
            * (1.0 - nxij / h)
        kappa += jnp.where(ok & (dotn < 0), kterm, 0.0)

    uvx, uvy, uvz, _ = _normalized(vx, vy, vz)
    crest_ok = (uvx * nx + uvy * ny + uvz * nz) >= 0.6
    pot = jnp.where(crest_ok, _clamp_potential(kappa, tau_min, tau_max), 0.0)
    m = ((flags & itype) != 0) & interior_mask(dom, 1)
    return jnp.where(m, pot, 0.0)


def compute_surface_normals(phi, dom: Domain):
    """flipComputeSurfaceNormals (secondaryparticles.cpp:667-676):
    normalized central-difference gradient of the levelset. GradientOp is
    a bnd=1 kernel over a cleared grid: zero normals on the ring."""
    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))
    inter1 = interior_mask(dom, 1)
    gx = jnp.where(inter1, d1(phi, "x"), 0.0)
    gy = jnp.where(inter1, d1(phi, "y"), 0.0)
    gz = jnp.where(inter1, d1(phi, "z"), 0.0) if dom.is3d \
        else jnp.zeros_like(gx)
    nx, ny, nz, _ = _normalized(gx, gy, gz)
    return jnp.stack([nx, ny, nz])


def update_neighbor_ratio(flags, dom: Domain, radius: int,
                          itype: int = fl.TypeFluid,
                          jtype: int = fl.TypeObstacle):
    """flipUpdateNeighborRatio (secondaryparticles.cpp:679-701): fluid
    neighbors over possible (non-jtype) neighbors."""
    is_i = (flags & itype) != 0
    is_j = (flags & jtype) != 0
    count_fluid = jnp.zeros(dom.shape, jnp.float32)
    count_max = jnp.zeros(dom.shape, jnp.float32)
    for dx, dy, dz in _legacy_neighborhood(dom, radius):
        def sh(a):
            return shift(shift(shift(a, dx, "x"), dy, "y"), dz, "z")
        ok = _inb_shift(dom, dx, dy, dz) & ~sh(is_j)
        count_fluid += jnp.where(ok & sh(is_i), 1.0, 0.0)
        count_max += jnp.where(ok, 1.0, 0.0)
    ratio = count_fluid / jnp.maximum(count_max, 1.0)
    m = is_i & interior_mask(dom, 1)
    return jnp.where(m, ratio, 0.0)
