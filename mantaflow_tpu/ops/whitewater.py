"""Whitewater: spray/foam/bubble secondary particles for FLIP.

Behavioral port of ``source/plugin/secondaryparticles.cpp``:
flipComputeSecondaryParticlePotentials (:93 — trapped-air, wave-crest and
kinetic-energy potentials + neighbor ratio in one pass),
flipSampleSecondaryParticles (:202, 'single' mode), flipUpdateSecondary
Particles (:425, 'euler' mode incl. anti-tunneling),
flipDeleteParticlesInObstacle (:471), debugGridInfo (:480),
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
from ..core.masks import interior_mask, shift
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
    # surface normal = normalized grad(phi) (GradientOp)
    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))
    gx, gy = d1(phi, "x"), d1(phi, "y")
    gz = d1(phi, "z") if dom.is3d else jnp.zeros_like(gx)
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
                wdist = 1.0 - nxij / (s * h)
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
                               itype: int = fl.TypeFluid):
    """flipSampleSecondaryParticles ('single' mode): emit up to max_per_cell
    new particles per fluid cell into dead slots. Returns
    (parts, v_sec, l_sec)."""
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    cap = parts.capacity

    n_new = (pot_ke * (k_ta * pot_ta + k_wc * pot_wc) * dt).astype(jnp.int32)
    n_new = jnp.where((flags & itype) != 0, jnp.minimum(n_new, max_per_cell),
                      0).reshape(-1)

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    m_idx = jnp.arange(max_per_cell, dtype=jnp.int32)[:, None]
    cand_ok = (m_idx < n_new[None, :]).reshape(-1)
    ncand = max_per_cell * n

    cz, cy, cx = jnp.unravel_index(jnp.arange(n), dom.shape)
    off = jax.random.uniform(ks[0], (max_per_cell, n, 3))
    base = jnp.stack([cx[None, :] + off[:, :, 0],
                      cy[None, :] + off[:, :, 1],
                      (cz[None, :] + off[:, :, 2]) if dom.is3d
                      else jnp.full((max_per_cell, n), 0.5)], axis=-1)
    bx = base.reshape(ncand, 3)
    u, v, w = interpol_mac(vel, bx[:, 0], bx[:, 1], bx[:, 2])
    vi = jnp.stack([u, v, w], axis=-1)
    # cylinder offsets around the motion direction
    r = 0.5 * jnp.sqrt(jax.random.uniform(ks[1], (ncand,)))
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

    temp = ((pot_ke + pot_ta + pot_wc) / 3.0).reshape(-1)
    life = ((l_max - l_min) * temp[None, :].repeat(max_per_cell, 0)
            ).reshape(-1) + l_min \
        + jax.random.uniform(ks[4], (ncand,)) * 0.1
    ratio = neighbor_ratio.reshape(-1)[None, :].repeat(max_per_cell, 0
                                                       ).reshape(-1)
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


def update_secondary_particles(parts: Particles, v_sec, l_sec, f_sec, flags,
                               vel, neighbor_ratio, dom: Domain, gravity,
                               k_b: float, k_d: float, c_s: float,
                               c_b: float, dt, exclude: int = 0,
                               antitunneling: int = 0,
                               itype: int = fl.TypeFluid):
    """flipUpdateSecondaryParticles ('euler' mode). Returns
    (parts, v_sec, l_sec)."""
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

    u, v, w = interpol_mac(vel, pos[:, 0], pos[:, 1], pos[:, 2])
    v_grid = jnp.stack([u, v, w], axis=-1)

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
