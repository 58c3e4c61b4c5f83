"""Surface turbulence: fine wave detail on a coarse particle liquid.

Capability port of ``source/plugin/surfaceturbulence.cpp`` (Mercier et al.
2015, particleSurfaceTurbulence :1028): a fine set of surface-only points is
maintained on the coarse simulation's surface band, advected with the coarse
flow, and carries a per-point wave equation (height h, velocity dtH) seeded
by surface curvature; displaced points (pos + h*normal) are the up-res
surface output.

TPU redesign (documented deviation): the reference's SPH-style point-point
neighbor kernels (weightSurfaceNormal/Tangent, per-point laplacians via
cell-binned neighbor lists, :290-930) are replaced with grid-mediated
operators — surface fields scatter to the grid (packed-row scatters), take
their differential operators there, and gather back at point positions
(packed-row gathers). Same pipeline stages (init/advect/maintain/normals/
waves/seed/displace), same parameters and outputs, data-parallel end to end.
Maintenance resamples the point set against the coarse particle levelset
band instead of point-splitting/merging.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core.domain import Domain
from ..core.interp import interpol_fast, build_corner_table, interpol_rows
from ..core.masks import shift
from ..core.particles import Particles, PDELETE
from . import flip as fo
from . import levelset as lso


@dataclasses.dataclass(frozen=True)
class SurfTurbParams:
    """Mirrors particleSurfaceTurbulence's parameter block (:1040-1053)."""
    outer_radius: float = 1.0
    surface_density: int = 20
    maintenance_iters: int = 4
    dt: float = 0.005
    wave_speed: float = 16.0
    wave_damping: float = 0.0
    wave_seed_frequency: float = 4.0
    wave_max_amplitude: float = 0.25
    wave_max_frequency: float = 800.0
    wave_max_seeding_amplitude: float = 0.5
    curv_thresh_center: float = 0.025
    curv_thresh_radius: float = 0.01
    seed_step_ratio: float = 0.05
    band: float = 1.0  # surface band half-width in cells
    # Calibration of grid curvature (kappa1+kappa2, CurvatureOp) to the
    # reference's SPH point statistic (weighted mean normal offset over a
    # 0.75-cell disk, surfaceturbulence.cpp:930-955). Fitted against the
    # reference binary on a basin+drop one-shot: alpha=0.031, corr 0.71
    # (BASELINE.md); analytic thin-disk estimate 0.075*r^2 = 0.042.
    curvature_scale: float = 0.031


def _phi_and_normals(coarse: Particles, flags, dom: Domain,
                     radius_factor: float = 1.0):
    """Coarse surface: union particle levelset + its normalized gradient."""
    phi = fo.union_particle_levelset(coarse, flags, dom, radius_factor)
    phi = lso.reinit(phi, flags, dom, max_time=4.0)

    def d1(a, ax):
        return 0.5 * (shift(a, 1, ax) - shift(a, -1, ax))

    gx, gy = d1(phi, "x"), d1(phi, "y")
    gz = d1(phi, "z") if dom.is3d else jnp.zeros_like(gx)
    n = jnp.sqrt(gx * gx + gy * gy + gz * gz)
    inv = jnp.where(n > 1e-6, 1.0 / jnp.maximum(n, 1e-12), 0.0)
    return phi, jnp.stack([gx * inv, gy * inv, gz * inv])


def _gather_vec(fields, pos):
    """Interpolate a (C,z,y,x) stack at point positions -> (N, C)."""
    cols = [interpol_fast(fields[c], pos[:, 0], pos[:, 1], pos[:, 2])
            for c in range(fields.shape[0])]
    return jnp.stack(cols, axis=-1)


def _constrain_to_band(pos, phi, normals, dom: Domain, band: float):
    """constrainSurface (:727): project points back onto |phi| <= band."""
    d = interpol_fast(phi, pos[:, 0], pos[:, 1], pos[:, 2])
    n = _gather_vec(normals, pos)
    excess = jnp.clip(d, -band, band) - d
    return pos + n * excess[:, None], d


def surface_maintenance(surf: Particles, coarse: Particles, flags,
                        dom: Domain, p: SurfTurbParams, seed: int = 1234):
    """init/addDelete/regularize/constrain (:349-808) as band resampling:
    kill off-band points, reseed underpopulated band cells (2 pts/cell),
    and project all survivors onto the band. Returns (surf, phi, normals)."""
    phi, normals = _phi_and_normals(coarse, flags, dom)
    pos = surf.pos
    d = interpol_fast(phi, pos[:, 0], pos[:, 1], pos[:, 2])
    alive = surf.active_mask()
    kill = alive & (jnp.abs(d) > 2.0 * p.band)
    pflags = jnp.where(kill, surf.flags | PDELETE, surf.flags)
    surf = dataclasses.replace(surf, flags=pflags)

    # per-cell counts of surviving surface points
    cnt = fo.particle_counts(surf, dom)
    band_cell = (jnp.abs(phi) <= p.band) & ~fl.is_obstacle(flags)
    need = band_cell & (cnt < 2)

    # seed candidates (2 per underpopulated band cell), projected onto phi=0
    sz, sy, sx = dom.shape
    n = sz * sy * sx
    key = jax.random.PRNGKey(seed)
    m = 2
    jit3 = jax.random.uniform(key, (m, n, 3), jnp.float32)
    cz, cy, cx = jnp.unravel_index(jnp.arange(n), dom.shape)
    cand = jnp.stack([cx[None] + jit3[:, :, 0], cy[None] + jit3[:, :, 1],
                      (cz[None] + jit3[:, :, 2]) if dom.is3d
                      else jnp.full((m, n), 0.5)], axis=-1).reshape(m * n, 3)
    cand_ok = jnp.broadcast_to(need.reshape(-1)[None], (m, n)).reshape(-1)

    cap = surf.capacity
    dead = ~surf.active_mask()
    dead_slots = jnp.nonzero(dead, size=cap, fill_value=cap)[0]
    cand_ids = jnp.nonzero(cand_ok, size=cap, fill_value=m * n)[0]
    rr = jnp.arange(cap, dtype=jnp.int32)
    valid = (rr < jnp.sum(dead)) & (rr < jnp.sum(cand_ok))
    tgt = jnp.where(valid, dead_slots, cap)
    src = jnp.clip(cand_ids, 0, m * n - 1)
    new_pos = surf.pos.at[tgt].set(cand[src], mode="drop")
    new_flags = surf.flags.at[tgt].set(0, mode="drop")
    surf = dataclasses.replace(surf, pos=new_pos, flags=new_flags,
                               count=jnp.int32(cap))

    # project all active points onto the band (several sweeps)
    pos = surf.pos
    for _ in range(p.maintenance_iters):
        pos, _ = _constrain_to_band(pos, phi, normals, dom, 0.0)
    pos = jnp.where(surf.active_mask()[:, None], pos, surf.pos)
    return dataclasses.replace(surf, pos=pos), phi, normals


def advect_surface_points(surf: Particles, coarse: Particles,
                          coarse_prev_pos, flags, dom: Domain,
                          p: SurfTurbParams):
    """advectSurfacePoints (:408): move surface points with the coarse
    particles' frame displacement (scattered to the grid, gathered back)."""
    disp = coarse.pos - coarse_prev_pos
    dgrid = fo.map_parts_to_grid(coarse, disp, flags, dom)  # (3,z,y,x)
    dx = _gather_vec(dgrid, surf.pos)
    new = surf.pos + jnp.where(surf.active_mask()[:, None], dx, 0.0)
    return dataclasses.replace(surf, pos=new)


def _point_field_laplacian(surf: Particles, values, flags, dom: Domain):
    """Wave-height laplacian: scatter h to the grid, 5/7-point laplacian,
    gather back (grid-mediated form of computeSurfaceWaveLaplacians :870)."""
    hgrid = fo.map_parts_to_grid(surf, values, flags, dom)
    lap = fo.get_laplacian(hgrid, dom)
    return interpol_fast(lap, surf.pos[:, 0], surf.pos[:, 1], surf.pos[:, 2])


def surface_waves(surf: Particles, wave_h, wave_dt_h, wave_seed,
                  wave_seed_amp, phi, flags, dom: Domain, p: SurfTurbParams,
                  frame: int = 0):
    """surfaceWaves (:1002-1018): addSeed, the wave equation on the surface
    points, then curvature-driven seed update for the next frame.

    Update ordering and semantics follow the reference exactly (addSeed
    :803, evolveWave :886-900, seedWaves :979-997: seed acts as pure
    forcing — added before the laplacian, subtracted after; damping as
    /(1+dt*damping); dtH clamped to +-maxFrequency*maxAmplitude; seeding
    saturates via smoothstep above the threshold center and the seed
    oscillates as amp*cos(dt*frame*waveSpeed*freq)). The SPH point
    laplacian/curvature (:848-977) are grid-mediated (documented redesign):
    curvature comes from CurvatureOp on the coarse levelset, rescaled by
    p.curvature_scale to the reference's point-statistic units."""
    active = surf.active_mask()
    h = wave_h + wave_seed  # addSeed
    lap = _point_field_laplacian(surf, h, flags, dom)
    dt_h = wave_dt_h + p.dt * (p.wave_speed ** 2) * lap
    dt_h = dt_h / (1.0 + p.dt * p.wave_damping)
    h = h + p.dt * dt_h
    h = h / (1.0 + p.dt * p.wave_damping)
    h = h - wave_seed
    dt_h = jnp.clip(dt_h, -p.wave_max_frequency * p.wave_max_amplitude,
                    p.wave_max_frequency * p.wave_max_amplitude)
    h = jnp.clip(h, -p.wave_max_amplitude, p.wave_max_amplitude)

    # seed update: calibrated grid curvature at points -> smoothstep source
    curv = fo.get_curvature(phi, dom)
    c_at = p.curvature_scale * jnp.abs(
        interpol_fast(curv, surf.pos[:, 0], surf.pos[:, 1], surf.pos[:, 2]))
    lo = p.curv_thresh_center - p.curv_thresh_radius
    hi = p.curv_thresh_center + p.curv_thresh_radius
    t = jnp.clip((c_at - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    source = t * t * (3.0 - 2.0 * t) * 2.0 - 1.0
    max_seed_amp = p.wave_max_seeding_amplitude * p.wave_max_amplitude
    seed_amp = jnp.clip(
        wave_seed_amp + source * p.seed_step_ratio * max_seed_amp,
        0.0, max_seed_amp)
    theta = p.dt * jnp.float32(frame) * p.wave_speed * p.wave_seed_frequency
    seed_val = seed_amp * jnp.cos(theta)
    source_disp = jnp.where(source >= 0.0, 1.0, 0.0)  # display value (:996)

    h = jnp.where(active, h, 0.0)
    dt_h = jnp.where(active, dt_h, 0.0)
    seed_val = jnp.where(active, seed_val, 0.0)
    seed_amp = jnp.where(active, seed_amp, 0.0)
    source_disp = jnp.where(active, source_disp, 0.0)
    return h, dt_h, seed_val, seed_amp, source_disp


def particle_surface_turbulence(flags, coarse: Particles, coarse_prev_pos,
                                surf: Particles, surface_normals, wave_h,
                                wave_dt_h, wave_source, wave_seed,
                                wave_seed_amp, dom: Domain,
                                p: SurfTurbParams, frame: int = 0):
    """Full per-frame pipeline (:1028-1160). Returns
    (surf, displaced_pos, normals(N,3), h, dtH, source, seed, seed_amp)."""
    surf = advect_surface_points(surf, coarse, coarse_prev_pos, flags, dom, p)
    surf, phi, normals = surface_maintenance(surf, coarse, flags, dom, p)
    h, dt_h, seed, seed_amp, source = surface_waves(
        surf, wave_h, wave_dt_h, wave_seed, wave_seed_amp, phi, flags, dom,
        p, frame)
    n_at = _gather_vec(normals, surf.pos)
    displaced = surf.pos + n_at * h[:, None]
    return surf, displaced, n_at, h, dt_h, source, seed, seed_amp
