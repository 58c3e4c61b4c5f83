"""Fused FLIP/APIC liquid solver: the whole step as one XLA program.

Mirrors the reference FLIP scene loops (scenes/flip01_simple.py:47-68,
scenes/benchmark_dam.py:99-143): particle advection → p2g → forces →
projection → extrapolation → FLIP/APIC velocity update, composed from the
pure ops so the entire step jits (and shards) as a single program with no
host round-trips.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from functools import partial

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core import particles as cp
from ..core import solver as slv
from ..core.domain import Domain
from ..ops import extforces as ext
from ..ops import extrapolation as xtr
from ..ops import flip as fo
from ..ops import apic as ao
from ..ops import pressure as prs


@dataclasses.dataclass(frozen=True)
class FlipParams:
    gravity: tuple[float, float, float] = (0.0, -0.002, 0.0)
    gravity_scale: bool = False      # addGravityNoScale by default
    flip_ratio: float = 0.97
    integration_mode: int = 2        # IntRK4
    apic: bool = False               # affine transfers instead of FLIP blend
    ghost_fluid: bool = False        # build particle levelset for surface BCs
    radius_factor: float = 1.0
    cg_accuracy: float = 1e-3
    cg_max_iter_fac: float = 1.5
    preconditioner: int = prs.PcNone
    extrap_weight_dist: int = 2
    extrap_vel_dist: int = 4
    adaptive_dt: bool = False
    cfl: float = 1.0
    dt_min: float = 1e-4
    dt_max: float = 1.0
    frame_length: float = 1.0
    # static promise that obstacle cells are ONLY the bnd=1 boundary ring
    # (no stamped interior obstacles): lets the bucketed advection replace
    # every flags-at-position obstacle probe with a bounds test —
    # bit-identical results for such scenes (ops/flip_bucket.py)
    ring_only_obstacles: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlipState:
    flags: jnp.ndarray
    vel: jnp.ndarray
    vel_old: jnp.ndarray
    pressure: jnp.ndarray
    phi: jnp.ndarray
    parts: cp.Particles
    pvel: jnp.ndarray                # (N,3)
    cpx: jnp.ndarray                 # (N,3) APIC affine rows (zeros for FLIP)
    cpy: jnp.ndarray
    cpz: jnp.ndarray
    ts: slv.TimeState


def make_dam_state(dom: Domain, params: FlipParams,
                   dam_frac=(0.4, 0.6, 1.0), discretization: int = 2,
                   randomness: float = 0.05, boundary_width: int = 0,
                   dt: float = 0.5, obstacle=None,
                   capacity_headroom: float = 1.02) -> FlipState:
    """Breaking-dam setup (flip01_simple.py:29-38); optional obstacle shape
    stamped into the flags (flip06_obstacle.py pattern)."""
    import numpy as np
    from ..core.shapes import Box

    flags_np = np.asarray(fl.init_domain(dom, boundary_width))
    sx, sy, sz = dom.size
    box = Box(p0=(0, 0, 0), p1=(sx * dam_frac[0], sy * dam_frac[1],
                                sz * dam_frac[2]), dim=dom.dim)
    phi0 = box.compute_levelset(dom)
    flags0 = fl.update_from_levelset(jnp.asarray(flags_np), phi0, 1e10)
    if obstacle is not None:
        obs_in = obstacle.inside_grid(dom)
        flags0 = jnp.where(obs_in, jnp.int32(fl.TypeObstacle), flags0)
    # the fused model never reseeds — tight capacity keeps every particle
    # pass (advect/p2g/g2p/levelset) from paying for dead headroom slots
    parts = cp.sample_flags_with_particles(np.asarray(flags0), dom,
                                           discretization, randomness,
                                           headroom=capacity_headroom)
    n = parts.capacity
    return FlipState(
        flags=flags0,
        vel=jnp.zeros((3,) + dom.shape, jnp.float32),
        vel_old=jnp.zeros((3,) + dom.shape, jnp.float32),
        pressure=jnp.zeros(dom.shape, jnp.float32),
        phi=jnp.full(dom.shape, 0.5, jnp.float32),
        parts=parts,
        pvel=jnp.zeros((n, 3), jnp.float32),
        cpx=jnp.zeros((n, 3), jnp.float32),
        cpy=jnp.zeros((n, 3), jnp.float32),
        cpz=jnp.zeros((n, 3), jnp.float32),
        ts=slv.TimeState.create(dt),
    )


def flip_step(state: FlipState, dom: Domain, params: FlipParams) -> FlipState:
    flags, vel = state.flags, state.vel
    parts, pvel = state.parts, state.pvel
    ts = state.ts

    if params.adaptive_dt:
        max_vel = jnp.sqrt(jnp.max(vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2))
        ts = slv.adapt_timestep(ts, max_vel, params.cfl, params.dt_min,
                                params.dt_max, params.frame_length)
    dt = ts.dt

    # particle advection (RK4, keep particles, bisect out of obstacles)
    parts = cp.advect_in_grid(parts, flags, vel, dt, dom,
                              params.integration_mode,
                              delete_in_obstacle=False,
                              stop_in_obstacle=True)

    # p2g
    if params.apic:
        vel, weight = ao.apic_map_parts_to_mac(parts, pvel, state.cpx,
                                               state.cpy, state.cpz, flags,
                                               dom)
    else:
        vel, weight = fo.map_parts_to_mac(parts, pvel, flags, dom)
    vel_old = vel
    vel, _ = xtr.extrapolate_mac_from_weight(vel, weight, dom,
                                             params.extrap_weight_dist)
    flags = fo.mark_fluid_cells(parts, flags, dom)

    vel = ext.add_gravity(flags, vel, params.gravity, dt, dom,
                          scale=params.gravity_scale)

    phi = state.phi
    if params.ghost_fluid:
        phi = fo.union_particle_levelset(parts, flags, dom,
                                         params.radius_factor)
        phi = xtr.extrapolate_ls_simple(phi, dom, distance=4, inside=True)

    vel = ext.set_wall_bcs(flags, vel, dom)
    vel, pressure, _, _, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=params.cg_accuracy,
        phi=phi if params.ghost_fluid else None,
        cg_max_iter_fac=params.cg_max_iter_fac,
        preconditioner=params.preconditioner)
    vel = ext.set_wall_bcs(flags, vel, dom)
    vel = xtr.extrapolate_mac_simple(flags, vel, dom, params.extrap_vel_dist)

    # g2p velocity update
    if params.apic:
        pvel, cpx, cpy, cpz = ao.apic_map_mac_to_parts(
            parts, vel, flags, dom,
            old=(pvel, state.cpx, state.cpy, state.cpz))
    else:
        pvel = fo.flip_velocity_update(parts, pvel, flags, vel, vel_old,
                                       params.flip_ratio)
        cpx, cpy, cpz = state.cpx, state.cpy, state.cpz

    ts = slv.step(ts, params.frame_length)
    return FlipState(flags=flags, vel=vel, vel_old=vel_old,
                     pressure=pressure, phi=phi, parts=parts, pvel=pvel,
                     cpx=cpx, cpy=cpy, cpz=cpz, ts=ts)


@partial(jax.jit, static_argnames=("dom", "params", "n_steps"))
def flip_run(state: FlipState, dom: Domain, params: FlipParams,
             n_steps: int) -> FlipState:
    def body(s, _):
        return flip_step(s, dom, params), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state


# ---------------------------------------------------------------------------
# bucketed fast path: the same step over the cell-bucket particle layout
# (ops/flip_bucket.py) — dense stencil transfers, no gathers/scatters.

from ..ops import flip_bucket as fb  # noqa: E402


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlipBucketState:
    flags: jnp.ndarray
    vel: jnp.ndarray
    vel_old: jnp.ndarray
    pressure: jnp.ndarray
    phi: jnp.ndarray
    buckets: fb.Buckets
    ts: slv.TimeState
    # the bucketed step applies the FLIP blend of step t at the HEAD of
    # step t+1 (fused into the advection kernel — flip_bucket_pallas module
    # doc); True = the last step's blend is still pending. Grid-side state
    # evolution is identical to blend-at-tail order (nothing reads particle
    # velocities between); call finalize_buckets before reading them.
    blend_pending: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.bool_))


def make_dam_state_bucketed(dom: Domain, params: FlipParams,
                            dam_frac=(0.4, 0.6, 1.0),
                            discretization: int = 2,
                            randomness: float = 0.05,
                            boundary_width: int = 0, dt: float = 0.5,
                            obstacle=None, ppc: int = 10) -> FlipBucketState:
    """ppc=10: discretization-2 sampling fills cells with exactly 8
    (sampling jitter never leaves the birth cell), so 10 leaves 2 slots of
    migration headroom; every bucket kernel's cost scales with PPC (12->10
    measured +13% step rate at 64^3). When the dam piles up against a wall
    (~step 30) the flip_step_bucketed_auto driver escalates PPC — the
    production overflow contract; bin_from_particles/rebin surface any
    drop in ``buckets.dropped``."""
    if params.ring_only_obstacles and obstacle is not None:
        raise ValueError("ring_only_obstacles promises no interior "
                         "obstacles; stamping an obstacle shape breaks the "
                         "bounds-test shortcut (see ops/flip_bucket.py)")
    st = make_dam_state(dom, params, dam_frac, discretization, randomness,
                        boundary_width, dt, obstacle)
    buckets = fb.bin_from_particles(st.parts, st.pvel, dom, ppc=ppc)
    return FlipBucketState(flags=st.flags, vel=st.vel, vel_old=st.vel_old,
                           pressure=st.pressure, phi=st.phi, buckets=buckets,
                           ts=st.ts)


def flip_step_bucketed(state: FlipBucketState, dom: Domain,
                       params: FlipParams,
                       zshard=None) -> FlipBucketState:
    """flip_step on the bucket layout (same op chain as flip_step /
    scenes/flip01_simple.py:47-68); FLIP blend only (no APIC channel yet).

    Pipeline note: the FLIP blend of step t runs at the HEAD of step t+1
    (fused into the advection kernel on TPU — free v_new taps). Grid-state
    evolution is identical to the tail-order flat step because nothing
    reads particle velocities between a step's tail and the next head; the
    externally visible bucket velocities lag one blend — finalize_buckets
    applies it on demand.

    The bucket layout relies on the CFL<=1 contract: particles move at most
    one cell per step (advect clamps displacements to guarantee the rebin's
    +-1 window). A violation is surfaced at runtime through
    ``buckets.dropped`` (incremented by 10^6 per offending step), and
    configs that can't honor it statically are rejected here."""
    if params.apic:
        raise ValueError("flip_step_bucketed implements the FLIP blend "
                         "only; use flip_step for APIC (params.apic)")
    if params.adaptive_dt and params.cfl > 1.0:
        raise ValueError(f"bucketed layout needs cfl <= 1 (got "
                         f"{params.cfl}): particles may only move one cell "
                         "per step (rebin window contract)")
    flags, vel, bk, ts = state.flags, state.vel, state.buckets, state.ts

    max_vel = jnp.sqrt(jnp.max(vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2))
    if params.adaptive_dt:
        ts = slv.adapt_timestep(ts, max_vel, params.cfl, params.dt_min,
                                params.dt_max, params.frame_length)
    dt = ts.dt
    # runtime CFL-contract check: grid velocity implies >1-cell movement;
    # the advection clamp would silently truncate motion, so flag it loudly
    viol = (max_vel * dt > 1.0).astype(jnp.int32)
    bk = dataclasses.replace(bk, dropped=bk.dropped + 1_000_000 * viol)

    on_tpu = jax.default_backend() == "tpu"
    pending = state.blend_pending
    if zshard is not None:
        # multi-chip: ALL hot particle stages run as the z-sharded Pallas
        # kernels with explicit ppermute halos (SURVEY §2.16 cell-block
        # sharding) — the same kernels the single-chip fast path rides
        from ..ops import flip_bucket_pallas as fbp
        from ..ops import flip_bucket_pallas2 as fbp2
        mesh, axis = zshard
        bk = fbp.advect_blend_zshard_spmd(
            bk, flags, vel, state.vel_old, dt, pending, params.flip_ratio,
            dom, mesh, axis_name=axis,
            integration_mode=params.integration_mode,
            stop_in_obstacle=True, ring_only=params.ring_only_obstacles)
        bk = fbp.rebin_zshard_spmd(bk, dom, mesh, axis_name=axis)
        import math as _math
        rw1 = int(0.5 * _math.sqrt(3.0) * (params.radius_factor + 0.01)) \
            + 1 == 1
        if params.ghost_fluid and rw1:
            vel, weight, phi_fused = fbp2.p2g_union_zshard_spmd(
                bk, dom, params.radius_factor, mesh, axis_name=axis)
        else:
            vel, weight = fb.p2g_mac(bk, dom)
            phi_fused = None
    elif on_tpu:
        from ..ops import flip_bucket_pallas as fbp
        from ..ops import flip_bucket_pallas2 as fbp2
        # deferred FLIP blend of the PREVIOUS step fused into stage 1 of
        # the advection (same positions, same tap set — free v_new)
        bk = fbp.advect_blend_pallas(bk, flags, vel, state.vel_old, dt,
                                     pending, params.flip_ratio, dom,
                                     params.integration_mode,
                                     stop_in_obstacle=True,
                                     ring_only=params.ring_only_obstacles)
        if os.environ.get("MANTA_REBIN_FUSED", "") == "1":
            # opt-in: bit-exact vs the 3-pass form on hardware, but 7.5x
            # SLOWER measured on v5e @64^3 (57 vs 7.6 ms — the per-plane
            # xy-compaction + unrolled z-merge is compute-bound); kept as
            # the reference streaming formulation, not the default
            bk = fbp.rebin_fused(bk, dom)
        else:
            bk = fbp.rebin_pallas(bk, dom)
        import math as _math
        rw1 = int(0.5 * _math.sqrt(3.0) * (params.radius_factor + 0.01)) \
            + 1 == 1
        if (params.ghost_fluid and rw1
                and os.environ.get("MANTA_NO_P2G_FUSE", "") != "1"):
            # fused p2g + union levelset: one pass over the source slabs
            vel, weight, phi_fused = fbp2.p2g_union_pallas(
                bk, dom, params.radius_factor)
        else:
            vel, weight = fbp2.p2g_mac_pallas(bk, dom)
            phi_fused = None
    else:
        blended = fb.flip_update_bucketed(bk, vel, state.vel_old,
                                          params.flip_ratio, dom)
        bk = dataclasses.replace(
            bk, vx=jnp.where(pending, blended.vx, bk.vx),
            vy=jnp.where(pending, blended.vy, bk.vy),
            vz=jnp.where(pending, blended.vz, bk.vz))
        bk = fb.advect_bucketed(bk, flags, vel, dt, dom,
                                params.integration_mode,
                                stop_in_obstacle=True,
                                ring_only=params.ring_only_obstacles)
        bk = fb.rebin(bk, dom)
        vel, weight = fb.p2g_mac(bk, dom)
        phi_fused = None
    vel_old = vel
    vel, _ = xtr.extrapolate_mac_from_weight(vel, weight, dom,
                                             params.extrap_weight_dist)
    flags = fb.mark_fluid_cells_bucketed(bk, flags, dom)

    vel = ext.add_gravity(flags, vel, params.gravity, dt, dom,
                          scale=params.gravity_scale)

    phi = state.phi
    if params.ghost_fluid:
        if phi_fused is not None:
            phi = phi_fused
        elif on_tpu and zshard is None:
            phi = fbp2.union_levelset_pallas(bk, dom, params.radius_factor)
        else:
            # sharded path: the GSPMD-partitionable XLA form
            phi = fb.union_levelset_bucketed(bk, dom, params.radius_factor)
        phi = xtr.extrapolate_ls_simple(phi, dom, distance=4, inside=True)

    vel = ext.set_wall_bcs(flags, vel, dom)
    vel, pressure, _, _, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=params.cg_accuracy,
        phi=phi if params.ghost_fluid else None,
        cg_max_iter_fac=params.cg_max_iter_fac,
        preconditioner=params.preconditioner)
    vel = ext.set_wall_bcs(flags, vel, dom)
    vel = xtr.extrapolate_mac_simple(flags, vel, dom, params.extrap_vel_dist)

    # this step's blend is DEFERRED to the head of the next step (or to
    # finalize_buckets) — see blend_pending
    ts = slv.step(ts, params.frame_length)
    return FlipBucketState(flags=flags, vel=vel, vel_old=vel_old,
                           pressure=pressure, phi=phi, buckets=bk, ts=ts,
                           blend_pending=jnp.ones((), jnp.bool_))


def finalize_buckets(state: FlipBucketState, dom: Domain,
                     params: FlipParams) -> FlipBucketState:
    """Apply the deferred FLIP blend of the LAST step (no-op when not
    pending). Call before reading particle velocities out of the bucket
    state; grid fields never need it."""
    bk = state.buckets
    blended = fb.flip_update_bucketed(bk, state.vel, state.vel_old,
                                      params.flip_ratio, dom)
    pend = state.blend_pending
    bk = dataclasses.replace(
        bk, vx=jnp.where(pend, blended.vx, bk.vx),
        vy=jnp.where(pend, blended.vy, bk.vy),
        vz=jnp.where(pend, blended.vz, bk.vz))
    return dataclasses.replace(state, buckets=bk,
                               blend_pending=jnp.zeros((), jnp.bool_))


def _next_ppc(want: int, occ: int) -> int:
    """Escalation target: smallest multiple of 8 covering both. Measured
    on v5e @128^3 (round 5, matched state): PPC=18 runs the step 75%
    slower than PPC=16 — Mosaic handles non-multiple-of-8 slot counts
    badly — and rounding up also collapses 10->12->14->16 escalation
    chains (each a minutes-long 128^3 recompile) into one."""
    need = max(want, occ)
    return ((need + 7) // 8) * 8


@functools.lru_cache(maxsize=8)
def _jitted_bucket_step(dom: Domain, params: FlipParams):
    return jax.jit(lambda s: flip_step_bucketed(s, dom, params))


def flip_step_bucketed_auto(state: FlipBucketState, dom: Domain,
                            params: FlipParams, ppc_step: int = 4,
                            max_ppc: int = 48) -> FlipBucketState:
    """Overflow-safe host-side driver around flip_step_bucketed.

    The fixed-PPC bucket layout drops particles when a cell's occupancy
    exceeds PPC (e.g. a dam piling up against a wall). This driver checks
    ``buckets.dropped`` after each step; on overflow it rebuilds the
    buckets from the PRE-step state at PPC+ppc_step (one recompile per
    escalation, amortized over the run) and redoes the step, so no
    particle is ever lost. The reference has no cap at all
    (plugin/flip.cpp particle lists grow unbounded); this recovers that
    contract at bucket-layout speed."""
    import dataclasses as _dc
    prev = state
    while True:
        new = _jitted_bucket_step(dom, params)(prev)
        d = int(new.buckets.dropped) - int(prev.buckets.dropped)
        if d == 0:
            return new
        ppc = _next_ppc(prev.buckets.ppc + ppc_step,
                        fb.max_cell_occupancy(prev.buckets, dom))
        if ppc > max_ppc:
            raise RuntimeError(
                f"flip_step_bucketed_auto: still dropping {d} particles at "
                f"ppc={prev.buckets.ppc} (needs {ppc}); raise max_ppc or "
                "use the flat layout")
        prev = _dc.replace(prev,
                           buckets=fb.rebin_to_ppc(prev.buckets, dom, ppc))


@functools.lru_cache(maxsize=16)
def _jitted_bucket_run(dom: Domain, params: FlipParams, n_steps: int):
    def run(state):
        def body(s, _):
            return flip_step_bucketed(s, dom, params), None

        state2, _ = jax.lax.scan(body, state, None, length=n_steps)
        return state2

    return jax.jit(run)


def flip_run_bucketed_auto(state: FlipBucketState, dom: Domain,
                           params: FlipParams, n_steps: int,
                           check_every: int = 8, ppc_step: int = 4,
                           max_ppc: int = 48) -> FlipBucketState:
    """Chunked overflow-safe runner: lax.scan ``check_every`` steps per
    device program, inspect ``buckets.dropped`` once per chunk, and on
    overflow rebin the PRE-chunk state at a higher PPC and redo the chunk
    (flip_step_bucketed_auto's contract with one host sync per chunk
    instead of per step — the per-step driver spends most of its wall
    time on sync at >100 steps/s)."""
    import dataclasses as _dc
    done = 0
    while done < n_steps:
        k = min(check_every, n_steps - done)
        new = _jitted_bucket_run(dom, params, k)(state)
        d = int(new.buckets.dropped) - int(state.buckets.dropped)
        if d == 0:
            state = new
            done += k
            continue
        ppc = _next_ppc(state.buckets.ppc + ppc_step,
                         fb.max_cell_occupancy(state.buckets, dom))
        if ppc > max_ppc:
            raise RuntimeError(
                f"flip_run_bucketed_auto: still dropping {d} particles at "
                f"ppc={state.buckets.ppc} (needs {ppc}); raise max_ppc or "
                "use the flat layout")
        state = _dc.replace(state,
                            buckets=fb.rebin_to_ppc(state.buckets, dom, ppc))
    return state
