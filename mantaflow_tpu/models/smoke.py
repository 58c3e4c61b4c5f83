"""Fused smoke solver: the whole step (emit → advect → forces → project)
as ONE jit-compiled XLA program with no host round-trips.

This is the TPU-first counterpart of the reference's per-op scene loop
(scenes/simpleplume.py, scenes/plume_2d.py): identical op sequence and
semantics, but composed functionally so XLA fuses across op boundaries and
the CG runs inside the same program (SURVEY.md §7 architecture stance).

Also the flagship model for sharded multi-chip execution: grids shard over a
device mesh along z/y; all stencil shifts become XLA collective permutes and
the CG reductions become psums automatically under GSPMD (see
parallel/sharding.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import flags as fl
from ..core import solver as slv
from ..core.domain import Domain
from ..ops import advection as adv
from ..ops import extforces as ext
from ..ops import pressure as prs


@dataclasses.dataclass(frozen=True)
class SmokeParams:
    """Static configuration (hashable; changing it recompiles)."""
    buoyancy: tuple[float, float, float] = (0.0, -6e-4, 0.0)
    advection_order: int = 2
    mac_strength: float = 1.0
    clamp_mode: int = 2
    vorticity_confinement: float = 0.0
    cg_accuracy: float = 1e-3
    cg_max_iter_fac: float = 1.5
    preconditioner: int = 0  # prs.PcNone; PcMGStatic trades V-cycle cost
                             # for CG iterations (A/B via BENCH_SMOKE_PC)
    open_bound: str = ""  # e.g. "yY" for the 2D plume
    # window > 0 selects the fast shift-select advection path
    # (ops/advection_fast.py); must be >= max CFL of the run
    window: int = 0
    # with window > 0 on a 3D domain, run the window passes as Pallas TPU
    # kernels (ops/advection_pallas.py; interpret-mode off-TPU)
    use_pallas: bool = False
    dissolve_speed: int = 0  # 0: off
    adaptive_dt: bool = False
    cfl: float = 3.0
    dt_min: float = 1e-4
    dt_max: float = 1.0
    frame_length: float = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SmokeState:
    """Full simulation state as a pytree."""
    flags: jnp.ndarray     # int32 [z,y,x]
    vel: jnp.ndarray       # float32 (3,z,y,x)
    density: jnp.ndarray   # float32 [z,y,x]
    pressure: jnp.ndarray  # float32 [z,y,x]
    source: jnp.ndarray    # float32 [z,y,x]: emission target (0 = none)
    ts: slv.TimeState
    # PcMGStatic: the multigrid hierarchy (level flags/stencils/masks) is a
    # pure function of the static smoke flags, so it is built ONCE here and
    # threaded through the step instead of being re-derived inside every
    # jitted solve (reference pressure.cpp:250 caches GridMg per solver)
    mg: object = None


def make_smoke_state(dom: Domain, params: SmokeParams, source_shape=None,
                     boundary_width: int = 1, dt: float = 1.0) -> SmokeState:
    """Build the standard smoke setup: walled domain, fluid interior,
    optional open bounds, optional emission shape."""
    flags = fl.init_domain(dom, boundary_width)
    flags = fl.fill_grid(flags, fl.TypeFluid)
    if params.open_bound:
        flags = fl.set_open_bound(flags, dom, boundary_width,
                                  params.open_bound,
                                  fl.TypeOutflow | fl.TypeEmpty)
    if source_shape is not None:
        source = jnp.where(source_shape.compute_levelset(dom) <= 0.0, 1.0, 0.0)
    else:
        source = jnp.zeros(dom.shape, dtype=jnp.float32)
    mg = None
    if params.preconditioner in (prs.PcMGStatic, prs.PcMGDynamic):
        from ..ops.multigrid import build_mg_hierarchy
        stencil = prs.make_laplace_stencil(flags, dom)
        mg = build_mg_hierarchy(flags, dom, stencil)
    return SmokeState(
        flags=flags,
        vel=jnp.zeros((3,) + dom.shape, dtype=jnp.float32),
        density=jnp.zeros(dom.shape, dtype=jnp.float32),
        pressure=jnp.zeros(dom.shape, dtype=jnp.float32),
        source=source,
        ts=slv.TimeState.create(dt),
        mg=mg,
    )


def smoke_step(state: SmokeState, dom: Domain, params: SmokeParams,
               zshard=None) -> SmokeState:
    """One simulation step; pure, jit/shard-safe. Mirrors the reference
    plume scene loops (scenes/simpleplume.py:40-55, plume_2d.py:34-53).

    zshard = (mesh, axis_name): with use_pallas, run the advection window
    passes through the multi-chip z-sharded Pallas kernel (shard_map +
    ppermute halo exchange over ICI) instead of relying on GSPMD to
    partition them; the rest of the step stays GSPMD-sharded."""
    flags, vel, density = state.flags, state.vel, state.density
    ts = state.ts

    if params.adaptive_dt:
        max_vel = jnp.sqrt(jnp.max(vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2))
        ts = slv.adapt_timestep(ts, max_vel, params.cfl, params.dt_min,
                                params.dt_max, params.frame_length)
    dt = ts.dt

    # emission: applyToGrid(value=1) inside the source region
    density = jnp.where(state.source > 0.0, state.source, density)

    if params.window > 0 and params.use_pallas and dom.is3d:
        from ..ops import advection_pallas as advp
        density = advp.advect_real_pl(flags, vel, density, dt, dom,
                                      params.window,
                                      order=params.advection_order,
                                      zshard=zshard)
        vel = advp.advect_mac_pl(flags, vel, vel, dt, dom, params.window,
                                 order=params.advection_order,
                                 strength=params.mac_strength,
                                 has_outflow=bool(params.open_bound),
                                 zshard=zshard)
    elif params.window > 0:
        from ..ops import advection_fast as advf
        density = advf.advect_real_fast(flags, vel, density, dt, dom,
                                        params.window,
                                        order=params.advection_order)
        vel = advf.advect_mac_fast(flags, vel, vel, dt, dom, params.window,
                                   order=params.advection_order,
                                   strength=params.mac_strength)
    else:
        density = adv.advect_real(flags, vel, density, dt,
                                  order=params.advection_order,
                                  clamp_mode=params.clamp_mode)
        vel = adv.advect_mac(flags, vel, vel, dt,
                             order=params.advection_order,
                             strength=params.mac_strength,
                             clamp_mode=params.clamp_mode)

    if params.open_bound:
        flags, _, density = ext.reset_outflow_grids(flags, dom, None, density)

    vel = ext.set_wall_bcs(flags, vel, dom)
    vel = ext.add_buoyancy(flags, density, vel, params.buoyancy, dt, dom)
    if params.vorticity_confinement > 0.0:
        vel = ext.vorticity_confinement(vel, flags, dom,
                                        params.vorticity_confinement)

    vel, pressure, _, _, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=params.cg_accuracy,
        cg_max_iter_fac=params.cg_max_iter_fac,
        preconditioner=params.preconditioner,
        mg_hierarchy=state.mg)

    if params.dissolve_speed > 0:
        density, _ = ext.dissolve_smoke(flags, density, dom, None,
                                        params.dissolve_speed, True)

    ts = slv.step(ts, params.frame_length)
    return SmokeState(flags=flags, vel=vel, density=density,
                      pressure=pressure, source=state.source, ts=ts,
                      mg=state.mg)


@partial(jax.jit, static_argnames=("dom", "params", "n_steps"))
def smoke_run(state: SmokeState, dom: Domain, params: SmokeParams,
              n_steps: int) -> SmokeState:
    """n steps inside one XLA program (lax.scan keeps compile time flat)."""
    def body(s, _):
        return smoke_step(s, dom, params), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state


def smoke_step_jit(dom: Domain, params: SmokeParams):
    """A jitted single-step closure."""
    return jax.jit(partial(smoke_step, dom=dom, params=params))
