"""Solver time/frame state.

Behavioral port of FluidSolver's stepping logic
(``source/fluidsolver.cpp``: step :143-166, adaptTimestep :184-204,
config fields ``fluidsolver.h:26-119``). Two forms are provided:

- :class:`TimeState`, a pure pytree-friendly record with functional
  ``step``/``adapt_timestep`` updates, usable inside ``jax.jit`` /
  ``lax.while_loop`` (the TPU-first path: adaptive dt without host sync);
- the imperative mirror lives on the scene-layer ``Solver`` object, which
  simply delegates to these functions with Python floats.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .domain import Domain

VECTOR_EPSILON = 1e-6


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TimeState:
    """Traced time state; all fields are scalars (float32/int32 arrays or
    Python numbers before the first trace)."""
    dt: jnp.ndarray
    time_total: jnp.ndarray
    time_per_frame: jnp.ndarray
    frame: jnp.ndarray
    lock_dt: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def create(dt: float = 1.0) -> "TimeState":
        return TimeState(
            dt=jnp.float32(dt),
            time_total=jnp.float32(0.0),
            time_per_frame=jnp.float32(0.0),
            frame=jnp.int32(0),
            lock_dt=jnp.array(False),
            count=jnp.int32(0),
        )


def step(ts: TimeState, frame_length: float = 1.0) -> TimeState:
    """FluidSolver::step (fluidsolver.cpp:143-160): advance counters, snap
    total time to frame boundaries to prevent drift."""
    tpf = ts.time_per_frame + ts.dt
    total = ts.time_total + ts.dt
    advance = (tpf + VECTOR_EPSILON) > frame_length
    frame = jnp.where(advance, ts.frame + 1, ts.frame)
    total = jnp.where(advance, frame.astype(jnp.float32) * frame_length, total)
    tpf = jnp.where(advance, 0.0, tpf)
    lock = jnp.where(advance, False, ts.lock_dt)
    return TimeState(dt=ts.dt, time_total=total, time_per_frame=tpf,
                     frame=frame, lock_dt=lock, count=ts.count + 1)


def adapt_timestep(ts: TimeState, max_vel, cfl: float = 3.0,
                   dt_min: float = 0.0001, dt_max: float = 1.0,
                   frame_length: float = 1.0) -> TimeState:
    """FluidSolver::adaptTimestep (fluidsolver.cpp:184-204): CFL-clamped dt
    with frame-boundary snapping and two-half-step locking."""
    mvt = max_vel * ts.dt
    new_dt = jnp.clip(ts.dt * (cfl / (mvt + 1e-5)), dt_min, dt_max)
    near_full = (ts.time_per_frame + new_dt * 1.05) > frame_length
    snap_dt = (frame_length - ts.time_per_frame) + 1e-4
    tiny = (((ts.time_per_frame + new_dt + dt_min) > frame_length)
            | ((ts.time_per_frame + new_dt * 1.25) > frame_length))
    half_dt = (frame_length - ts.time_per_frame + 1e-4) * 0.5
    adjusted = jnp.where(near_full, snap_dt,
                         jnp.where(tiny, half_dt, new_dt))
    lock = jnp.where(near_full, False, tiny)
    dt = jnp.where(ts.lock_dt, ts.dt, adjusted)
    lock = jnp.where(ts.lock_dt, ts.lock_dt, lock)
    return dataclasses.replace(ts, dt=dt, lock_dt=lock)
