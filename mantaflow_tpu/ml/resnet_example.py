"""ResNet pressure inference, end to end (example3 equivalent).

The reference example3 (tensorflow/example3_resnet): manta_genSimData2.py
dumps per-frame pressure/divergence/flag data, tf_resnet.py trains a
res-net generator on them, and the trained net can stand in for the
pressure solve. Here the same pipeline: generate (rhs, fluid-mask) ->
pressure pairs from plume solves, train PressureResNet, then run a demo
smoke loop where the CG projection is REPLACED by network inference
(pressure = net(rhs, mask); vel -= grad p — ops/pressure.correct_velocity),
and measure how much of the divergence the learned projection removes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flags as fl
from ..core.domain import Domain
from ..core.shapes import Sphere
from ..models import smoke as sm
from ..ops import pressure as prs
from .models import PressureResNet, make_train_state, mse_train_step


def _step_capture(state, dom, params):
    """One smoke step that also returns the solve's (rhs, pressure) pair —
    the same op chain as models/smoke.smoke_step with the projection
    instrumented (manta_genSimData2.py records these fields per frame)."""
    from ..ops import advection as adv
    from ..ops import extforces as ext

    flags, vel, density = state.flags, state.vel, state.density
    density = jnp.where(state.source > 0.0, state.source, density)
    density = adv.advect_real(flags, vel, density, state.ts.dt, order=2)
    vel = adv.advect_mac(flags, vel, vel, state.ts.dt, order=2)
    vel = ext.set_wall_bcs(flags, vel, dom)
    vel = ext.add_buoyancy(flags, density, vel, params.buoyancy,
                           state.ts.dt, dom)
    vel, pressure, rhs, _, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=params.cg_accuracy)
    new = dataclasses.replace(state, vel=vel, density=density,
                              pressure=pressure)
    return new, rhs, pressure


def generate_pressure_pairs(res: int = 24, n_sims: int = 2,
                            n_frames: int = 12, seed: int = 0):
    """Returns (inputs (N,z,y,x,2): [rhs, fluid mask], targets (N,z,y,x))."""
    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, res, res), dim=3)
    params = sm.SmokeParams(buoyancy=(0.0, -2e-3, 0.0), cg_accuracy=1e-4)
    step = jax.jit(lambda s: _step_capture(s, dom, params))
    xs, ys = [], []
    for _ in range(n_sims):
        src = Sphere(center=(res * (0.35 + 0.3 * rng.rand()), res * 0.15,
                             res * (0.35 + 0.3 * rng.rand())),
                     radius=res * (0.1 + 0.08 * rng.rand()))
        state = sm.make_smoke_state(dom, params, source_shape=src)
        mask = np.asarray(fl.is_fluid(state.flags), np.float32)
        for _ in range(n_frames):
            state, rhs, pressure = step(state)
            xs.append(np.stack([np.asarray(rhs), mask], axis=-1))
            ys.append(np.asarray(pressure))
    return np.stack(xs).astype(np.float32), np.stack(ys).astype(np.float32)


def train_pressure_net(xs, ys, n_steps: int = 300, batch: int = 4,
                       lr: float = 2e-3, seed: int = 0):
    """Trains in NORMALIZED space (rhs/pressure are O(1e-3) — raw MSE would
    reward 'predict zero' long before any structure is learned; the
    reference normalizes its npz fields the same way). Returns
    (net, params, losses, (x_scale, y_scale))."""
    import optax

    x_scale = float(np.abs(xs[..., 0]).std() + 1e-12)
    y_scale = float(np.abs(ys).std() + 1e-12)
    xs = xs.copy()
    xs[..., 0] = xs[..., 0] / x_scale
    ys = ys / y_scale
    net = PressureResNet(features=8, blocks=2)
    params, tx, opt_state = make_train_state(net, jax.random.PRNGKey(seed),
                                             jnp.asarray(xs[:1]), lr)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = net.apply(p, x)
            # plain MSE rewards 'smooth but slightly off'; the divergence
            # the projection removes is A·p, so ALSO match the operator
            # image (second derivatives) — without this term the deployed
            # projection amplifies high-frequency error and the in-loop
            # divergence gets WORSE than no projection at all
            return (jnp.mean((pred - y) ** 2)
                    + jnp.mean((_masked_lap(pred, x[..., 1])
                                - _masked_lap(y, x[..., 1])) ** 2))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    rs = np.random.RandomState(seed)
    losses = []
    for _ in range(n_steps):
        idx = rs.choice(len(xs), batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(xs[idx]),
                                       jnp.asarray(ys[idx]))
        losses.append(float(loss))
    return net, params, losses, (x_scale, y_scale)


def _masked_lap(p, m):
    """Flags-aware 7-point operator on (B,z,y,x) fields given the fluid
    mask m: A0 = #fluid neighbors (wall links dropped from the diagonal,
    MakeLaplaceMatrix conjugategrad.h:155-190 semantics for a walled box)."""
    def sh(a, d, ax):
        z = jnp.zeros_like(jax.lax.slice_in_dim(a, 0, abs(d), axis=ax))
        if d > 0:
            return jnp.concatenate(
                [jax.lax.slice_in_dim(a, d, a.shape[ax], axis=ax), z], ax)
        return jnp.concatenate(
            [z, jax.lax.slice_in_dim(a, 0, a.shape[ax] + d, axis=ax)], ax)

    pm = p * m
    deg = sum(sh(m, d, ax) for ax in (1, 2, 3) for d in (-1, 1))
    nb = sum(sh(pm, d, ax) for ax in (1, 2, 3) for d in (-1, 1))
    return (m * (deg * p - nb))[:, 1:-1, 1:-1, 1:-1]


def evaluate_projection(net, net_params, scales, xs, ys):
    """One-shot on-distribution quality: mean |rhs - A p_pred| over mean
    |rhs| on the given (held-out) samples, flags-aware operator.
    < 1 means the learned projection removes divergence."""
    x_scale, y_scale = scales
    xn = xs.copy()
    xn[..., 0] = xn[..., 0] / x_scale
    pred = net.apply(net_params, jnp.asarray(xn)) * y_scale
    ap = np.asarray(_masked_lap(pred, jnp.asarray(xs[..., 1])))
    rhs_in = xs[:, 1:-1, 1:-1, 1:-1, 0]
    resid = np.abs(rhs_in - ap)
    return float(resid.mean() / (np.abs(rhs_in).mean() + 1e-12))


def nn_projection_step(state, dom, params, net, net_params, scales):
    """smoke_step with the CG solve replaced by PressureResNet inference
    (the example3 deployment mode). Returns (state, div_before, div_after)
    max-norms over interior fluid."""
    from ..core.masks import interior_mask
    from ..ops import advection as adv
    from ..ops import extforces as ext

    flags, vel, density = state.flags, state.vel, state.density
    density = jnp.where(state.source > 0.0, state.source, density)
    density = adv.advect_real(flags, vel, density, state.ts.dt, order=2)
    vel = adv.advect_mac(flags, vel, vel, state.ts.dt, order=2)
    vel = ext.set_wall_bcs(flags, vel, dom)
    vel = ext.add_buoyancy(flags, density, vel, params.buoyancy,
                           state.ts.dt, dom)

    x_scale, y_scale = scales
    rhs = prs.make_rhs(flags, vel, dom)
    mask = fl.is_fluid(flags).astype(jnp.float32)
    inp = jnp.stack([rhs / x_scale, mask], axis=-1)[None]
    pressure = net.apply(net_params, inp)[0] * y_scale
    vel = prs.correct_velocity(flags, vel, pressure, dom)

    m = fl.is_fluid(flags) & interior_mask(dom, 1)
    cnt = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
    div_before = jnp.sum(jnp.abs(jnp.where(m, rhs, 0.0))) / cnt
    div_after = jnp.sum(jnp.abs(jnp.where(
        m, prs.make_rhs(flags, vel, dom), 0.0))) / cnt
    new = dataclasses.replace(state, vel=vel, density=density,
                              pressure=pressure)
    return new, div_before, div_after


def demo_nn_in_the_loop(net, net_params, scales, res: int = 24,
                        n_steps: int = 5, seed: int = 3):
    """Run the NN-projected loop; returns per-step (before, after) mean
    |divergence| over interior fluid — the learned projection should
    remove a solid fraction of it."""
    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, res, res), dim=3)
    params = sm.SmokeParams(buoyancy=(0.0, -2e-3, 0.0))
    src = Sphere(center=(res * (0.35 + 0.3 * rng.rand()), res * 0.15,
                         res * 0.5), radius=res * 0.13)
    state = sm.make_smoke_state(dom, params, source_shape=src)
    step = jax.jit(lambda s: nn_projection_step(s, dom, params, net,
                                                net_params, scales))
    pairs = []
    for _ in range(n_steps):
        state, before, after = step(state)
        pairs.append((float(before), float(after)))
    return pairs
