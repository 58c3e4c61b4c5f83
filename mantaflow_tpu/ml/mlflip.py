"""End-to-end ML-FLIP: train a splash model and run it inside the FLIP loop.

JAX/Flax redesign of the reference ``tensorflow/example2_liquid`` pipeline:

- ``mlflip_step``          — the MLFLIP sim step (manta_mlflip.py:174-310):
  p2g -> pressure -> [NN detects + modifies splashing surface particles]
  -> FLIP update for fluid particles / ballistic update for splashed ones.
  With ``net=None`` it is the data-generation step (manta_gendata.py:200-250,
  same op chain without the ML block).
- ``generate_training_data`` — runs the sim, extracts per-frame features for
  surface candidates and labels them by what actually happened one frame
  later (gendata's save_new_splashing_particles / save_velocity_modification
  semantics: newly-splashed = ptype fluid->empty across the frame).
- ``train``                — MLFlipNet (detector logit + velocity modifier)
  on balanced splash/non-splash batches (tf_train.py equivalent, optax).

Unlike the reference (host TF session fed by copyPdataToArray round-trips,
manta_mlflip.py:192-250), the network here runs *inside* the jitted step:
feature extraction, inference, and the trial-move revert are traced XLA ops
over the fixed-capacity particle arrays, so the whole MLFLIP step remains a
single device program.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import flags as fl
from ..core import particles as cp
from ..core import solver as slv
from ..core.domain import Domain
from ..models import flip as fm
from ..ops import extforces as ext
from ..ops import extrapolation as xtr
from ..ops import flip as fo
from ..ops import pressure as prs
from . import features as ft
from .models import MLFlipNet


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MlflipState:
    flags: jnp.ndarray
    vel: jnp.ndarray
    vel_old: jnp.ndarray
    pressure: jnp.ndarray
    phi: jnp.ndarray
    parts: cp.Particles
    pvel: jnp.ndarray          # (N, 3)
    ptype: jnp.ndarray         # (N,) int32: FlagFluid | FlagEmpty (splashed)
    ts: slv.TimeState


def make_mlflip_state(dom: Domain, params: fm.FlipParams,
                      dam_frac=(0.4, 0.8, 1.0), discretization: int = 2,
                      randomness: float = 0.1, dt: float = 0.5,
                      drop_speed: float = 0.0) -> MlflipState:
    """Dam state, or (drop_speed > 0) a basin + fast falling drop — the
    energetic-impact setup the reference gen-data sim uses to actually
    produce splash labels (manta_flip.py drop/wave scenes)."""
    st = fm.make_dam_state(dom, params, dam_frac=dam_frac,
                           discretization=discretization,
                           randomness=randomness, dt=dt)
    pvel = st.pvel
    if drop_speed > 0.0:
        import numpy as np
        from ..core.shapes import Box, Sphere
        sx, sy, sz = dom.size
        basin = Box(p0=(0, 0, 0), p1=(sx, 0.15 * sy, sz), dim=dom.dim)
        drop = Sphere(center=(0.5 * sx, 0.55 * sy, 0.5 * sz),
                      radius=0.12 * sx)
        phi0 = jnp.minimum(basin.compute_levelset(dom),
                           drop.compute_levelset(dom))
        flags0 = fl.update_from_levelset(fl.init_domain(dom, 0), phi0, 1e10)
        parts = cp.sample_flags_with_particles(np.asarray(flags0), dom,
                                               discretization, randomness,
                                               headroom=1.02)
        in_drop = drop.sdf(parts.pos[:, 0], parts.pos[:, 1],
                           parts.pos[:, 2]) < 1.0
        pvel = jnp.where((in_drop & parts.active_mask())[:, None],
                         jnp.asarray([0.0, -drop_speed, 0.0]), 0.0)
        st = dataclasses.replace(st, flags=flags0, parts=parts, pvel=pvel)
        pvel = st.pvel
    ptype = jnp.where(st.parts.active_mask(), jnp.int32(fl.TypeFluid),
                      jnp.int32(0))
    return MlflipState(flags=st.flags, vel=st.vel, vel_old=st.vel_old,
                       pressure=st.pressure, phi=st.phi, parts=st.parts,
                       pvel=pvel, ptype=ptype, ts=st.ts)


def surface_candidates(state: MlflipState, dom: Domain):
    """Surface-particle candidate mask + scratch ptype, exactly the
    manta_mlflip.py:192-197 dance: grow FlagEmpty one cell into the fluid,
    drop already-individual particles, mark fluid particles whose cell is
    now empty."""
    flag_tmp = ft.extend_region(state.flags, dom, fl.TypeEmpty,
                                fl.TypeObstacle, depth=1)
    ptmp = state.ptype
    ptmp = fo.set_part_type(state.parts, ptmp, 0, fl.TypeEmpty, flag_tmp,
                            dom, fl.TypeEmpty | fl.TypeFluid)
    ptmp = fo.set_part_type(state.parts, ptmp, fl.TypeEmpty, fl.TypeFluid,
                            flag_tmp, dom, fl.TypeEmpty)
    return (ptmp == fl.TypeEmpty) & state.parts.active_mask(), ptmp


def extract_features(state: MlflipState, ptmp, dom: Domain,
                     window: int = 1, vscale: float = 1.0):
    """Per-candidate feature rows: (2w+1)^3 MAC velocity stencil + levelset
    stencil (manta_mlflip.py:205-214, tfplugins.cpp knExtractFeature*)."""
    exclude = fl.TypeObstacle | fl.TypeFluid
    fv = ft.extract_feature_vel(state.parts, state.vel, dom, scale=vscale,
                                window=window, ptype=ptmp, exclude=exclude)
    fp = ft.extract_feature_phi(state.parts, state.phi, dom, scale=1.0,
                                window=window, ptype=ptmp, exclude=exclude)
    return jnp.concatenate([fv, fp], axis=-1)


def _trial_move_flags(state: MlflipState, dom: Domain, dt_frame):
    """Fluid-region flags after a frame-length uncorrected move
    (manta_mlflip.py:262-268): advect fluid particles in the grid velocity,
    euler-step individual ones, re-mark, grow empty by one."""
    parts = cp.advect_in_grid(state.parts, state.flags, state.vel, dt_frame,
                              dom, 2, delete_in_obstacle=False,
                              stop_in_obstacle=True, ptype=state.ptype,
                              exclude=fl.TypeObstacle | fl.TypeEmpty)
    parts = fo.euler_step(parts, state.pvel, dt_frame, ptype=state.ptype,
                          exclude=fl.TypeObstacle | fl.TypeFluid)
    flag_tmp = fo.mark_fluid_cells(parts, state.flags, dom,
                                   ptype=state.ptype,
                                   exclude=fl.TypeObstacle | fl.TypeEmpty)
    return ft.extend_region(flag_tmp, dom, fl.TypeEmpty, fl.TypeObstacle,
                            depth=1)


def mlflip_step(state: MlflipState, dom: Domain, params: fm.FlipParams,
                net: MLFlipNet | None = None, net_params=None,
                window: int = 1, vscale: float = 1.0,
                modvel_scale: float = 1.0,
                detect_threshold: float = 0.5) -> MlflipState:
    """One MLFLIP step (manta_mlflip.py:174-310 order). ``net=None`` runs
    the plain gen-data step (manta_gendata.py:200-250)."""
    flags, parts, pvel, ptype, ts = (state.flags, state.parts, state.pvel,
                                     state.ptype, state.ts)

    # p2g (exclude splashed particles), adapt dt
    vel, weight = fo.map_parts_to_mac(parts, pvel, flags, dom, ptype=ptype,
                                      exclude=fl.TypeObstacle | fl.TypeEmpty)
    if params.adaptive_dt:
        max_vel = jnp.sqrt(jnp.max(vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2))
        ts = slv.adapt_timestep(ts, max_vel, params.cfl, params.dt_min,
                                params.dt_max, params.frame_length)
    dt = ts.dt
    vel_old = vel
    vel, _ = xtr.extrapolate_mac_from_weight(vel, weight, dom,
                                             params.extrap_weight_dist)
    vel = ext.add_gravity(flags, vel, params.gravity, dt, dom, scale=False)

    phi = fo.union_particle_levelset(parts, flags, dom, params.radius_factor)
    vel = ext.set_wall_bcs(flags, vel, dom)
    vel, pressure, _, _, _ = prs.solve_pressure(
        vel, flags, dom, cg_accuracy=params.cg_accuracy, phi=phi,
        cg_max_iter_fac=params.cg_max_iter_fac,
        preconditioner=params.preconditioner)
    vel = ext.set_wall_bcs(flags, vel, dom)
    vel = xtr.extrapolate_mac_simple(flags, vel, dom, params.extrap_vel_dist)

    state = dataclasses.replace(state, vel=vel, vel_old=vel_old, phi=phi,
                                pressure=pressure)

    dv = jnp.zeros_like(pvel)
    if net is not None:
        # ---- ML block (manta_mlflip.py:190-250) ----
        candidate, ptmp = surface_candidates(state, dom)
        feats = extract_features(state, ptmp, dom, window, vscale)
        logit, dvel = net.apply(net_params, feats)
        splash = candidate & (jax.nn.sigmoid(logit) > detect_threshold)

        # trial move: would the splasher actually leave the (uncorrected)
        # fluid region? revert decisions that land back in fluid
        # (manta_mlflip.py:258-276)
        flag_trial = _trial_move_flags(state, dom, params.frame_length)
        trial_pos = (parts.pos
                     + (pvel + dvel * modvel_scale) * params.frame_length)
        sz, sy, sx = dom.shape
        ci = jnp.clip(trial_pos[:, 0].astype(jnp.int32), 0, sx - 1)
        cj = jnp.clip(trial_pos[:, 1].astype(jnp.int32), 0, sy - 1)
        ck = jnp.clip(trial_pos[:, 2].astype(jnp.int32), 0, sz - 1)
        dest = flag_trial[ck, cj, ci]
        in_fluid = (dest & (fl.TypeFluid | fl.TypeObstacle)) != 0
        splash = splash & ~in_fluid

        ptype = jnp.where(splash, jnp.int32(fl.TypeEmpty), ptype)
        dv = jnp.where(splash[:, None], dvel * modvel_scale, 0.0)

    # FLIP update for fluid particles; ballistic kick for individual ones
    pvel = fo.flip_velocity_update(parts, pvel, flags, vel, vel_old,
                                   params.flip_ratio, ptype=ptype,
                                   exclude=fl.TypeObstacle | fl.TypeEmpty)
    pvel = pvel + dv
    pvel = fo.add_force_pvel(pvel, params.gravity, dt, ptype=ptype,
                             exclude=fl.TypeObstacle | fl.TypeFluid)

    # position update: grid advection for fluid, euler for splashed
    x_prev = parts.pos
    parts = cp.advect_in_grid(parts, flags, vel, dt, dom,
                              params.integration_mode,
                              delete_in_obstacle=False,
                              stop_in_obstacle=True, ptype=ptype,
                              exclude=fl.TypeObstacle | fl.TypeEmpty)
    parts = fo.euler_step(parts, pvel, dt, ptype=ptype,
                          exclude=fl.TypeFluid | fl.TypeObstacle)
    parts = cp.project_out_of_bnd(parts, dom, bnd=1.5, ptype=ptype,
                                  exclude=fl.TypeObstacle)
    flags = fo.mark_fluid_cells(parts, flags, dom, ptype=ptype,
                                exclude=fl.TypeObstacle)
    pvel = fo.update_velocity_from_delta_pos(parts, pvel, x_prev, dt,
                                             ptype=ptype,
                                             exclude=fl.TypeFluid
                                             | fl.TypeObstacle)

    # splashed particles that landed in fluid become fluid again; isolated
    # cells don't participate in the pressure solve
    # (manta_gendata.py:238-241)
    ptype = fo.set_part_type(parts, ptype, fl.TypeFluid, fl.TypeEmpty, flags,
                             dom, fl.TypeFluid)
    flags = fo.mark_isolated_fluid_cell(flags, dom, fl.TypeEmpty)
    ptype = fo.set_part_type(parts, ptype, fl.TypeEmpty, fl.TypeFluid, flags,
                             dom, fl.TypeEmpty)

    ts = slv.step(ts, params.frame_length)
    return MlflipState(flags=flags, vel=vel, vel_old=vel_old,
                       pressure=pressure, phi=phi, parts=parts, pvel=pvel,
                       ptype=ptype, ts=ts)


# ---------------------------------------------------------------------------
# training-data generation (manta_gendata.py equivalent)


def generate_training_data(dom: Domain, params: fm.FlipParams,
                           n_frames: int = 12, window: int = 1,
                           vscale: float = 1.0, seed: int = 0,
                           dam_frac=(0.4, 0.8, 1.0),
                           drop_speed: float = 0.0):
    """Run the gen-data sim; per frame collect (features, label, modvel) for
    every surface candidate. Label = the candidate actually detached during
    the frame (ptype fluid->empty, gendata save_new_splashing_particles);
    modvel = the splasher's end-of-frame velocity minus its grid-predicted
    velocity (save_velocity_modification)."""
    del seed
    state = make_mlflip_state(dom, params, dam_frac=dam_frac,
                              drop_speed=drop_speed)
    step = jax.jit(lambda s: mlflip_step(s, dom, params))

    @jax.jit
    def frame_features(s: MlflipState):
        candidate, ptmp = surface_candidates(s, dom)
        feats = extract_features(s, ptmp, dom, window, vscale)
        grid_vel = fo.map_mac_to_parts(s.vel, s.parts)
        return candidate, feats, grid_vel

    rows, labels, modvels = [], [], []
    for _ in range(n_frames):
        candidate, feats, grid_vel = frame_features(state)
        before = state.ptype
        state = step(state)
        newly_splashed = ((before == fl.TypeFluid)
                          & (state.ptype == fl.TypeEmpty))
        cand = np.asarray(candidate)
        rows.append(np.asarray(feats)[cand])
        labels.append(np.asarray(newly_splashed)[cand].astype(np.float32))
        dv = np.asarray(state.pvel - grid_vel)[cand]
        modvels.append(np.where(np.asarray(newly_splashed)[cand][:, None],
                                dv, 0.0).astype(np.float32))
    return (np.concatenate(rows), np.concatenate(labels),
            np.concatenate(modvels), state)


def train(feats: np.ndarray, labels: np.ndarray, modvels: np.ndarray,
          hidden: int = 32, n_steps: int = 200, batch: int = 256,
          lr: float = 1e-3, seed: int = 0):
    """tf_train.py equivalent: joint detector (sigmoid BCE) + modifier (MSE
    on splash rows) with balanced splash/non-splash sampling. Returns
    (net, params, feature scale) — scale normalizes features to unit std as
    tf_train's scale.pickle does."""
    import optax

    scale = np.maximum(feats.std(axis=0), 1e-6).astype(np.float32)
    x = jnp.asarray(feats / scale)
    y = jnp.asarray(labels)
    m = jnp.asarray(modvels)

    net = MLFlipNet(hidden=hidden)
    rng = jax.random.PRNGKey(seed)
    params = net.init(rng, x[:1])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    pos = np.flatnonzero(labels > 0.5)
    neg = np.flatnonzero(labels <= 0.5)
    if len(pos) == 0:  # degenerate scene: keep the pipeline runnable
        pos = neg[:1]
    rs = np.random.RandomState(seed)

    @jax.jit
    def train_step(params, opt_state, xb, yb, mb):
        def loss_fn(p):
            logit, dvel = net.apply(p, xb)
            bce = jnp.mean(optax.sigmoid_binary_cross_entropy(logit, yb))
            mse = jnp.sum(yb[:, None] * (dvel - mb) ** 2) / (
                3.0 * jnp.maximum(jnp.sum(yb), 1.0))
            return bce + mse
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    half = batch // 2
    for _ in range(n_steps):
        idx = np.concatenate([rs.choice(pos, half), rs.choice(neg, half)])
        params, opt_state, loss = train_step(params, opt_state, x[idx],
                                             y[idx], m[idx])
        losses.append(float(loss))
    return net, params, scale, losses


def run_with_net(state: MlflipState, dom: Domain, params: fm.FlipParams,
                 net: MLFlipNet, net_params, scale, n_steps: int = 5,
                 window: int = 1, vscale: float = 1.0):
    """Inference-in-sim (manta_mlflip.py main loop): the NN runs inside the
    jitted step; features are normalized by the training-time scale."""
    scale_j = jnp.asarray(scale)

    class _ScaledNet:
        def apply(self, p, feats):
            return net.apply(p, feats / scale_j)

    step = jax.jit(lambda s: mlflip_step(s, dom, params, net=_ScaledNet(),
                                         net_params=net_params,
                                         window=window, vscale=vscale))
    for _ in range(n_steps):
        state = step(state)
    return state
