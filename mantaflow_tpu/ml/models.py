"""JAX/Flax example models replacing the reference TensorFlow examples
(SURVEY.md §2.11: example1 tiled smoke super-resolution, example2 ML-FLIP,
example3 pressure resnet)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class TiledSRNet(nn.Module):
    """Tiled smoke super-resolution CNN (example1 equivalent): coarse
    density tile -> upres-factor refined tile."""
    upres: int = 2
    features: int = 16

    @nn.compact
    def __call__(self, x):  # x: (B, t, t, t, C)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME")(x)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = nn.Conv(x.shape[-1] * self.upres ** 3, (3, 3, 3),
                    padding="SAME")(h)
        b, t, _, _, _ = x.shape
        u = self.upres
        h = h.reshape(b, t, t, t, u, u, u, x.shape[-1])
        h = jnp.transpose(h, (0, 1, 4, 2, 5, 3, 6, 7))
        return h.reshape(b, t * u, t * u, t * u, x.shape[-1])


class MLFlipNet(nn.Module):
    """ML-FLIP splash classifier (example2 equivalent): per-particle feature
    vector -> detachment probability + velocity modification."""
    hidden: int = 32

    @nn.compact
    def __call__(self, feats):  # (N, F)
        h = nn.Dense(self.hidden)(feats)
        h = nn.relu(h)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        logit = nn.Dense(1)(h)[:, 0]
        dvel = nn.Dense(3)(h)
        return logit, dvel


class PressureResNet(nn.Module):
    """Pressure/velocity resnet (example3 equivalent): predicts the pressure
    field from divergence + flags."""
    features: int = 16
    blocks: int = 3

    @nn.compact
    def __call__(self, x):  # (B, z, y, x, C)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME")(x)
        for _ in range(self.blocks):
            r = nn.Conv(self.features, (3, 3, 3), padding="SAME")(nn.relu(h))
            r = nn.Conv(self.features, (3, 3, 3), padding="SAME")(nn.relu(r))
            h = h + r
        return nn.Conv(1, (3, 3, 3), padding="SAME")(h)[..., 0]


def make_train_state(model, rng, sample_input, lr: float = 1e-3):
    params = model.init(rng, sample_input)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    return params, tx, opt_state


def mse_train_step(model, tx):
    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            out = model.apply(p, x)
            if isinstance(out, tuple):
                out = out[0]
            return jnp.mean((out - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    return step
