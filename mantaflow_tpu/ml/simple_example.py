"""As-simple-as-possible ML example, end to end (example0 equivalent).

The reference example0 (tensorflow/example0_simple): manta_genSimSimple.py
dumps 2D plume density frames; tf_simple.py trains a 3-layer
fully-connected autoencoder (flatten -> 50-unit tanh latent -> back,
tf_simple.py:73-90) on them and reconstructs validation frames. Here the
same pipeline in JAX/Flax: generate with the fused 2D smoke model, train
DenseAutoencoder, report train/validation cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ..core.domain import Domain
from ..core.shapes import Sphere
from ..models import smoke as sm
from .models import make_train_state, mse_train_step


class DenseAutoencoder(nn.Module):
    """tf_simple.py:73-90 architecture: flatten, 50-unit tanh latent (the
    reference adds dropout there; deterministic here), linear back out."""
    latent: int = 50

    @nn.compact
    def __call__(self, x):  # (B, h, w, 1)
        b, h, w, c = x.shape
        z = nn.tanh(nn.Dense(self.latent)(x.reshape(b, h * w * c)))
        return nn.Dense(h * w * c)(z).reshape(b, h, w, c)


def generate_densities(res: int = 64, n_sims: int = 2, n_frames: int = 20,
                       steps_per_frame: int = 2, seed: int = 0):
    """2D plume density frames (manta_genSimSimple.py pattern: randomized
    source position per sim). Returns (N, res, res, 1) float32."""
    rng = np.random.RandomState(seed)
    dom = Domain(size=(res, res, 1), dim=2)
    params = sm.SmokeParams(buoyancy=(0.0, -3e-3, 0.0))
    frames = []
    for _ in range(n_sims):
        src = Sphere(center=(res * (0.3 + 0.4 * rng.rand()), res * 0.14,
                             0.5),
                     radius=res * (0.08 + 0.06 * rng.rand()))
        state = sm.make_smoke_state(dom, params, source_shape=src)
        for _ in range(n_frames):
            state = sm.smoke_run(state, dom, params, steps_per_frame)
            frames.append(np.asarray(state.density)[0][..., None])
    return np.stack(frames).astype(np.float32)


def train_autoencoder(frames: np.ndarray, n_steps: int = 200,
                      batch: int = 10, lr: float = 1e-3, seed: int = 0,
                      vali_frac: float = 0.1):
    """Train on 90% of frames, validate on the rest (tf_simple.py split);
    returns (net, params, train_losses, vali_cost)."""
    n_vali = max(1, int(len(frames) * vali_frac))
    train, vali = frames[:-n_vali], frames[-n_vali:]
    net = DenseAutoencoder()
    params, tx, opt_state = make_train_state(net, jax.random.PRNGKey(seed),
                                             jnp.asarray(train[:1]), lr)
    step = mse_train_step(net, tx)
    rs = np.random.RandomState(seed)
    losses = []
    for _ in range(n_steps):
        idx = rs.choice(len(train), min(batch, len(train)))
        x = jnp.asarray(train[idx])
        params, opt_state, loss = step(params, opt_state, x, x)
        losses.append(float(loss))
    rec = np.asarray(net.apply(params, jnp.asarray(vali)))
    vali_cost = float(np.mean((rec - vali) ** 2))
    return net, params, losses, vali_cost
