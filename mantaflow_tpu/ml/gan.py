"""Adversarial training toolkit: the TPU-idiomatic replacement for the
reference's TF1 layer-builder `tensorflow/tools/GAN.py` (420 LoC of
conv/deconv/resblock/pool graph plumbing used by the GAN variant of
example1's tiled smoke super-resolution).

Flax modules already cover the layer-building role, so this module provides
what that file's *callers* actually consumed: a generator (residual upres
net), a patch discriminator, and jitted alternating train steps with the
non-saturating GAN loss plus an L1 content term (the tempoGAN-style recipe
the reference example uses). Everything is pure/jit-safe; one `gan_train_
steps()` pair drives both nets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax


class ResUpresGenerator(nn.Module):
    """Residual-block generator: coarse tile -> upres factor refined tile
    (the GAN counterpart of models.TiledSRNet; resblocks mirror the
    reference's GAN.residual_block, GAN.py:122-147)."""
    upres: int = 2
    features: int = 16
    blocks: int = 2

    @nn.compact
    def __call__(self, x):  # (B, t, t, t, C)
        h = nn.Conv(self.features, (3, 3, 3), padding="SAME")(x)
        for _ in range(self.blocks):
            r = nn.Conv(self.features, (3, 3, 3), padding="SAME")(nn.relu(h))
            r = nn.Conv(self.features, (3, 3, 3), padding="SAME")(nn.relu(r))
            h = h + r
        c = x.shape[-1]
        h = nn.Conv(c * self.upres ** 3, (3, 3, 3), padding="SAME")(h)
        b, t = x.shape[0], x.shape[1]
        u = self.upres
        h = h.reshape(b, t, t, t, u, u, u, c)
        h = jnp.transpose(h, (0, 1, 4, 2, 5, 3, 6, 7))
        return h.reshape(b, t * u, t * u, t * u, c)


class PatchDiscriminator(nn.Module):
    """Strided-conv discriminator on (coarse, fine) pairs -> per-sample
    logit (real vs generated), leaky-relu activations (GAN.py:415-419)."""
    features: int = 16
    layers: int = 3

    @nn.compact
    def __call__(self, fine, coarse_up):  # both (B, T, T, T, C)
        h = jnp.concatenate([fine, coarse_up], axis=-1)
        f = self.features
        for _ in range(self.layers):
            h = nn.Conv(f, (4, 4, 4), strides=(2, 2, 2), padding="SAME")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            f *= 2
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(1)(h)[:, 0]


def upsample_nearest(x, factor: int):
    """Nearest-neighbor tile upsample (B, t, t, t, C) -> (B, tf, tf, tf, C);
    the discriminator conditions on the coarse input at fine resolution."""
    for ax in (1, 2, 3):
        x = jnp.repeat(x, factor, axis=ax)
    return x


def gan_train_steps(gen: nn.Module, disc: nn.Module, gen_tx, disc_tx,
                    content_weight: float = 5.0):
    """Build jitted (generator_step, discriminator_step).

    Non-saturating losses: D maximizes log D(real) + log(1-D(fake)); G
    minimizes -log D(fake) + content_weight * L1(fake, real). Both steps
    take (gen_params, disc_params, opt_state, coarse, fine) and return the
    updated params/opt_state plus the scalar loss.
    """
    bce = optax.sigmoid_binary_cross_entropy

    @jax.jit
    def disc_step(gen_params, disc_params, disc_opt, coarse, fine):
        fake = gen.apply(gen_params, coarse)
        cup = upsample_nearest(coarse, fine.shape[1] // coarse.shape[1])

        def loss_fn(dp):
            lr = disc.apply(dp, fine, cup)
            lf = disc.apply(dp, fake, cup)
            return jnp.mean(bce(lr, jnp.ones_like(lr))
                            + bce(lf, jnp.zeros_like(lf)))

        loss, grads = jax.value_and_grad(loss_fn)(disc_params)
        updates, disc_opt = disc_tx.update(grads, disc_opt)
        return optax.apply_updates(disc_params, updates), disc_opt, loss

    @jax.jit
    def gen_step(gen_params, disc_params, gen_opt, coarse, fine):
        cup = upsample_nearest(coarse, fine.shape[1] // coarse.shape[1])

        def loss_fn(gp):
            fake = gen.apply(gp, coarse)
            lf = disc.apply(disc_params, fake, cup)
            adv = jnp.mean(bce(lf, jnp.ones_like(lf)))
            content = jnp.mean(jnp.abs(fake - fine))
            return adv + content_weight * content

        loss, grads = jax.value_and_grad(loss_fn)(gen_params)
        updates, gen_opt = gen_tx.update(grads, gen_opt)
        return optax.apply_updates(gen_params, updates), gen_opt, loss

    return gen_step, disc_step


def make_gan_states(coarse_sample, fine_sample, rng=None,
                    upres: int | None = None, lr: float = 1e-4):
    """Convenience: build (gen, disc, params, opt states, steps) for tile
    pairs; mirrors how the reference example wires tools/GAN.py."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if upres is None:
        upres = fine_sample.shape[1] // coarse_sample.shape[1]
    gen = ResUpresGenerator(upres=upres)
    disc = PatchDiscriminator()
    r1, r2 = jax.random.split(rng)
    gen_params = gen.init(r1, coarse_sample)
    cup = upsample_nearest(coarse_sample, upres)
    disc_params = disc.init(r2, fine_sample, cup)
    gen_tx = optax.adam(lr)
    disc_tx = optax.adam(lr)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params)
    gen_step, disc_step = gan_train_steps(gen, disc, gen_tx, disc_tx)
    return dict(gen=gen, disc=disc, gen_params=gen_params,
                disc_params=disc_params, gen_opt=gen_opt, disc_opt=disc_opt,
                gen_step=gen_step, disc_step=disc_step)
