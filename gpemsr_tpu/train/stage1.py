"""Stage 1 — VQGAN prior pretraining (reference train_stage1.py:291-371).

GAN alternation as separate jitted SPMD steps over the data mesh:
  * generator step (pre-GAN: L1 + codebook; GAN phase adds -mean(D(fake)))
  * discriminator step (0.5*(-mean(D(real)) + mean(D(fake))))
  * discriminator R1 step every `net_d_reg_every` (double-grad via jax.grad)
Gradient reduction across chips is the implicit psum XLA inserts for the
batch-sharded loss mean — the DDP allreduce, minus the framework."""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from gpemsr_tpu.core.config import DiscriminatorConfig, PriorConfig, TrainConfig
from gpemsr_tpu.models.prior import Discriminator, VQGANGenerator
from gpemsr_tpu.train.common import TrainState, make_optimizer


def create_models(prior_cfg: PriorConfig, disc_cfg: DiscriminatorConfig):
    return VQGANGenerator(prior_cfg), Discriminator(disc_cfg)


def init_states(rng, gen, disc, tcfg: TrainConfig, sample):
    g_params = jax.jit(gen.init)(rng, sample)["params"]
    d_params = jax.jit(disc.init)(jax.random.fold_in(rng, 1), sample)["params"]
    g_state = TrainState.create(g_params, make_optimizer(tcfg, tcfg.lr_G))
    d_state = TrainState.create(d_params, make_optimizer(tcfg, tcfg.lr_D))
    return g_state, d_state


def make_g_step(gen, disc, tcfg: TrainConfig, use_gan: bool):
    def loss_fn(g_params, d_params, imgs):
        dec, _, q_loss = gen.apply({"params": g_params}, imgs)
        rec = jnp.mean(jnp.abs(imgs - dec))
        loss = tcfg.rec_loss_factor * rec + tcfg.codebook_loss_factor * q_loss
        metrics = {"rec_loss": rec, "codebook_loss": q_loss}
        if use_gan:
            fake_logits = disc.apply({"params": d_params}, dec)
            g_gan = jnp.mean(-fake_logits)
            loss = loss + tcfg.gan_loss_factor * g_gan
            metrics["g_gan_loss"] = g_gan
        return loss, (dec, metrics)

    @jax.jit
    def step(g_state: TrainState, d_params, imgs):
        grads, (dec, metrics) = jax.grad(loss_fn, has_aux=True)(
            g_state.params, d_params, imgs)
        return g_state.apply_gradients(grads), dec, metrics

    return step


def make_d_step(gen, disc, tcfg: TrainConfig, with_r1: bool):
    def d_loss(d_params, real, fake):
        lr_real = jnp.mean(-disc.apply({"params": d_params}, real))
        lr_fake = jnp.mean(disc.apply({"params": d_params}, fake))
        loss = 0.5 * (lr_real + lr_fake)
        metrics = {"d_loss_real": lr_real, "d_loss_fake": lr_fake}
        if with_r1:
            # R1: E[ ||grad_x D(x)||^2 ] on real images (train_stage1.py:360-371)
            def d_sum(x):
                return jnp.sum(disc.apply({"params": d_params}, x))
            gx = jax.grad(d_sum)(real)
            r1 = jnp.mean(jnp.sum(gx ** 2, axis=(1, 2, 3)))
            loss = loss + 0.5 * tcfg.r1_reg_weight * r1 * tcfg.net_d_reg_every
            metrics["r1"] = r1
        return loss, metrics

    @jax.jit
    def step(d_state: TrainState, g_params, imgs):
        fake, _, _ = gen.apply({"params": g_params}, imgs)
        fake = jax.lax.stop_gradient(fake)
        grads, metrics = jax.grad(d_loss, has_aux=True)(
            d_state.params, imgs, fake)
        return d_state.apply_gradients(grads), metrics

    return step


class Stage1Trainer:
    """Host-side orchestration of the three jitted steps with the reference's
    phase switching (gan_start, net_d_reg_every)."""

    def __init__(self, prior_cfg: PriorConfig, disc_cfg: DiscriminatorConfig,
                 tcfg: TrainConfig, rng, sample):
        self.tcfg = tcfg
        self.gen, self.disc = create_models(prior_cfg, disc_cfg)
        self.g_state, self.d_state = init_states(rng, self.gen, self.disc,
                                                 tcfg, sample)
        self._g_pre = make_g_step(self.gen, self.disc, tcfg, use_gan=False)
        self._g_gan = make_g_step(self.gen, self.disc, tcfg, use_gan=True)
        self._d_plain = make_d_step(self.gen, self.disc, tcfg, with_r1=False)
        self._d_r1 = make_d_step(self.gen, self.disc, tcfg, with_r1=True)
        self.step = tcfg.current_step

    def train_step(self, imgs):
        self.step += 1
        t = self.tcfg
        metrics = {}
        gan_phase = self.step > t.gan_start
        if (not gan_phase) or self.step % t.generator_update_rate == 0:
            g_fn = self._g_gan if gan_phase else self._g_pre
            self.g_state, _, g_m = g_fn(self.g_state, self.d_state.params, imgs)
            metrics.update({k: float(v) for k, v in g_m.items()})
        if gan_phase:
            d_fn = self._d_r1 if self.step % t.net_d_reg_every == 0 else self._d_plain
            self.d_state, d_m = d_fn(self.d_state, self.g_state.params, imgs)
            metrics.update({k: float(v) for k, v in d_m.items()})
        return metrics
