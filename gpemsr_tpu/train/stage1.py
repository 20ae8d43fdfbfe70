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


def _cast_compute(dtype, *trees):
    from gpemsr_tpu.utils.precision import cast_floats
    return tuple(cast_floats(t, dtype) for t in trees)


def make_g_step(gen, disc, tcfg: TrainConfig, use_gan: bool,
                compute_dtype=jnp.float32):
    low_precision = compute_dtype != jnp.float32

    n_codes = gen.cfg.codebook.num_codebook_vectors

    def loss_fn(g_params, d_params, imgs):
        if low_precision:
            g_params, d_params, imgs = _cast_compute(
                compute_dtype, g_params, d_params, imgs)
        dec, idx, q_loss = gen.apply({"params": g_params}, imgs)
        q_loss = q_loss.astype(jnp.float32)
        rec = jnp.mean(jnp.abs(imgs.astype(jnp.float32)
                               - dec.astype(jnp.float32)))
        loss = tcfg.rec_loss_factor * rec + tcfg.codebook_loss_factor * q_loss
        metrics = {"rec_loss": rec, "codebook_loss": q_loss}
        if use_gan:
            fake_logits = disc.apply({"params": d_params}, dec)
            g_gan = jnp.mean(-fake_logits.astype(jnp.float32))
            loss = loss + tcfg.gan_loss_factor * g_gan
            metrics["g_gan_loss"] = g_gan
        # per-step code-usage histogram (drives optional dead-code revival;
        # the trainer pops it from metrics before float-casting)
        metrics["_code_usage"] = jnp.zeros(
            n_codes, jnp.float32).at[idx].add(1.0)
        return loss, (dec, metrics)

    @jax.jit
    def step(g_state: TrainState, d_params, imgs):
        grads, (dec, metrics) = jax.grad(loss_fn, has_aux=True)(
            g_state.params, d_params, imgs)
        return g_state.apply_gradients(grads), dec, metrics

    return step


def make_d_step(gen, disc, tcfg: TrainConfig, with_r1: bool,
                compute_dtype=jnp.float32):
    low_precision = compute_dtype != jnp.float32

    def d_loss(d_params, real, fake):
        if low_precision:
            d_params, = _cast_compute(compute_dtype, d_params)
        lr_real = jnp.mean(-disc.apply({"params": d_params}, real)
                           .astype(jnp.float32))
        lr_fake = jnp.mean(disc.apply({"params": d_params}, fake)
                           .astype(jnp.float32))
        loss = 0.5 * (lr_real + lr_fake)
        metrics = {"d_loss_real": lr_real, "d_loss_fake": lr_fake}
        if with_r1:
            # R1: E[ ||grad_x D(x)||^2 ] on real images (train_stage1.py:360-371)
            def d_sum(x):
                return jnp.sum(disc.apply({"params": d_params}, x)
                               .astype(jnp.float32))
            gx = jax.grad(d_sum)(real)
            r1 = jnp.mean(jnp.sum(gx.astype(jnp.float32) ** 2, axis=(1, 2, 3)))
            loss = loss + 0.5 * tcfg.r1_reg_weight * r1 * tcfg.net_d_reg_every
            metrics["r1"] = r1
        return loss, metrics

    @jax.jit
    def step(d_state: TrainState, g_params, imgs):
        if low_precision:
            g_params, imgs = _cast_compute(compute_dtype, g_params, imgs)
        fake, _, _ = gen.apply({"params": g_params}, imgs)
        fake = jax.lax.stop_gradient(fake)
        grads, metrics = jax.grad(d_loss, has_aux=True)(
            d_state.params, imgs, fake)
        return d_state.apply_gradients(grads), metrics

    return step


def make_revive_step(gen):
    """Dead-code revival: re-seed codebook rows whose usage count over the
    tracking window is zero with encoder outputs of the current batch.
    The Adam state for the embedding is left as-is (moments decay quickly)."""

    @jax.jit
    def revive(g_state: TrainState, imgs, dead, rng):
        z = gen.apply({"params": g_state.params}, imgs,
                      method=lambda m, x: m.encoder(x))
        zf = jax.lax.stop_gradient(z.reshape(-1, z.shape[-1]))
        emb = g_state.params["codebook"]["embedding"]
        picks = jax.random.randint(rng, (emb.shape[0],), 0, zf.shape[0])
        new_emb = jnp.where(dead[:, None], zf[picks], emb)
        params = jax.tree_util.tree_map(lambda x: x, g_state.params)
        params["codebook"] = dict(params["codebook"], embedding=new_emb)
        return g_state.replace(params=params)

    return revive


class Stage1Trainer:
    """Host-side orchestration of the three jitted steps with the reference's
    phase switching (gan_start, net_d_reg_every)."""

    def __init__(self, prior_cfg: PriorConfig, disc_cfg: DiscriminatorConfig,
                 tcfg: TrainConfig, rng, sample, compute_dtype=jnp.float32):
        self.tcfg = tcfg
        self.gen, self.disc = create_models(prior_cfg, disc_cfg)
        self.g_state, self.d_state = init_states(rng, self.gen, self.disc,
                                                 tcfg, sample)
        cd = compute_dtype
        self._g_pre = make_g_step(self.gen, self.disc, tcfg, use_gan=False,
                                  compute_dtype=cd)
        self._g_gan = make_g_step(self.gen, self.disc, tcfg, use_gan=True,
                                  compute_dtype=cd)
        self._d_plain = make_d_step(self.gen, self.disc, tcfg, with_r1=False,
                                    compute_dtype=cd)
        self._d_r1 = make_d_step(self.gen, self.disc, tcfg, with_r1=True,
                                 compute_dtype=cd)
        self._revive = make_revive_step(self.gen) \
            if tcfg.codebook_revive_every else None
        self._revive_rng = jax.random.fold_in(rng, 0x5eed)
        self._usage = None
        self.step = tcfg.current_step

    def train_step(self, imgs):
        self.step += 1
        t = self.tcfg
        metrics = {}
        gan_phase = self.step > t.gan_start
        if (not gan_phase) or self.step % t.generator_update_rate == 0:
            g_fn = self._g_gan if gan_phase else self._g_pre
            self.g_state, _, g_m = g_fn(self.g_state, self.d_state.params, imgs)
            usage = g_m.pop("_code_usage")
            if self._revive is not None:
                self._usage = usage if self._usage is None \
                    else self._usage + usage
                if self.step % t.codebook_revive_every == 0:
                    dead = self._usage == 0
                    n_dead = int(jnp.sum(dead))
                    if n_dead:
                        self._revive_rng, sub = jax.random.split(
                            self._revive_rng)
                        self.g_state = self._revive(self.g_state, imgs,
                                                    dead, sub)
                    self._usage = None
                    metrics["revived_codes"] = float(n_dead)
            # keep metrics as device arrays: float() would sync every step
            # and serialize input-pipeline work with device compute
            metrics.update(g_m)
        if gan_phase:
            d_fn = self._d_r1 if self.step % t.net_d_reg_every == 0 else self._d_plain
            self.d_state, d_m = d_fn(self.d_state, self.g_state.params, imgs)
            metrics.update(d_m)
        return metrics
