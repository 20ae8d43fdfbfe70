"""Segmentation-network training (Superhuman/MALA/UNETR affinity nets).

The reference ships the training data provider (data_provider_labeled.py) but
no entry point; this completes the capability: rebalance-weighted BCE on
affinities (the provider's weightmap, provider_valid.py:236), Adam, jitted
SPMD step with batch sharding."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gpemsr_tpu.train.common import TrainState


def make_seg_step(model, lr: float = 1e-4, train_flag: bool = True):
    tx = optax.adam(lr)

    def center_crop(t, zyx):
        """[B, C, Z, Y, X] target cropped to the net's (valid-conv) output
        window — MALA predicts the centered [25,56,56] of a [53,268,268]
        crop (unet3d_mala valid convolutions)."""
        dz = (t.shape[2] - zyx[0]) // 2
        dy = (t.shape[3] - zyx[1]) // 2
        dx = (t.shape[4] - zyx[2]) // 2
        return t[:, :, dz:dz + zyx[0], dy:dy + zyx[1], dx:dx + zyx[2]]

    def loss_fn(params, batch_stats, imgs, affs, weight):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        if batch_stats is not None:
            # passing mutable= (even []) makes flax return (out, vars)
            pred, new_vars = model.apply(variables, imgs,
                                         mutable=["batch_stats"],
                                         train=train_flag)
        else:
            pred, new_vars = model.apply(variables, imgs), {}
        pred = pred.transpose(0, 4, 1, 2, 3)       # [B, C, Z, Y, X]
        affs = center_crop(affs, pred.shape[2:])
        weight = center_crop(weight, pred.shape[2:])
        eps = 1e-7
        p = jnp.clip(pred, eps, 1 - eps)
        bce = -(affs * jnp.log(p) + (1 - affs) * jnp.log(1 - p))
        loss = jnp.sum(bce * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        return loss, new_vars.get("batch_stats")

    @jax.jit
    def step(state: TrainState, batch_stats, imgs, affs, weight):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch_stats, imgs, affs, weight)
        return state.apply_gradients(grads), new_bs, {"bce_loss": loss}

    return tx, step


def init_seg_state(rng, model, sample, lr: float = 1e-4):
    variables = jax.jit(model.init)(rng, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx, step = make_seg_step(model, lr, train_flag=batch_stats is not None)
    return TrainState.create(params, tx), batch_stats, step
