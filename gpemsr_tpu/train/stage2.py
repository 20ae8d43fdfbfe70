"""Stage 2 — Indexer training (reference train_stage2.py:351-366).

Cross-entropy between Indexer logits on the LR patch and the frozen encoder's
nearest-code indices of the paired HR patch. The VQGAN submodules stay frozen:
structurally partitioned out of the optimizer instead of requires_grad flags."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gpemsr_tpu.core.config import PriorConfig, TrainConfig
from gpemsr_tpu.models.prior import LRGenerator
from gpemsr_tpu.train.common import TrainState, make_optimizer, merge_params, split_params

FROZEN = ("encoder", "decoder", "codebook")


def init_stage2(rng, cfg: PriorConfig, tcfg: TrainConfig, sample_lr, sample_gt,
                pretrained_params=None):
    model = LRGenerator(cfg)
    params = jax.jit(lambda r, a, b: model.init(
        r, a, b, method=LRGenerator.init_all))(
            rng, sample_lr, sample_gt)["params"]
    if pretrained_params is not None:
        # stage-1 weights (strict=False load in the reference — only the
        # overlapping VQGAN subtrees transfer, train_stage2.py:124-125)
        for k in FROZEN:
            if k in pretrained_params:
                params[k] = pretrained_params[k]
    trainable, frozen = split_params(params, FROZEN)
    state = TrainState.create(trainable, make_optimizer(tcfg, tcfg.lr_G))
    return model, state, frozen


def make_stage2_step(model: LRGenerator, compute_dtype=jnp.float32):
    low_precision = compute_dtype != jnp.float32

    def loss_fn(trainable, frozen, lr_imgs, gt_imgs):
        from gpemsr_tpu.utils.precision import cast_floats
        params = merge_params(trainable, frozen)
        if low_precision:
            params = cast_floats(params, compute_dtype)
            lr_imgs = lr_imgs.astype(compute_dtype)
            gt_imgs = gt_imgs.astype(compute_dtype)
        logits, gt_idx = model.apply({"params": params}, lr_imgs, gt_imgs)
        logits = logits.astype(jnp.float32)   # CE softmax in f32
        gt_idx = jax.lax.stop_gradient(gt_idx)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, gt_idx)
        acc = jnp.mean(jnp.argmax(logits, axis=-1) == gt_idx)
        return jnp.mean(ce), {"ce_loss": jnp.mean(ce), "index_acc": acc}

    @jax.jit
    def step(state: TrainState, frozen, lr_imgs, gt_imgs):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, frozen, lr_imgs, gt_imgs)
        return state.apply_gradients(grads), metrics

    return step
