"""Stage 3 — full GPEMSR SR training (reference train_stage3.py:343-374).

loss = L1(GT, SR) + ref_loss_factor * ContextualLoss(VGG relu3_4 of SR vs the
N prior reference frames as ONE B*t batch — exactly the reference's
train_stage3.py:357-361 expand+reshape), with the prior (refmodel), SpyNet
and VGG frozen."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpemsr_tpu.core.config import GPEMSRConfig, TrainConfig
from gpemsr_tpu.models.gpemsr import GPEMSR
from gpemsr_tpu.models.vgg import VGG19Features, normalize_for_vgg
from gpemsr_tpu.ops.contextual import contextual_bilateral_loss, contextual_loss
from gpemsr_tpu.train.common import TrainState, make_optimizer, merge_params, split_params

FROZEN = ("refmodel", "spynet", "vgg")


def init_stage3(rng, cfg: GPEMSRConfig, tcfg: TrainConfig, sample_lq,
                pretrained: dict | None = None):
    model = GPEMSR(cfg)
    # jitted init: one compile instead of per-op dispatch (slow on
    # remote-compile setups)
    params = jax.jit(model.init)(rng, sample_lq)["params"]
    if pretrained:
        for k, v in pretrained.items():
            params[k] = v
    trainable, frozen = split_params(params, FROZEN)
    # separate relu3_4 VGG for the contextual loss (the reference reuses the
    # model's full VGG19; ours only materialises relu1_2 for the mask branch,
    # so the CX loss gets its own frozen tree — convert the same torch VGG19
    # checkpoint into both)
    if tcfg.ref_loss_factor:
        vgg34 = VGG19Features(max_layer="relu3_4")
        h = sample_lq.shape[2] * cfg.scale
        w = sample_lq.shape[3] * cfg.scale
        cx_sample = jnp.zeros((1, h, w, 3), jnp.float32)
        frozen["cx_vgg"] = vgg34.init(
            jax.random.fold_in(rng, 7), cx_sample)["params"]
    state = TrainState.create(trainable, make_optimizer(tcfg, tcfg.lr_G))
    return model, state, frozen


def make_stage3_step(model: GPEMSR, tcfg: TrainConfig,
                     compute_dtype=jnp.float32):
    """compute_dtype=bfloat16 casts params+batch at the top of loss_fn (f32
    master weights; losses and the Adam update stay f32 — grads flow back
    through the cast). CX matmuls already accumulate f32 via
    preferred_element_type, so bf16 features keep today's default-precision
    numerics on TPU."""
    vgg34 = VGG19Features(max_layer="relu3_4")
    low_precision = compute_dtype != jnp.float32
    if tcfg.cx_is_cobi:
        def cx_fn(a, b):
            return contextual_bilateral_loss(
                a, b, weight_sp=tcfg.cx_weight_sp,
                band_width=tcfg.cx_band_width, loss_type=tcfg.cx_loss_type)
    else:
        def cx_fn(a, b):
            return contextual_loss(a, b, band_width=tcfg.cx_band_width,
                                   loss_type=tcfg.cx_loss_type)

    def ref_ctx_loss(vgg_params, sr, ref_imgs):
        """ONE contextual loss over the (B*t) frame batch — reference-exact
        (train_stage3.py:357-361 expands SR to (b*t,3,h,w) b-major/t-minor
        and calls ContextualLoss once, so the cosine mean-shift y_mu is the
        mean over the WHOLE B*t batch). Batched beats the previous per-frame
        lax.scan on TPU: one (B*t,C,L)x(B*t,C,L) MXU einsum instead of t
        sequential ones — a stage-3 step trace attributed 39% of device time
        to the scan's while loops."""
        b, t = ref_imgs.shape[:2]
        # normalize_for_vgg's f32 constants promote — cast back so a bf16
        # compute dtype stays bf16 through the VGG stack
        sr3 = jnp.broadcast_to(sr, sr.shape[:-1] + (3,))
        sr_feat = vgg34.apply({"params": vgg_params},
                              normalize_for_vgg(sr3).astype(sr.dtype))["relu3_4"]
        sr_feat = sr_feat.transpose(0, 3, 1, 2)     # [B, C, h, w] for CX
        refs = ref_imgs.reshape((b * t,) + ref_imgs.shape[2:])
        r3 = jnp.broadcast_to(refs, refs.shape[:-1] + (3,))
        rf = vgg34.apply({"params": vgg_params},
                         normalize_for_vgg(r3).astype(sr.dtype))["relu3_4"]
        rf = rf.transpose(0, 3, 1, 2)               # [B*t, C, h, w]
        sr_bt = jnp.repeat(sr_feat, t, axis=0)      # b-major, t-minor
        return cx_fn(sr_bt, rf)

    def loss_fn(trainable, frozen, lq, gt):
        from gpemsr_tpu.utils.precision import cast_floats
        model_frozen = {k: v for k, v in frozen.items() if k != "cx_vgg"}
        params = merge_params(trainable, model_frozen)
        cx_vgg = frozen.get("cx_vgg")
        if low_precision:
            params = cast_floats(params, compute_dtype)
            cx_vgg = cast_floats(cx_vgg, compute_dtype)
            lq = lq.astype(compute_dtype)
        sr, ref_imgs = model.apply({"params": params}, lq)
        rec = jnp.mean(jnp.abs(gt - sr.astype(jnp.float32)))
        loss = tcfg.rec_loss_factor * rec
        metrics = {"rec_loss": rec}
        if tcfg.ref_loss_factor and ref_imgs is not None:
            ctx = ref_ctx_loss(cx_vgg, sr,
                               jax.lax.stop_gradient(ref_imgs))
            ctx = ctx.astype(jnp.float32)
            loss = loss + tcfg.ref_loss_factor * ctx
            metrics["ref_loss"] = ctx
        return loss, metrics

    @jax.jit
    def step(state: TrainState, frozen, lq, gt):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, frozen, lq, gt)
        return state.apply_gradients(grads), metrics

    return step
