"""Stage training loops: data, steps, validation, checkpointing, logging.

The orchestration layer the reference spreads over train_stage{1,2,3}.py,
unified: epoch-seeded sharded sampling, jitted SPMD steps, PSNR validation
(full sections, quarter-tiled to bound memory like train_stage3.py:218-246),
atomic checkpoints every save_checkpoint_freq with resume-from-latest."""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gpemsr_tpu.core import checkpoint as ckpt
from gpemsr_tpu.core.config import ExperimentConfig
from gpemsr_tpu.core.logging import MetricsWriter, setup_logger
from gpemsr_tpu.data.datasets import CREMIDataset, IndexerDataset, VQGANDataset
from gpemsr_tpu.data.sampler import EpochShardSampler, Loader
from gpemsr_tpu.parallel.mesh import host_shard_batch, production_mesh, replicate
from gpemsr_tpu.utils.image import tensor2img
from gpemsr_tpu.utils.metrics import calculate_psnr


def make_train_loader(cfg: ExperimentConfig, dataset, host_id: int,
                      host_count: int):
    """Production data+mesh setup shared by the three stages: build the mesh
    from cfg.parallel, split the global batch across hosts (the reference's
    batch_size//world_size, data/__init__.py:13-14), and guard divisibility
    against the data axis so every chip gets equal shards."""
    ds_cfg = cfg.datasets["train"]
    global_batch = ds_cfg.batch_size
    if global_batch % host_count:
        raise ValueError(
            f"batch_size {global_batch} not divisible by host_count {host_count}")
    mesh = production_mesh(cfg.parallel, global_batch=global_batch)
    n_data = mesh.shape["data"]
    if global_batch % n_data:
        raise ValueError(
            f"batch_size {global_batch} not divisible by data-axis size {n_data}")
    host_batch = global_batch // host_count
    sampler = EpochShardSampler(len(dataset), host_id, host_count,
                                base_seed=cfg.train.manual_seed)
    loader = Loader(dataset, host_batch, sampler, ds_cfg.n_workers)
    return mesh, loader


def sharded_map(fwd, inputs, mesh):
    """Apply a jitted batched `fwd` to a list of equally-shaped arrays,
    chunked to the mesh's data-axis size and sharded over it — the SPMD
    equivalent of the reference's rank-striped validation loops
    (train_stage1.py:212-228). Returns np outputs in input order."""
    n = mesh.shape["data"]
    outs = []
    for s in range(0, len(inputs), n):
        chunk = list(inputs[s:s + n])
        pad = n - len(chunk)
        arr = np.stack(chunk + [chunk[-1]] * pad)
        out = np.asarray(fwd(host_shard_batch(jnp.asarray(arr), mesh)))
        outs.extend(out[:len(chunk)])
    return outs


def _quantize_u8(batch):
    """Exact u8 re-quantization of PNG-derived [0,1] float batches for the
    host->device transfer. Crop/flip-only augmentation keeps every pixel at
    k/255, so rint(x*255) is lossless here and the transfer shrinks 4x —
    decisive when the device link is a slow relay. Opt-in via
    parallel.u8_transfer (real-valued pipelines must keep f32)."""
    return jax.tree.map(
        lambda a: np.rint(np.asarray(a) * np.float32(255)).astype(np.uint8)
        if np.asarray(a).dtype == np.float32 else a, batch)


# Correctly-rounded k/255 for every u8 value. XLA's f32 divide is not
# correctly rounded (x/255 lands 1 ulp off numpy's for ~1/3 of inputs), so a
# device-side divide would break the u8 path's bit-parity with the f32 path;
# a 256-entry constant gather is exact and epsilon-cost next to a train step.
_U8_LUT = np.arange(256, dtype=np.float32) / 255.0


@jax.jit
def _dequantize_u8(batch):
    lut = jnp.asarray(_U8_LUT)
    return jax.tree.map(
        lambda a: jnp.take(lut, a.astype(jnp.int32), axis=0)
        if a.dtype == jnp.uint8 else a, batch)


def quarter_tiles(img: np.ndarray):
    """Split ...HWC into 4 quadrants (train_stage2.py:229-257 protocol)."""
    H, W = img.shape[-3], img.shape[-2]
    h2, w2 = H // 2, W // 2
    return [img[..., :h2, :w2, :], img[..., :h2, w2:, :],
            img[..., h2:, :w2, :], img[..., h2:, w2:, :]]


def reassemble_quarters(tiles, out_h, out_w):
    top = np.concatenate([tiles[0], tiles[1]], axis=-2)
    bot = np.concatenate([tiles[2], tiles[3]], axis=-2)
    return np.concatenate([top, bot], axis=-3)


def psnr_of(pred: np.ndarray, target: np.ndarray) -> float:
    return calculate_psnr(tensor2img(pred), tensor2img(target))


class StageRunner:
    """Common loop scaffolding; stage specifics are injected callables."""

    def __init__(self, cfg: ExperimentConfig, train_step: Callable,
                 validate: Callable, state_pack: Callable,
                 state_unpack: Callable, loader: Loader):
        self.cfg = cfg
        self.train_step = train_step
        self.validate = validate
        self.state_pack = state_pack
        self.state_unpack = state_unpack
        self.loader = loader
        self.exp_dir = os.path.join(cfg.root, cfg.name)
        self.ckpt_dir = os.path.join(self.exp_dir, "checkpoints")
        self.logger = setup_logger("gpemsr", os.path.join(self.exp_dir, "log"))
        self.metrics = MetricsWriter(os.path.join(self.exp_dir, "metrics.jsonl"))

    def maybe_resume(self) -> int:
        step = ckpt.latest_step(self.ckpt_dir)
        if step is not None:
            self.logger.info("resuming from step %d", step)
            self.state_unpack(ckpt.restore(self.ckpt_dir, step))
            return step
        return self.cfg.train.current_step

    def run(self):
        t = self.cfg.train
        step = self.maybe_resume()
        batches_per_epoch = max(1, self.loader.sampler.num_samples
                                // self.loader.batch_size)
        epoch = step // batches_per_epoch
        while step < t.niter:
            for batch in self.loader.epoch(epoch):
                step += 1
                if step > t.niter:
                    break
                metrics = self.train_step(step, batch)
                if step % t.logger_freq == 0:
                    self.metrics.write(step, **metrics)
                    self.logger.info("step %d: %s", step, {
                        k: round(float(v), 5) for k, v in metrics.items()})
                if step % t.val_freq == 0:
                    val = self.validate(step)
                    self.metrics.write(step, **val)
                    self.logger.info("validation @%d: %s", step, val)
                if step % self.cfg.save_checkpoint_freq == 0:
                    ckpt.save(self.ckpt_dir, step, self.state_pack(),
                              keep=self.cfg.keep_checkpoints)
            epoch += 1
        step = min(step, t.niter)
        # final checkpoint: without this, niter not divisible by
        # save_checkpoint_freq silently drops the tail of training. Keyed
        # on what is actually on disk so a no-op restart of a completed
        # run doesn't rewrite (rmtree+rename race under multi-host) an
        # identical checkpoint.
        if step > 0 and ckpt.latest_step(self.ckpt_dir) != step:
            ckpt.save(self.ckpt_dir, step, self.state_pack(),
                      keep=self.cfg.keep_checkpoints)
        self.logger.info("training done at step %d", step)


# ---------------------------------------------------------------------------
# Stage-specific runners
# ---------------------------------------------------------------------------

def run_stage1(cfg: ExperimentConfig, host_id: int = 0, host_count: int = 1):
    from gpemsr_tpu.core.config import prior_config_from_reference_dict
    from gpemsr_tpu.train.stage1 import Stage1Trainer

    prior_cfg = cfg.network.prior
    ds_cfg = cfg.datasets["train"]
    dataset = VQGANDataset(ds_cfg, train=True)
    mesh, loader = make_train_loader(cfg, dataset, host_id, host_count)

    gs = ds_cfg.GT_size
    sample = jnp.zeros((ds_cfg.batch_size, gs, gs, 1), jnp.float32)
    from gpemsr_tpu.utils.precision import resolve_dtype
    trainer = Stage1Trainer(prior_cfg, cfg.discriminator, cfg.train,
                            jax.random.PRNGKey(cfg.train.manual_seed), sample,
                            compute_dtype=resolve_dtype(
                                cfg.parallel.compute_dtype))
    # production path is SPMD over the mesh: params replicated, batches
    # sharded on the data axis (the DDP wrap of train_stage1.py:131-134)
    trainer.g_state = replicate(trainer.g_state, mesh)
    trainer.d_state = replicate(trainer.d_state, mesh)

    val_set = VQGANDataset(cfg.datasets["val"], train=False) \
        if "val" in cfg.datasets else None

    @jax.jit
    def gen_fwd(params, imgs):
        dec, _, _ = trainer.gen.apply({"params": params}, imgs)
        return dec

    def validate(step):
        if val_set is None:
            return {}
        from gpemsr_tpu.utils.image import save_img
        vis_dir = os.path.join(runner.exp_dir, "val", str(step))
        # device-parallel validation: batches sharded over the mesh's data
        # axis (the reference stripes the val set across ranks and
        # dist.reduces PSNR, train_stage1.py:212-228 — here the mesh IS the
        # rank set, so a sharded batch is the same striping)
        n_data = mesh.shape["data"]
        psnrs = []
        for start in range(0, len(val_set), n_data):
            idxs = list(range(start, min(start + n_data, len(val_set))))
            imgs = np.stack([val_set[i] for i in idxs])
            pad = n_data - len(idxs)
            if pad:
                imgs = np.concatenate([imgs, imgs[-1:].repeat(pad, 0)])
            dec = np.asarray(gen_fwd(trainer.g_state.params,
                                     host_shard_batch(jnp.asarray(imgs), mesh)))
            for j, i in enumerate(idxs):
                psnrs.append(psnr_of(dec[j], imgs[j]))
                if i < 20:   # qualitative dumps (train_stage1.py:219-224)
                    os.makedirs(os.path.join(vis_dir, "fake"), exist_ok=True)
                    os.makedirs(os.path.join(vis_dir, "original"),
                                exist_ok=True)
                    save_img(tensor2img(dec[j]),
                             os.path.join(vis_dir, "fake", f"{i}.png"))
                    save_img(tensor2img(imgs[j]),
                             os.path.join(vis_dir, "original", f"{i}.png"))
        return {"psnr_avg": float(np.mean(psnrs))}

    u8 = cfg.parallel.u8_transfer

    def train_step(step, batch):
        if u8:
            batch = _dequantize_u8(host_shard_batch(_quantize_u8(batch), mesh))
        else:
            batch = host_shard_batch(batch, mesh)
        return trainer.train_step(batch)

    def pack():
        return {"g": jax.device_get(trainer.g_state.params),
                "d": jax.device_get(trainer.d_state.params),
                "g_opt": jax.device_get(trainer.g_state.opt_state),
                "d_opt": jax.device_get(trainer.d_state.opt_state),
                "step": trainer.step}

    def unpack(payload):
        trainer.g_state = replicate(trainer.g_state.replace(
            params=payload["g"], opt_state=payload["g_opt"]), mesh)
        trainer.d_state = replicate(trainer.d_state.replace(
            params=payload["d"], opt_state=payload["d_opt"]), mesh)
        trainer.step = payload["step"]

    runner = StageRunner(cfg, train_step, validate, pack, unpack, loader)
    runner.run()
    return trainer


def run_stage2(cfg: ExperimentConfig, host_id: int = 0, host_count: int = 1,
               stage1_params=None):
    from gpemsr_tpu.train.stage2 import init_stage2, make_stage2_step

    ds_cfg = cfg.datasets["train"]
    dataset = IndexerDataset(ds_cfg, cfg.scale, train=True)
    mesh, loader = make_train_loader(cfg, dataset, host_id, host_count)

    gs = ds_cfg.GT_size
    ls = gs // cfg.scale
    lr0 = jnp.zeros((ds_cfg.batch_size, ls, ls, 1), jnp.float32)
    gt0 = jnp.zeros((ds_cfg.batch_size, gs, gs, 1), jnp.float32)
    model, state, frozen = init_stage2(
        jax.random.PRNGKey(cfg.train.manual_seed), cfg.network.prior,
        cfg.train, lr0, gt0, pretrained_params=stage1_params)
    from gpemsr_tpu.utils.precision import resolve_dtype
    step_fn = make_stage2_step(
        model, compute_dtype=resolve_dtype(cfg.parallel.compute_dtype))

    val_set = IndexerDataset(cfg.datasets["val"], cfg.scale, train=False) \
        if "val" in cfg.datasets else None

    state_box = {"state": replicate(state, mesh),
                 "frozen": replicate(frozen, mesh)}

    @jax.jit
    def ref_fwd(trainable, frozen, lr_img):
        from gpemsr_tpu.train.common import merge_params
        params = merge_params(trainable, frozen)
        return model.apply({"params": params}, lr_img, method=model.output_ref)

    def validate(step):
        if val_set is None:
            return {}
        items = [val_set[i] for i in range(len(val_set))]
        tiles = [q for _, lr in items for q in quarter_tiles(lr)]
        outs = sharded_map(
            lambda b: ref_fwd(state_box["state"].params,
                              state_box["frozen"], b), tiles, mesh)
        psnrs = []
        for i, (gt, _) in enumerate(items):
            full = reassemble_quarters(outs[4 * i:4 * i + 4],
                                       gt.shape[0], gt.shape[1])
            psnrs.append(psnr_of(full, gt))
        return {"psnr_avg": float(np.mean(psnrs))}

    u8 = cfg.parallel.u8_transfer

    def train_step(step, batch):
        if u8:
            batch = _dequantize_u8(host_shard_batch(_quantize_u8(batch), mesh))
        else:
            batch = host_shard_batch(batch, mesh)
        gt, lr = batch
        state_box["state"], m = step_fn(state_box["state"], state_box["frozen"],
                                        lr, gt)
        # metrics stay device arrays: float() here would sync every step and
        # serialize host input work with device compute (runner floats them
        # only at logger_freq)
        return m

    def pack():
        s = state_box["state"]
        return {"params": jax.device_get(s.params),
                "opt": jax.device_get(s.opt_state),
                "frozen": jax.device_get(state_box["frozen"]),
                "step": int(s.step)}

    def unpack(payload):
        state_box["state"] = replicate(state_box["state"].replace(
            params=payload["params"], opt_state=payload["opt"],
            step=jnp.asarray(payload.get("step", 0), jnp.int32)), mesh)
        # restore the frozen prior too: resuming without --stage1-ckpt must
        # not silently train against a re-initialised prior (round-1 bug)
        if "frozen" in payload:
            state_box["frozen"] = replicate(payload["frozen"], mesh)

    runner = StageRunner(cfg, train_step, validate, pack, unpack, loader)
    runner.run()
    return model, state_box["state"], state_box["frozen"]


def run_stage3(cfg: ExperimentConfig, host_id: int = 0, host_count: int = 1,
               pretrained=None):
    from gpemsr_tpu.train.stage3 import init_stage3, make_stage3_step

    ds_cfg = cfg.datasets["train"]
    dataset = CREMIDataset(ds_cfg, cfg.scale, train=True)
    mesh, loader = make_train_loader(cfg, dataset, host_id, host_count)

    ls = ds_cfg.LQ_size
    lq0 = jnp.zeros((ds_cfg.batch_size, ds_cfg.N_frames, ls, ls, 1), jnp.float32)
    model, state, frozen = init_stage3(
        jax.random.PRNGKey(cfg.train.manual_seed), cfg.network, cfg.train,
        lq0, pretrained=pretrained)
    from gpemsr_tpu.utils.precision import resolve_dtype
    step_fn = make_stage3_step(
        model, cfg.train,
        compute_dtype=resolve_dtype(cfg.parallel.compute_dtype))

    val_set = CREMIDataset(cfg.datasets["val"], cfg.scale, train=False) \
        if "val" in cfg.datasets else None

    state_box = {"state": replicate(state, mesh),
                 "frozen": replicate(frozen, mesh)}

    @jax.jit
    def sr_fwd(trainable, frozen, lq):
        from gpemsr_tpu.train.common import merge_params
        model_frozen = {k: v for k, v in frozen.items() if k != "cx_vgg"}
        params = merge_params(trainable, model_frozen)
        sr, _ = model.apply({"params": params}, lq)
        return sr

    def validate(step):
        if val_set is None:
            return {}
        items = [val_set[i] for i in range(len(val_set))]
        tiles = [q for it in items for q in quarter_tiles(it["LQ"])]
        outs = sharded_map(
            lambda b: sr_fwd(state_box["state"].params,
                             state_box["frozen"], b), tiles, mesh)
        psnrs = []
        for i, it in enumerate(items):
            gt = it["GT"]
            full = reassemble_quarters(outs[4 * i:4 * i + 4],
                                       gt.shape[0], gt.shape[1])
            psnrs.append(psnr_of(full, gt))
        return {"psnr_avg": float(np.mean(psnrs))}

    u8 = cfg.parallel.u8_transfer

    def train_step(step, batch):
        if u8:
            batch = _dequantize_u8(host_shard_batch(_quantize_u8(batch), mesh))
        else:
            batch = host_shard_batch(batch, mesh)
        state_box["state"], m = step_fn(state_box["state"], state_box["frozen"],
                                        batch["LQ"], batch["GT"])
        return m                     # floated only at logger_freq (see stage 2)

    def pack():
        s = state_box["state"]
        return {"params": jax.device_get(s.params),
                "opt": jax.device_get(s.opt_state),
                "frozen": jax.device_get(state_box["frozen"]),
                "step": int(s.step)}

    def unpack(payload):
        state_box["state"] = replicate(state_box["state"].replace(
            params=payload["params"], opt_state=payload["opt"],
            step=jnp.asarray(payload.get("step", 0), jnp.int32)), mesh)
        # restore the frozen prior too: resuming without pretrained must not
        # silently train against a re-initialised prior (round-1 bug)
        if "frozen" in payload:
            state_box["frozen"] = replicate(payload["frozen"], mesh)

    runner = StageRunner(cfg, train_step, validate, pack, unpack, loader)
    runner.run()
    return model, state_box["state"], state_box["frozen"]
