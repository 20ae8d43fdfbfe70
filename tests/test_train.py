"""Training-step smoke tests: schedules vs torch oracle, stage-1 GAN
alternation, stage-2 CE, all on tiny configs; data-parallel sharding over the
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpemsr_tpu.core.config import DiscriminatorConfig, TrainConfig
from gpemsr_tpu.train.schedules import cosine_annealing_restart, multistep_restart
from tests.test_models import tiny_prior


def test_cosine_restart_matches_torch():
    import torch
    base_lr, eta_min = 4e-4, 1e-7
    T_period = [40, 80, 120, 120, 120]
    restarts = [40, 120, 240, 360]
    weights = [1, 0.5, 1, 0.5]
    sched = cosine_annealing_restart(base_lr, T_period, restarts, weights,
                                     eta_min)

    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
    import math

    class TorchCos(torch.optim.lr_scheduler._LRScheduler):
        def __init__(self, optimizer):
            self.T_period = T_period
            self.T_max = T_period[0]
            self.eta_min = eta_min
            self.restarts = [v + 1 for v in restarts]
            self.restart_weights = weights
            self.last_restart = 0
            super().__init__(optimizer, -1)

        def get_lr(self):
            if self.last_epoch == 0:
                return self.base_lrs
            elif self.last_epoch in self.restarts:
                self.last_restart = self.last_epoch
                self.T_max = self.T_period[self.restarts.index(self.last_epoch) + 1]
                w = self.restart_weights[self.restarts.index(self.last_epoch)]
                return [g["initial_lr"] * w for g in self.optimizer.param_groups]
            elif (self.last_epoch - self.last_restart - 1 - self.T_max) % (
                    2 * self.T_max) == 0:
                return [g["lr"] + (b - self.eta_min) *
                        (1 - math.cos(math.pi / self.T_max)) / 2
                        for b, g in zip(self.base_lrs, self.optimizer.param_groups)]
            return [(1 + math.cos(math.pi * (self.last_epoch - self.last_restart)
                                  / self.T_max)) /
                    (1 + math.cos(math.pi * ((self.last_epoch - self.last_restart)
                                             - 1) / self.T_max)) *
                    (g["lr"] - self.eta_min) + self.eta_min
                    for g in self.optimizer.param_groups]

    tsched = TorchCos(opt)
    torch_lrs = []
    for _ in range(481):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    ours = [float(sched(s)) for s in range(481)]
    # restart-weight parity matters most; allow small off-by-one phase slack
    # around restart boundaries
    mismatches = [s for s in range(481)
                  if abs(ours[s] - torch_lrs[s]) > 2e-5 * max(1, torch_lrs[s] / 1e-5)]
    # allow only boundary steps to differ
    boundary = set()
    for r in [0] + restarts:
        boundary.update(range(r, r + 2))
    assert all(s in boundary for s in mismatches), mismatches[:10]


def test_multistep_restart():
    sched = multistep_restart(1.0, milestones=[10, 20], restarts=[30],
                              restart_weights=[0.5], gamma=0.1)
    assert float(sched(5)) == pytest.approx(1.0)
    assert float(sched(15)) == pytest.approx(0.1)
    assert float(sched(25)) == pytest.approx(0.01)
    assert float(sched(35)) == pytest.approx(0.5)


@pytest.fixture(scope="module")
def stage1_setup():
    from gpemsr_tpu.train.stage1 import Stage1Trainer
    tcfg = TrainConfig(gan_start=1, net_d_reg_every=2, T_period=[10, 10],
                       restarts=[10], restart_weights=[1])
    sample = jnp.zeros((2, 96, 96, 1), jnp.float32)
    trainer = Stage1Trainer(tiny_prior(), DiscriminatorConfig(num_filters_last=8),
                            tcfg, jax.random.PRNGKey(0), sample)
    return trainer


def test_stage1_alternation(stage1_setup, rng):
    trainer = stage1_setup
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 1)).astype(np.float32))
    m1 = trainer.train_step(imgs)            # step 1: pre-GAN
    assert "rec_loss" in m1 and "d_loss_real" not in m1
    m2 = trainer.train_step(imgs)            # step 2: GAN phase + R1 (2 % 2 == 0)
    assert "g_gan_loss" in m2 and "d_loss_real" in m2 and "r1" in m2
    m3 = trainer.train_step(imgs)            # step 3: GAN, no R1
    assert "r1" not in m3 and "d_loss_fake" in m3
    assert np.isfinite(m2["rec_loss"])


def test_stage2_step_learns(rng):
    from gpemsr_tpu.train.stage2 import init_stage2, make_stage2_step
    tcfg = TrainConfig(lr_G=1e-3, T_period=[100], restarts=[], restart_weights=[])
    lr_img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
    gt_img = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 1)).astype(np.float32))
    model, state, frozen = init_stage2(jax.random.PRNGKey(0), tiny_prior(),
                                       tcfg, lr_img, gt_img)
    step = make_stage2_step(model)
    state, m0 = step(state, frozen, lr_img, gt_img)
    for _ in range(3):
        state, m = step(state, frozen, lr_img, gt_img)
    assert m["ce_loss"] < m0["ce_loss"]       # optimizes the CE objective
    # frozen params untouched by construction (not in the optimizer)
    assert set(frozen.keys()) == {"encoder", "decoder", "codebook"}


def test_stage1_data_parallel_mesh(rng):
    """Batch sharded over the 8-device mesh: the loss mean implies the psum
    gradient reduction DDP did; params stay replicated."""
    from gpemsr_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    from gpemsr_tpu.train.stage1 import create_models, init_states, make_g_step
    tcfg = TrainConfig(T_period=[10], restarts=[], restart_weights=[])
    gen, disc = create_models(tiny_prior(), DiscriminatorConfig(num_filters_last=8))
    sample = jnp.zeros((8, 96, 96, 1), jnp.float32)
    g_state, d_state = init_states(jax.random.PRNGKey(0), gen, disc, tcfg, sample)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    g_state = replicate(g_state, mesh)
    d_params = replicate(d_state.params, mesh)
    imgs = shard_batch(
        jnp.asarray(rng.uniform(0, 1, (8, 96, 96, 1)).astype(np.float32)), mesh)
    step = make_g_step(gen, disc, tcfg, use_gan=False)
    new_state, _, metrics = step(g_state, d_params, imgs)
    assert np.isfinite(float(metrics["rec_loss"]))
    # compare against single-device result
    step_local = make_g_step(gen, disc, tcfg, use_gan=False)
    local_state, _, local_metrics = step_local(
        jax.device_get(g_state), jax.device_get(d_params), jax.device_get(imgs))
    np.testing.assert_allclose(float(metrics["rec_loss"]),
                               float(local_metrics["rec_loss"]), rtol=1e-5)


def test_training_determinism(rng):
    """Same seeds -> bit-identical params after 2 stage-2 steps (SURVEY §5.2:
    explicit PRNG threading makes the race classes of the reference vanish)."""
    from gpemsr_tpu.train.stage2 import init_stage2, make_stage2_step

    tcfg = TrainConfig(lr_G=1e-3, T_period=[100], restarts=[], restart_weights=[])
    lr_img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
    gt_img = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 1)).astype(np.float32))

    results = []
    for _ in range(2):
        model, state, frozen = init_stage2(jax.random.PRNGKey(7), tiny_prior(),
                                           tcfg, lr_img, gt_img)
        step = make_stage2_step(model)
        for _ in range(2):
            state, _ = step(state, frozen, lr_img, gt_img)
        results.append(jax.device_get(state.params))
    a, b = results
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b)


def test_bf16_compute_training(rng):
    """ParallelConfig.compute_dtype="bfloat16": stage-3 step in bf16 compute
    with f32 master weights — losses track the f32 step, params/opt state stay
    f32, and the update is finite. (VERDICT #10: bf16-compute training.)"""
    from gpemsr_tpu.core.config import GPEMSRConfig
    from gpemsr_tpu.train.stage3 import init_stage3, make_stage3_step

    tcfg = TrainConfig(lr_G=1e-4, T_period=[100], restarts=[],
                       restart_weights=[], ref_loss_factor=0.01)
    net = GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                       ref_fusion_feat_RBs=1, scale=16, prior=tiny_prior(16))
    lq = jnp.asarray(rng.uniform(0, 1, (1, 5, 8, 8, 1)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 1)).astype(np.float32))
    model, state, frozen = init_stage3(jax.random.PRNGKey(0), net, tcfg, lq)

    step32 = make_stage3_step(model, tcfg)
    step16 = make_stage3_step(model, tcfg, compute_dtype=jnp.bfloat16)
    s32, m32 = step32(state, frozen, lq, gt)
    s16, m16 = step16(state, frozen, lq, gt)
    # bf16 mantissa is 8 bits: losses agree to ~1% of scale
    assert abs(float(m16["rec_loss"]) - float(m32["rec_loss"])) < 0.01
    assert abs(float(m16["ref_loss"]) - float(m32["ref_loss"])) \
        < 0.05 * abs(float(m32["ref_loss"])) + 1e-3
    # master weights stay f32 and move
    leaves16 = jax.tree_util.tree_leaves(s16.params)
    assert all(x.dtype == jnp.float32 for x in leaves16)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves16)
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(s16.params),
        jax.tree_util.tree_leaves(state.params)))
    assert diff > 0                 # the bf16 grads actually updated params


def test_bf16_compute_stage1_stage2(rng):
    """Stage-1 GAN alternation and stage-2 CE run under bf16 compute."""
    from gpemsr_tpu.train.stage1 import Stage1Trainer
    from gpemsr_tpu.train.stage2 import init_stage2, make_stage2_step

    tcfg = TrainConfig(T_period=[10], restarts=[], restart_weights=[],
                       gan_start=1, net_d_reg_every=2)
    sample = jnp.zeros((2, 96, 96, 1), jnp.float32)
    trainer = Stage1Trainer(tiny_prior(), DiscriminatorConfig(num_filters_last=8),
                            tcfg, jax.random.PRNGKey(0), sample,
                            compute_dtype=jnp.bfloat16)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 1)).astype(np.float32))
    m1 = trainer.train_step(imgs)
    m2 = trainer.train_step(imgs)            # GAN + R1 phase
    assert np.isfinite(m1["rec_loss"]) and "r1" in m2
    assert np.isfinite(m2["r1"])
    assert all(x.dtype == jnp.float32
               for x in jax.tree_util.tree_leaves(trainer.g_state.params))

    tcfg2 = TrainConfig(lr_G=1e-3, T_period=[100], restarts=[],
                        restart_weights=[])
    lr_img = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
    gt_img = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 1)).astype(np.float32))
    model, state, frozen = init_stage2(jax.random.PRNGKey(0), tiny_prior(),
                                       tcfg2, lr_img, gt_img)
    step = make_stage2_step(model, compute_dtype=jnp.bfloat16)
    state, m0 = step(state, frozen, lr_img, gt_img)
    for _ in range(3):
        state, m = step(state, frozen, lr_img, gt_img)
    assert m["ce_loss"] < m0["ce_loss"]


def test_codebook_dead_code_revival(rng):
    """codebook_revive_every: codes unused over the window are re-seeded from
    encoder outputs; used codes keep their embeddings; off by default."""
    from gpemsr_tpu.train.stage1 import Stage1Trainer

    tcfg = TrainConfig(T_period=[10], restarts=[], restart_weights=[],
                       gan_start=10 ** 9, codebook_revive_every=2)
    sample = jnp.zeros((2, 96, 96, 1), jnp.float32)
    trainer = Stage1Trainer(tiny_prior(), DiscriminatorConfig(num_filters_last=8),
                            tcfg, jax.random.PRNGKey(0), sample)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 1)).astype(np.float32))
    emb0 = np.asarray(trainer.g_state.params["codebook"]["embedding"])
    m1 = trainer.train_step(imgs)
    assert "revived_codes" not in m1            # window not complete yet
    m2 = trainer.train_step(imgs)
    assert "revived_codes" in m2 and m2["revived_codes"] > 0
    emb = np.asarray(trainer.g_state.params["codebook"]["embedding"])
    # revived rows look like encoder outputs (order-1 magnitudes), far from
    # the uniform(-1/V, 1/V) init; at least one row moved by much more than
    # two Adam steps (2 * lr_G) could explain
    moved = np.abs(emb - emb0).max(axis=1)
    assert (moved > 10 * tcfg.lr_G).sum() >= m2["revived_codes"] * 0.5
    # revival off: no usage bookkeeping, no key in metrics
    tcfg_off = TrainConfig(T_period=[10], restarts=[], restart_weights=[],
                           gan_start=10 ** 9)
    trainer_off = Stage1Trainer(tiny_prior(),
                                DiscriminatorConfig(num_filters_last=8),
                                tcfg_off, jax.random.PRNGKey(0), sample)
    for _ in range(2):
        m = trainer_off.train_step(imgs)
    assert "revived_codes" not in m and "_code_usage" not in m


def test_production_mesh_batch_clamp():
    """production_mesh(data=-1) clamps its data axis to a divisor of the
    global batch; explicit sizes are honored verbatim."""
    from gpemsr_tpu.core.config import ParallelConfig
    from gpemsr_tpu.parallel.mesh import production_mesh

    m = production_mesh(ParallelConfig(data=-1), global_batch=2)
    assert m.shape["data"] == 2                # 8 devices, batch 2 -> 2
    m = production_mesh(ParallelConfig(data=-1), global_batch=6)
    assert m.shape["data"] == 6
    m = production_mesh(ParallelConfig(data=-1), global_batch=16)
    assert m.shape["data"] == 8                # capped at device count
    m = production_mesh(ParallelConfig(data=4), global_batch=2)
    assert m.shape["data"] == 4                # explicit wins (caller errors)
