"""End-to-end mini training run through the stage-3 runner (synthetic data)."""

import os

import numpy as np
import pytest
from PIL import Image

from gpemsr_tpu.core.config import (
    DatasetConfig, ExperimentConfig, GPEMSRConfig, TrainConfig,
)
from tests.test_models import tiny_prior


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


@pytest.mark.slow
def test_stage3_runner_end_to_end(tmp_path, rng):
    from gpemsr_tpu.train.runner import run_stage3

    for z in range(10):
        _write_png(str(tmp_path / "HR" / "volA" / f"{z}.png"),
                   rng.integers(0, 255, (128, 128)))
        _write_png(str(tmp_path / "LR" / "volA" / f"{z}.png"),
                   rng.integers(0, 255, (8, 8)))

    ds = DatasetConfig(dataroot_GT=str(tmp_path / "HR"),
                       dataroot_LQ=str(tmp_path / "LR"),
                       N_frames=5, GT_size=128, LQ_size=8, batch_size=2,
                       n_workers=1)
    cfg = ExperimentConfig(
        name="mini3", stage=3, scale=16, root=str(tmp_path / "runs"),
        save_checkpoint_freq=2,
        datasets={"train": ds},
        network=GPEMSRConfig(nf=16, groups=4, front_RBs=1, back_RBs=1,
                             ref_fusion_feat_RBs=1, scale=16,
                             prior=tiny_prior(16)),
        train=TrainConfig(niter=2, T_period=[10], restarts=[],
                          restart_weights=[], val_freq=1000, logger_freq=1,
                          ref_loss_factor=0.01),
    )
    model, state, frozen = run_stage3(cfg)
    assert int(state.step) == 2
    # checkpoint written and restorable
    from gpemsr_tpu.core import checkpoint as ckpt
    cdir = str(tmp_path / "runs" / "mini3" / "checkpoints")
    assert ckpt.latest_step(cdir) == 2
    payload = ckpt.restore(cdir)
    assert "params" in payload and "frozen" in payload
    # metrics written
    assert os.path.exists(str(tmp_path / "runs" / "mini3" / "metrics.jsonl"))
