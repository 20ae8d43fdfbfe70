"""Learning-rate schedules (reference model/lr_scheduler.py) as pure
step->lr functions usable inside jit/optax.

CosineAnnealingLR_Restart: per-period cosine from base_lr*restart_weight down
to eta_min, restarting at the given steps (train_stage1.yml:73-77).
MultiStepLR_Restart: milestone gamma decay with warm restarts."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def cosine_annealing_restart(base_lr: float, t_period: Sequence[int],
                             restarts: Sequence[int] = (),
                             restart_weights: Sequence[float] = (),
                             eta_min: float = 1e-7):
    """Returns a schedule fn step -> lr."""
    # the torch scheduler shifts restarts by one (lr_scheduler.py:42
    # `self.restarts = [v + 1 for v in self.restarts]`): the restarted lr
    # (base*weight, new period) is first SEEN at optimizer step r+1, and
    # step r still belongs to the previous cosine segment
    # (test_reference_direct.py pins the full 481-step sequence)
    restarts = list(restarts)
    weights = [1.0] + list(restart_weights)
    starts = np.asarray([0] + [r + 1 for r in restarts], np.int32)
    periods = np.asarray(list(t_period), np.float32)
    weights = np.asarray(weights[:len(starts)], np.float32)
    assert len(periods) >= len(starts)

    starts_j = jnp.asarray(starts)
    periods_j = jnp.asarray(periods[:len(starts)])
    weights_j = jnp.asarray(weights)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        i = jnp.clip(jnp.searchsorted(starts_j, step, side="right") - 1,
                     0, len(starts) - 1)
        last = starts_j[i].astype(jnp.float32)
        T = periods_j[i]
        w = weights_j[i]
        frac = jnp.clip((step - last) / T, 0.0, 1.0)
        return eta_min + (base_lr * w - eta_min) * \
            (1.0 + jnp.cos(jnp.pi * frac)) / 2.0

    return schedule


def multistep_restart(base_lr: float, milestones: Sequence[int],
                      restarts: Sequence[int] = (),
                      restart_weights: Sequence[float] = (),
                      gamma: float = 0.1):
    # same +1 restart shift as the cosine variant (lr_scheduler.py:15)
    milestones = np.asarray(sorted(milestones), np.int32)
    restarts = np.asarray([0] + [r + 1 for r in restarts], np.int32)
    weights = np.asarray([1.0] + list(restart_weights), np.float32)

    ms_j = jnp.asarray(milestones)
    rs_j = jnp.asarray(restarts)
    w_j = jnp.asarray(weights[:len(restarts)])

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        i = jnp.clip(jnp.searchsorted(rs_j, step, side="right") - 1,
                     0, len(restarts) - 1)
        last = rs_j[i]
        w = w_j[i]
        # milestones since the last restart
        n = jnp.sum((ms_j > last) & (ms_j <= step))
        return base_lr * w * gamma ** n.astype(jnp.float32)

    return schedule
