"""Shared training machinery: train states, optimizers, param partitioning."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gpemsr_tpu.core.config import TrainConfig
from gpemsr_tpu.train.schedules import cosine_annealing_restart, multistep_restart


def make_optimizer(tcfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    """Adam(beta1, beta2) with the configured restart schedule
    (reference train_stage1.py:158-182)."""
    if tcfg.lr_scheme == "CosineAnnealingLR_Restart":
        sched = cosine_annealing_restart(lr, tcfg.T_period, tcfg.restarts,
                                         tcfg.restart_weights, tcfg.eta_min)
    elif tcfg.lr_scheme == "MultiStepLR_Restart":
        sched = multistep_restart(lr, tcfg.lr_steps, tcfg.restarts,
                                  tcfg.restart_weights, tcfg.lr_gamma)
    else:
        raise ValueError(f"unknown lr_scheme {tcfg.lr_scheme}")
    tx = optax.adam(sched, b1=tcfg.beta1, b2=tcfg.beta2)
    wd = tcfg.weight_decay_G
    if wd:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


class TrainState(struct.PyTreeNode):
    """Minimal functional train state; frozen params ride separately so the
    optimizer never sees them (the reference's requires_grad partition,
    train_stage3.py:156-161, expressed structurally)."""
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state)


def split_params(params: dict, frozen_keys: tuple[str, ...]):
    """Partition a params dict into (trainable, frozen) by top-level key."""
    trainable = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    out = dict(trainable)
    out.update(frozen)
    return out
