"""Optimizer wiring: AdamW + per-epoch exponential LR decay (optax).

Matches the reference's torch.optim.AdamW (betas 0.9/0.999, eps 1e-8, decoupled
weight decay scaled by lr) + ExponentialLR(gamma) stepped once per epoch
(`model/gnn_model.py:28-29,47`). The decayed LR is injected per step from an
explicit epoch counter carried in the train state, so the number of steps per
epoch is irrelevant (exactly the torch scheduler semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "make_train_state", "apply_updates"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: jax.Array  # int32 scalar; epoch index for the exponential decay
    base_lr: jax.Array  # f32 scalar
    lr_decay: jax.Array  # f32 scalar

    @property
    def current_lr(self) -> jax.Array:
        return self.base_lr * self.lr_decay ** self.epoch.astype(jnp.float32)

    def next_epoch(self) -> "TrainState":
        return dataclasses.replace(self, epoch=self.epoch + 1)


def make_train_state(params, lr: float, lr_decay: float, w_decay: float):
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=w_decay
    )
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        epoch=jnp.zeros((), jnp.int32),
        base_lr=jnp.asarray(lr, jnp.float32),
        lr_decay=jnp.asarray(lr_decay, jnp.float32),
    )
    return state, tx


def apply_updates(tx, state: TrainState, grads) -> TrainState:
    """One optimizer step with the epoch-decayed learning rate injected."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = state.current_lr
    updates, new_opt = tx.update(grads, opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return dataclasses.replace(state, params=new_params, opt_state=new_opt)
