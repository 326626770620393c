"""Optimizer + LR schedule.

Replicates the reference recipe (finetune.py:903-921,1060-1065):
AdamW at base lr, a linear warmup of the *multiplier* from 0.1 to 1.0 over
``lr_warmup_steps`` (formula: 0.1 + 0.9 * min((step+1)/warmup, 1)), and a
MultiStepLR x0.1 drop at ``num_steps_before_decay``.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from vla_adapter_tpu.core.config import OptimizerConfig


def lr_schedule(cfg: OptimizerConfig, warmup_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            progress = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
            warm = 0.1 + 0.9 * progress
        else:
            warm = 1.0
        decay = jnp.where(step >= cfg.num_steps_before_decay, cfg.decay_factor, 1.0)
        return cfg.learning_rate * warm * decay

    return schedule


def make_optimizer(cfg: OptimizerConfig, warmup_steps: int | None = None):
    if warmup_steps is None:
        warmup_steps = int(cfg.warmup_fraction * cfg.max_steps)
    tx = optax.adamw(
        learning_rate=lr_schedule(cfg, warmup_steps),
        b1=cfg.betas[0],
        b2=cfg.betas[1],
        eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    )
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
