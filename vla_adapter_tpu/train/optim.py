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


def mask_updates(tx: optax.GradientTransformation, mask_tree):
    """Wrap tx so masked-out slices receive exactly zero updates.

    mask_tree matches the param tree with per-leaf multiplicative masks
    (broadcastable — e.g. (L, 1, ..., 1) over a scanned layer stack; see
    train/stages.stage_update_mask). Grads are masked BEFORE tx (clean Adam
    moments) and updates AFTER tx (kills weight decay on frozen slices)."""
    if mask_tree is None:
        return tx

    import jax

    def mul(tree):
        return jax.tree.map(lambda g, m: g * m.astype(g.dtype), tree, mask_tree)

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        updates, state = tx.update(mul(grads), state, params)
        return mul(updates), state

    return optax.GradientTransformation(init, update)


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
