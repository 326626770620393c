"""Optimizer + LR schedule.

Replicates the reference recipe (finetune.py:903-921,1060-1065):
AdamW at base lr, a linear warmup of the *multiplier* from 0.1 to 1.0 over
``lr_warmup_steps`` (formula: 0.1 + 0.9 * min((step+1)/warmup, 1)), and a
MultiStepLR x0.1 drop at ``num_steps_before_decay``.
"""

from __future__ import annotations

import jax
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


def scale_by_adam_stored(b1: float, b2: float, eps: float, moment_dtype):
    """``optax.scale_by_adam`` twin with the moments STORED in
    ``moment_dtype``; all update math stays f32.

    Motivation (BREAKDOWN.md round-5 train trace): the trainable action
    head is 24 stacked 896x896 blocks, so the AdamW (param, mu, nu)
    triple is ~77 MB each and the update fusions are pure HBM traffic
    (~6 ms/step at bs8). Storing mu/nu in bf16 halves two of the three
    trees. Numerics: each step upcasts the stored moments to f32,
    applies the exact optax recurrences, and rounds the new moments
    back — one bf16 rounding per moment per step. With b1=0.9 the mu
    increment is ~10%/step, far above bf16's ~0.4% ulp; with b2=0.999
    the nu increment can round away near steady state (nu freezes at
    its running level instead of tracking ~0.1%/step drifts) — a
    conservative bias (stale denominator), gated end-to-end by
    tests/test_train_step.py::test_bf16_moments_loss_curve_matches_f32.

    With ``moment_dtype=float32`` this reproduces optax.scale_by_adam
    bitwise (pinned by test_optim parity) — the knob isolates storage.
    """
    moment_dtype = jnp.dtype(moment_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)

        def direction(m, v):
            m_hat = m / (1.0 - jnp.power(b1, c))
            v_hat = v / (1.0 - jnp.power(b2, c))
            return m_hat / (jnp.sqrt(v_hat) + eps)

        mu_f32 = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32), updates, state.mu)
        nu_f32 = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates, state.nu)
        out = jax.tree.map(direction, mu_f32, nu_f32)
        cast = lambda t: t.astype(moment_dtype)  # noqa: E731
        return out, optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(cast, mu_f32),
            nu=jax.tree.map(cast, nu_f32),
        )

    return optax.GradientTransformation(init, update)


def mask_updates(tx: optax.GradientTransformation, mask_tree):
    """Wrap tx so masked-out slices receive exactly zero updates.

    mask_tree matches the param tree with per-leaf multiplicative masks
    (broadcastable — e.g. (L, 1, ..., 1) over a scanned layer stack; see
    train/stages.stage_update_mask). Grads are masked BEFORE tx (clean Adam
    moments) and updates AFTER tx (kills weight decay on frozen slices)."""
    if mask_tree is None:
        return tx

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
    if cfg.moments_dtype is None:
        tx = optax.adamw(
            learning_rate=lr_schedule(cfg, warmup_steps),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    else:
        # Same chain as optax.adamw, with the moment storage dtype knob
        # (see scale_by_adam_stored). f32 here is bit-identical to the
        # optax branch (test_optim parity).
        tx = optax.chain(
            scale_by_adam_stored(cfg.betas[0], cfg.betas[1], cfg.eps,
                                 cfg.moments_dtype),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(lr_schedule(cfg, warmup_steps)),
        )
    if cfg.grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx
