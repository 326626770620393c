"""The pjit train step.

One compiled function covering the reference hot loop (finetune.py:1019-1082
+ run_forward_pass :288-447): forward (vision + LLM + head), L1 loss,
backward over the *trainable* subtree only, grad accumulation, optimizer
update. Sharding comes entirely from the in/out shardings of the arguments
(parallel/sharding.py) — XLA inserts the psum/reduce-scatter collectives the
reference gets from DDP/FSDP hooks.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vla_adapter_tpu.core.config import TrainConfig
from vla_adapter_tpu.models.vla import VLAModel
from vla_adapter_tpu.train.partition import merge_trees


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    trainable: Dict[str, Any]
    frozen: Dict[str, Any]
    opt_state: Any


def token_prediction_loss(logits, labels, valid, action_tokenizer_len,
                          action_dim):
    """Discrete-token CE objective + metrics (reference run_forward_pass
    non-L1 branch, finetune.py:356-394, and train_utils.py masks/metrics).

    logits: (B, T, V) in original text coordinates; labels: (B, T) with
    IGNORE_INDEX outside the action region. HF-style shift: logits at t
    predict labels at t+1.
    """
    from vla_adapter_tpu.core.constants import ACTION_TOKEN_BEGIN_IDX, IGNORE_INDEX

    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX) & valid[:, 1:].astype(bool)
    safe_targets = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    loss = jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)

    preds = jnp.argmax(logits, axis=-1)
    # current vs next action masks (reference train_utils.py:8-41): cumsum
    # over non-IGNORE labels; first `action_dim` action tokens vs the rest.
    non_ignore = (targets != IGNORE_INDEX).astype(jnp.int32)
    csum = jnp.cumsum(non_ignore, axis=1)
    is_action = targets > ACTION_TOKEN_BEGIN_IDX
    curr_mask = (csum >= 1) & (csum <= action_dim) & is_action
    next_mask = (csum > action_dim) & is_action

    def acc(m):
        return jnp.sum((preds == targets) & m) / jnp.maximum(jnp.sum(m), 1)

    # detokenized L1 (bin centers; reference compute_actions_l1_loss) —
    # shared inverse with the decode path (data/action_tokenizer.py)
    from vla_adapter_tpu.data.action_tokenizer import detokenize_bin_ids_jnp

    def detok(ids):
        return detokenize_bin_ids_jnp(ids, action_tokenizer_len)

    def l1(m):
        d = jnp.abs(detok(preds) - detok(targets))
        return jnp.sum(d * m) / jnp.maximum(jnp.sum(m), 1)

    metrics = {
        "loss": loss,
        "curr_action_accuracy": acc(curr_mask),
        "next_actions_accuracy": acc(next_mask),
        "curr_action_l1_loss": l1(curr_mask),
        "next_actions_l1_loss": l1(next_mask),
        # Per-SAMPLE metrics for per-dataset mixture attribution (reference
        # VLAMetrics.commit_for_dataset, prismatic/training/metrics.py:
        # 208-348): the host groups these rows by the batch's dataset_name
        # (train/loop.py) — the device never sees strings.
        "per_sample": {
            "loss": jnp.sum(nll * mask, axis=1)
            / jnp.maximum(jnp.sum(mask, axis=1), 1),
            "curr_action_accuracy": (
                jnp.sum((preds == targets) & curr_mask, axis=1)
                / jnp.maximum(jnp.sum(curr_mask, axis=1), 1)),
        },
    }
    return loss, metrics


def l1_action_loss(pred: jnp.ndarray, gt: jnp.ndarray):
    """L1 over the chunk + the reference's logging split (current vs next
    actions — finetune.py:427-444)."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    err = jnp.abs(pred - gt)
    loss = err.mean()
    metrics = {
        "loss": loss,
        "curr_action_l1_loss": err[:, 0].mean(),
        "next_actions_l1_loss": err[:, 1:].mean(),
        # per-sample rows for host-side per-dataset mixture attribution
        # (reference per-dataset L1 trackers, training/metrics.py:208-348)
        "per_sample": {
            "loss": err.mean(axis=(1, 2)),
            "curr_action_l1_loss": err[:, 0].mean(axis=-1),
        },
    }
    return loss, metrics


def make_loss_fn(model: VLAModel, objective: str = "l1",
                 action_tokenizer_len: int = 151921, train: bool = True):
    """objective: 'l1' (continuous regression, the VLA-Adapter recipe) or
    'token' (discrete next-token CE, the legacy OpenVLA objective).
    train=False for validation: no head-latent noise injection (the
    reference's model.eval() path — noisy val metrics would be biased
    high and nondeterministic)."""

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_trees(trainable, frozen)
        out = model.apply(
            {"params": params},
            input_ids=batch["input_ids"],
            prompt_len=batch["prompt_len"],
            text_valid=batch["text_valid"],
            pixel_values=batch["pixel_values"],
            proprio=batch.get("proprio"),
            train=train,
            compute_logits=(objective == "token"),
            # token objective: the head/hidden-state outputs would be
            # discarded — skip computing them (models/vla.py)
            compute_actions=(objective != "token"),
            rngs={"noise": rng} if train else {},
        )
        if objective == "token":
            return token_prediction_loss(
                out["logits"], batch["labels"], batch["text_valid"],
                action_tokenizer_len, model.cfg.constants.action_dim,
            )
        return l1_action_loss(out["actions"], batch["actions"])

    return loss_fn


def make_train_step(model: VLAModel, tx: optax.GradientTransformation,
                    cfg: TrainConfig):
    """Returns step(state, batch, rng) -> (state, metrics).

    With grad accumulation > 1 the batch carries a leading microbatch axis
    (A, B/A, ...) and a lax.scan accumulates grads before one update —
    equivalent to the reference's loss/accum backward per microbatch
    (finetune.py:1039,1078-1082).
    """
    loss_fn = make_loss_fn(model, objective=getattr(cfg, "objective", "l1"))
    accum = cfg.grad_accumulation_steps
    accum_dtype = (jnp.dtype(cfg.accum_dtype)
                   if getattr(cfg, "accum_dtype", None) else None)

    def single_grads(trainable, frozen, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, rng
        )
        # per-sample rows attribute to distinct examples — they must be
        # stacked across microbatches (scan ys), never summed like the
        # batch-mean scalars.
        per_sample = metrics.pop("per_sample", {})
        return grads, metrics, per_sample

    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, Any]]:
        if accum > 1:
            def scan_body(carry, micro):
                g_acc, m_acc, i = carry
                g, m, ps = single_grads(
                    state.trainable, state.frozen, micro,
                    jax.random.fold_in(rng, i),
                )
                if accum_dtype is None:
                    g_acc = jax.tree.map(jnp.add, g_acc, g)
                else:
                    # carry-dtype storage: cast the fresh microbatch grad
                    # onto the (bf16) accumulator — halves the carry's HBM
                    # read+write per microbatch
                    g_acc = jax.tree.map(
                        lambda a, x: a + x.astype(a.dtype), g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc, i + 1), ps

            g_shape, m_shape, _ = jax.eval_shape(
                single_grads, state.trainable, state.frozen,
                jax.tree.map(lambda x: x[0], batch), rng,
            )
            zeros_g = jax.tree.map(
                lambda s: jnp.zeros(s.shape, accum_dtype or s.dtype), g_shape)
            zeros_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
            (grads, metrics, _), per_sample = jax.lax.scan(
                scan_body, (zeros_g, zeros_m, 0), batch
            )
            if accum_dtype is None:
                grads = jax.tree.map(lambda g: g / accum, grads)
            else:
                # back to the true grad dtype (f32) for the optimizer math
                grads = jax.tree.map(
                    lambda g, s: g.astype(s.dtype) / accum, grads, g_shape)
            metrics = jax.tree.map(lambda m: m / accum, metrics)
            # per_sample keeps the batch's (accum, micro) layout — the
            # example axis stays LAST so multi-host consumers can slice
            # their local rows off it (train/loop.py)
        else:
            grads, metrics, per_sample = single_grads(
                state.trainable, state.frozen, batch, rng)
        metrics["per_sample"] = per_sample

        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(step=state.step + 1, trainable=trainable,
                          opt_state=opt_state),
            metrics,
        )

    return step


def make_eval_step(model: VLAModel, objective: str = "l1"):
    """Validation forward (reference run_validation, finetune.py:605-686):
    the TRAINED objective's metrics, with train-time noise off."""
    loss_fn = make_loss_fn(model, objective=objective, train=False)

    def step(state: TrainState, batch, rng):
        _, metrics = loss_fn(state.trainable, state.frozen, batch, rng)
        # validation averages scalars over val batches — per-sample rows
        # are a train-mixture attribution concern only
        metrics.pop("per_sample", None)
        return metrics

    return step


def init_train_state(
    model: VLAModel,
    tx: optax.GradientTransformation,
    example_batch,
    rng,
    lora_enabled: bool,
) -> TrainState:
    from vla_adapter_tpu.train.partition import split_trainable

    params = model.init(
        {"params": rng, "noise": jax.random.fold_in(rng, 1)},
        input_ids=example_batch["input_ids"],
        prompt_len=example_batch["prompt_len"],
        text_valid=example_batch["text_valid"],
        pixel_values=example_batch["pixel_values"],
        proprio=example_batch.get("proprio"),
        train=True,
    )["params"]
    trainable, frozen = split_trainable(params, lora_enabled)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=tx.init(trainable),
    )
