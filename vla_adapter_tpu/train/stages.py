"""Training-stage freeze policies.

The reference's PrismaticVLM.freeze_backbones(stage)
(vlms/prismatic.py:129-241) gates requires_grad per backbone per stage;
here each stage is a path predicate plugged into train/partition.split_tree
(gradients are then never computed for frozen subtrees at all).

Stages (reference names):
  align               projector only
  finetune            projector + LLM
  full-finetune       everything
  last-layer-finetune embeddings + LAST decoder layer (+ tied lm head) only
                      (reference qwen25.py:84-86 last_layer_finetune_modules)
  vla-train           projector + LLM (vision frozen) + action modules
  vla-full-train      everything + action modules
  vla-sandwich-train  vision + projector + last LLM layer + action modules
  lora                lora params + action modules (the finetune.py recipe)

Scanned-stack subtlety: decoder layers live in ONE stacked (L, ...) subtree,
so "last layer only" cannot be expressed as a path split. The two stages
that need it put the whole stack in the trainable tree and additionally
return a per-leaf *update mask* (:func:`stage_update_mask`) that zeroes
every layer slice except L-1; train/optim.mask_updates applies it around
the optimizer so non-last layers receive exactly zero updates (and zero
Adam moments / weight decay).
"""

from __future__ import annotations

from typing import Callable, Tuple

Path = Tuple[str, ...]

# Stages whose LLM trainability is "embeddings + last decoder layer" only.
_LAST_LAYER_STAGES = ("last-layer-finetune", "vla-sandwich-train")

_ACTION_MODULES = ("action_head", "proprio_projector", "action_queries")


def _is_action(path: Path) -> bool:
    return path[0] in _ACTION_MODULES


def _is_projector(path: Path) -> bool:
    return path[0] == "projector"


def _is_vision(path: Path) -> bool:
    return path[0] == "vision_backbone"


def _is_llm(path: Path) -> bool:
    return path[0] == "language_model"


def _is_llm_embed_or_layers(path: Path) -> bool:
    # the reference's last_layer_finetune_modules = (embed_tokens,
    # layers[-1], lm_head) with lm_head tied to embed (qwen25.py:84-86).
    # The stacked layers subtree goes in whole; stage_update_mask then
    # restricts updates to the L-1 slice.
    return path[:2] in (("language_model", "embed"),
                        ("language_model", "layers"))


def stage_predicate(stage: str) -> Callable[[Path], bool]:
    if stage == "align":
        return _is_projector
    if stage == "finetune":
        return lambda p: _is_projector(p) or _is_llm(p)
    if stage == "full-finetune":
        return lambda p: True
    if stage == "last-layer-finetune":
        return _is_llm_embed_or_layers
    if stage == "vla-train":
        return lambda p: _is_projector(p) or _is_llm(p) or _is_action(p)
    if stage == "vla-full-train":
        return lambda p: True
    if stage == "vla-sandwich-train":
        return lambda p: (_is_vision(p) or _is_projector(p)
                          or _is_llm_embed_or_layers(p) or _is_action(p))
    if stage == "lora":
        return lambda p: (_is_action(p) or p[-1] in ("lora_a", "lora_b"))
    raise ValueError(f"unknown training stage {stage!r}")


def split_by_stage(params, stage: str):
    from vla_adapter_tpu.train.partition import split_tree

    return split_tree(params, stage_predicate(stage))


def stage_update_mask(trainable, stage: str):
    """Per-leaf multiplicative update mask for the stage, or None.

    For the last-layer stages: leaves under language_model/layers (stacked
    (L, ...) arrays) get a (L, 1, ..., 1) mask that is 1 only at the last
    layer; every other leaf gets a scalar 1. Apply with
    train/optim.mask_updates."""
    if stage not in _LAST_LAYER_STAGES:
        return None
    import jax
    import numpy as np

    def one(path, leaf):
        keys = tuple(
            k.key for k in path if hasattr(k, "key")
        )
        if keys[:2] == ("language_model", "layers"):
            n = np.shape(leaf)[0]
            m = np.zeros((n,) + (1,) * (np.ndim(leaf) - 1), np.float32)
            m[n - 1] = 1.0
            return m
        return np.ones((), np.float32)

    return jax.tree_util.tree_map_with_path(one, trainable)
