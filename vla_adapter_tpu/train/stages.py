"""Training-stage freeze policies.

The reference's PrismaticVLM.freeze_backbones(stage)
(vlms/prismatic.py:129-241) gates requires_grad per backbone per stage;
here each stage is a path predicate plugged into train/partition.split_tree
(gradients are then never computed for frozen subtrees at all).

Stages (reference names):
  align               projector only
  finetune            projector + LLM
  full-finetune       everything
  last-layer-finetune projector + final LLM layer + embeddings
  vla-train           projector + LLM (vision frozen) + action modules
  vla-full-train      everything + action modules
  vla-sandwich-train  vision + projector + last LLM layer + action modules
  lora                lora params + action modules (the finetune.py recipe)
"""

from __future__ import annotations

from typing import Callable, Tuple

Path = Tuple[str, ...]

_ACTION_MODULES = ("action_head", "proprio_projector", "action_queries")


def _is_action(path: Path) -> bool:
    return path[0] in _ACTION_MODULES


def _is_projector(path: Path) -> bool:
    return path[0] == "projector"


def _is_vision(path: Path) -> bool:
    return path[0] == "vision_backbone"


def _is_llm(path: Path) -> bool:
    return path[0] == "language_model"


def _is_llm_last_layer_or_embed(path: Path) -> bool:
    # scanned layers share one stacked subtree; "last layer only" is not
    # expressible as a path split — train embeddings + final norm instead
    # and document the deviation (the stacked-scan tradeoff).
    return path[:2] == ("language_model", "embed") or path[:2] == (
        "language_model", "norm",
    )


def stage_predicate(stage: str) -> Callable[[Path], bool]:
    if stage == "align":
        return _is_projector
    if stage == "finetune":
        return lambda p: _is_projector(p) or _is_llm(p)
    if stage == "full-finetune":
        return lambda p: True
    if stage == "last-layer-finetune":
        return lambda p: _is_projector(p) or _is_llm_last_layer_or_embed(p)
    if stage == "vla-train":
        return lambda p: _is_projector(p) or _is_llm(p) or _is_action(p)
    if stage == "vla-full-train":
        return lambda p: True
    if stage == "vla-sandwich-train":
        return lambda p: (_is_vision(p) or _is_projector(p)
                          or _is_llm_last_layer_or_embed(p) or _is_action(p))
    if stage == "lora":
        return lambda p: (_is_action(p) or p[-1] in ("lora_a", "lora_b"))
    raise ValueError(f"unknown training stage {stage!r}")


def split_by_stage(params, stage: str):
    from vla_adapter_tpu.train.partition import split_tree

    return split_tree(params, stage_predicate(stage))
