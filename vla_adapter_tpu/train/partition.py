"""Parameter-tree partitioning: trainable vs frozen.

The reference recipe trains (finetune.py:832-844,903-908): LoRA adapters on
every linear in the VLM, the `action_queries` embedding, the action head,
and the proprio projector; the base VLM stays frozen. We split the param
tree into two disjoint subtrees so ``jax.grad`` runs only over the
trainable one — XLA then never materializes gradients (or optimizer state)
for the frozen 1.4B base, which is the memory/FLOP win LoRA exists for.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple


def is_trainable_path(path: Tuple[str, ...], lora_enabled: bool) -> bool:
    """Reference-equivalent trainability rule."""
    if not lora_enabled:
        return True  # full finetune
    if path[0] in ("action_head", "proprio_projector"):
        return True
    if path[-1] in ("lora_a", "lora_b"):
        return True
    if path[0] == "action_queries":
        return True
    return False


def split_tree(
    tree: Dict[str, Any], pred: Callable[[Tuple[str, ...]], bool]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a nested dict into (matching, rest); empty subtrees pruned."""

    def rec(node, path):
        if not isinstance(node, dict):
            return (node, None) if pred(path) else (None, node)
        a, b = {}, {}
        for k, v in node.items():
            va, vb = rec(v, path + (k,))
            if va is not None:
                a[k] = va
            if vb is not None:
                b[k] = vb
        return (a or None), (b or None)

    a, b = rec(tree, ())
    return a or {}, b or {}


def merge_trees(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of split_tree for disjoint trees."""
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_trees(out[k], v)
        elif k in out:
            raise ValueError(f"overlapping leaf at {k!r}")
        else:
            out[k] = v
    return out


def split_trainable(params: Dict[str, Any], lora_enabled: bool):
    """(trainable, frozen) per the reference recipe."""
    return split_tree(params, lambda p: is_trainable_path(p, lora_enabled))
