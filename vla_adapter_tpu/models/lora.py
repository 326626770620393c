"""LoRA merge / strip (param-tree transforms).

The reference merges peft adapters into the base weights for deployment
(merge_lora_weights_and_save.py, finetune.py:579-601). Here LoRA lives
natively inside each Dense (models/layers.py), so merging is a pure tree
transform: kernel += scale * (A @ B), then drop the adapter leaves.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def merge_lora(params: Dict[str, Any], scale: float) -> Dict[str, Any]:
    """Fold lora_a/lora_b into kernels; returns an adapter-free tree that
    loads into a model built with lora_rank=0."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and "lora_a" in node and "lora_b" in node:
            a = np.asarray(node["lora_a"], np.float32)
            b = np.asarray(node["lora_b"], np.float32)
            k = np.asarray(node["kernel"], np.float32)
            # scanned stacks carry a leading layer axis -> batched matmul
            delta = scale * (a @ b)
            out = {kk: vv for kk, vv in node.items()
                   if kk not in ("lora_a", "lora_b")}
            out["kernel"] = (k + delta).astype(np.asarray(node["kernel"]).dtype)
            return out
        return {k: rec(v) for k, v in node.items()}

    return rec(params)


def strip_lora(params: Dict[str, Any]) -> Dict[str, Any]:
    """Drop adapter leaves without merging (reset to base)."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        return {k: rec(v) for k, v in node.items()
                if k not in ("lora_a", "lora_b")}

    return rec(params)


def add_lora_params(params: Dict[str, Any], reference: Dict[str, Any]):
    """Graft freshly-initialized adapter leaves from `reference` (an
    init with lora_rank>0) onto an adapter-free tree (checkpoint load).

    Strict: the ONLY structural difference allowed is the lora_a/lora_b
    leaves. A checkpoint key absent from the reference init, or a non-LoRA
    init leaf absent from the checkpoint, raises — silently dropping or
    random-initializing weights would 'load' a corrupted model."""

    def rec(base, ref, path=()):
        if not isinstance(ref, dict):
            return base
        base = base or {}
        extra = sorted(set(base) - set(ref))
        if extra:
            raise ValueError(
                f"checkpoint keys {extra} at {'/'.join(path)!r} do not "
                "exist in the model init — wrong config or stale checkpoint")
        out = {}
        for k, v in ref.items():
            if k in ("lora_a", "lora_b") and k not in base:
                out[k] = v
            elif isinstance(v, dict):
                out[k] = rec(base.get(k), v, path + (k,))
            else:
                if k not in base:
                    raise ValueError(
                        f"checkpoint is missing {'/'.join(path + (k,))!r}")
                out[k] = base[k]
        return out

    return rec(params, reference)
