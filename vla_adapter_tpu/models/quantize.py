"""Weight-only int8 quantization for serving.

Symmetric per-output-channel quantization of every Dense kernel:
``kernel ≈ kernel_q(int8) * kernel_scale[out]``. Batch-1 VLA inference is
HBM-bandwidth-bound (2.8 GB of bf16 weights per forward), so streaming
int8 halves the latency floor; the matmul itself still runs in bf16 on the
MXU (weights upcast in-register).

Usage:
    q_params = quantize_params(fp_params)            # after LoRA merge
    model = VLAModel(cfg, Runtime(weights_int8=True, ...))
    model.apply({"params": q_params}, ...)

Embeddings, norms, biases, LayerScale gammas, and the action head's tiny
params stay in float (a few hundred MB; quality-critical and cheap).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import numpy as np

# Subtrees excluded from quantization (quality-sensitive or not Dense).
DEFAULT_SKIP_PREFIXES: Tuple[str, ...] = ()


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(…, in, out) float -> (int8 kernel_q, float32 per-out-channel scale).

    Handles scanned stacks: scales are per (layer, out) when the kernel has
    a leading stack axis."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=-2, keepdims=True)  # over `in`
    scale = (absmax / 127.0).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=-2)


def quantize_params(
    params: Dict[str, Any],
    skip_prefixes: Sequence[str] = DEFAULT_SKIP_PREFIXES,
) -> Dict[str, Any]:
    """Float param tree (lora-free) -> int8-serving tree matching
    Runtime(weights_int8=True) param shapes."""

    def rec(node, path):
        if not isinstance(node, dict):
            return node
        joined = "/".join(path)
        if any(joined.startswith(p) for p in skip_prefixes):
            return node
        if "kernel" in node and not isinstance(node["kernel"], dict):
            kernel = np.asarray(node["kernel"])
            # 2D = Dense, 3D = scanned Dense stack; 4D convs (patch embed)
            # stay float (tiny, and nn.Conv expects a float kernel).
            if kernel.ndim in (2, 3):
                assert "lora_a" not in node, "merge LoRA before quantizing"
                q, scale = quantize_kernel(kernel)
                out = {k: v for k, v in node.items() if k != "kernel"}
                out["kernel_q"] = q
                out["kernel_scale"] = scale
                return out
        return {k: rec(v, path + (k,)) for k, v in node.items()}

    return rec(params, ())


def dequantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse (lossy) — reconstruct float kernels."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        if "kernel_q" in node:
            out = {k: v for k, v in node.items()
                   if k not in ("kernel_q", "kernel_scale")}
            out["kernel"] = (
                np.asarray(node["kernel_q"], np.float32)
                * np.asarray(node["kernel_scale"], np.float32)[..., None, :]
            )
            return out
        return {k: rec(v) for k, v in node.items()}

    return rec(params)
