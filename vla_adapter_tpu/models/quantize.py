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

Embeddings, norms, biases, LayerScale gammas, and conv patch embeds stay
float; EVERY Dense/BatchedDense kernel (the action head's included) is
quantized — Runtime(weights_int8=True) makes each Dense declare
kernel_q/kernel_scale params, so partial quantization is not expressible
(a skipped subtree would fail at apply with missing params). Precision for
small quality-critical matmuls is protected on the ACTIVATION side
instead: act_int8_min_dim keeps them on the bf16-upcast path under w8a8.
Validate with quantization_report / forward_error_report before deploying.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(…, in, out) float -> (int8 kernel_q, float32 per-out-channel scale).

    Handles scanned stacks: scales are per (layer, out) when the kernel has
    a leading stack axis."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=-2, keepdims=True)  # over `in`
    # multiply by the f32 reciprocal rather than divide by 127: XLA
    # strength-reduces constant divisors to reciprocal multiplies, so this
    # is the only form BOTH twins (numpy here, jnp in quantize_kernel_jax)
    # compute bit-identically
    scale = (absmax * np.float32(1.0 / 127.0)).astype(np.float32)
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, np.squeeze(scale, axis=-2)


def _quantize_tree(params: Dict[str, Any], qfn) -> Dict[str, Any]:
    """Shared tree transform of quantize_params / quantize_params_jax:
    every Dense kernel node gets kernel -> (kernel_q, kernel_scale) via
    ``qfn``; everything else passes through."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        if "kernel" in node and not isinstance(node["kernel"], dict):
            kernel = node["kernel"]
            # 2D = Dense, 3D = scanned Dense stack; 4D convs (patch embed)
            # stay float (tiny, and nn.Conv expects a float kernel).
            if np.ndim(kernel) in (2, 3):
                assert "lora_a" not in node, "merge LoRA before quantizing"
                q, scale = qfn(kernel)
                out = {k: v for k, v in node.items() if k != "kernel"}
                out["kernel_q"] = q
                out["kernel_scale"] = scale
                return out
        return {k: rec(v) for k, v in node.items()}

    return rec(params)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Float param tree (lora-free) -> int8-serving tree matching
    Runtime(weights_int8=True) param shapes. Host-side (numpy) — use for
    checkpoint conversion; for live device trees prefer
    :func:`quantize_params_jax`."""
    return _quantize_tree(params, lambda k: quantize_kernel(np.asarray(k)))


def quantize_kernel_jax(kernel: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side twin of :func:`quantize_kernel` — identical f32 math
    in jnp (elementwise ops are IEEE-exact on TPU; only matmuls run at
    reduced precision, and there are none here)."""
    k = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)  # over `in`
    scale = absmax * np.float32(1.0 / 127.0)  # see quantize_kernel
    scale = jnp.where(scale == 0, jnp.float32(1.0), scale)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=-2)


def quantize_params_jax(params: Dict[str, Any]) -> Dict[str, Any]:
    """Device-side :func:`quantize_params`: same tree transform, jnp leaf
    math — jit-safe, eval_shape-safe, and sharding-transparent.

    Through the axon tunnel, ``quantize_params(jax.device_get(tree))`` on
    the flagship's frozen base moves ~3.6 GB host<->device and was the
    dominant cost of int8-base train startup (it pushed bench.py's
    train_int8 phase past its 900 s cap, r5); jitted on device the same
    transform is one elementwise pass over HBM. Exactness vs the numpy
    twin is pinned by test_quantize_params_jax_matches_numpy."""
    return _quantize_tree(params, quantize_kernel_jax)


def split_qstack(
    q_params: Dict[str, Any], qstack_shapes: Dict[str, Any]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a :func:`quantize_params` tree for stacked serving
    (``w8a8_impl="fused"``).

    With ``Runtime(w8a8_impl="fused")`` the scanned stacks declare their
    stacked MLP int8 kernels in the broadcast "qstack" collection
    (models/layers.py) rather than scan-sliced "params". ``qstack_shapes``
    is that collection's tree from ``model.init`` / ``jax.eval_shape`` —
    its paths name exactly the kernels to move. Returns ``(params,
    qstack)``: leaves at those paths are MOVED out of the quantized tree
    (shape-checked against the expectation); empty dicts left behind are
    pruned. The returned pair applies as
    ``model.apply({"params": params, "qstack": qstack}, ...)``.
    """

    def rec(shape_node, param_node, path):
        moved = {}
        for key, sub in shape_node.items():
            assert key in param_node, f"qstack path missing in params: {path + (key,)}"
            if isinstance(sub, dict):
                moved[key] = rec(sub, param_node[key], path + (key,))
                if not param_node[key]:
                    del param_node[key]
            else:
                leaf = param_node.pop(key)
                expect = tuple(sub.shape)
                got = tuple(np.shape(leaf))
                if len(got) == len(expect) - 1 and expect[0] == 1:
                    # un-scanned modules (the projector MLP) declare their
                    # fused-kernel storage with a leading L=1 stack axis;
                    # their quantized params are per-module (no stack axis)
                    leaf = (leaf[None] if isinstance(leaf, jax.Array)
                            else np.asarray(leaf)[None])
                    got = (1,) + got
                if got != expect:
                    # the declared storage may be lane-padded (models/
                    # layers._stacked_qkernel: s8 stacks whose minor dims
                    # are not (32, 128)-tile-aligned get re-laid-out by XLA
                    # on every pallas_call otherwise). Zero padding is
                    # inert: padded columns yield act(0)=0 and padded down
                    # rows contribute exact zeros.
                    assert len(got) == len(expect) and all(
                        g <= e for g, e in zip(got, expect)), (
                        f"stacked kernel {path + (key,)}: shape {got} not "
                        f"embeddable in expected {expect}")
                    pad = [(0, e - g) for g, e in zip(got, expect)]
                    if isinstance(leaf, jax.Array):
                        # pad on device — no host round-trip for weights
                        # that were already device_put
                        leaf = jnp.pad(leaf, pad)
                    else:
                        leaf = np.pad(np.asarray(leaf), pad)
                moved[key] = leaf
        return moved

    params = _copy_tree(q_params)
    qstack = rec(qstack_shapes, params, ())
    return params, qstack


def _copy_tree(node):
    """Dict-structure deep copy (leaves shared, containers fresh) so
    split_qstack can pop without mutating the caller's tree."""
    if isinstance(node, dict):
        return {k: _copy_tree(v) for k, v in node.items()}
    return node


def quantization_report(params: Dict[str, Any],
                        top_k: int = 10) -> Dict[str, Any]:
    """Quantization-error report: per-kernel max-abs and relative error of
    the int8 round-trip, so the "validate before deploying" caveat has a
    number attached. Returns
      {"per_layer": {path: {"max_abs_err", "rel_err", "shape"}},
       "worst": [(path, rel_err), ...top_k], "max_rel_err": float}
    """
    per_layer: Dict[str, Dict[str, Any]] = {}

    def rec(node, path):
        if not isinstance(node, dict):
            return
        if "kernel" in node and not isinstance(node["kernel"], dict):
            k = np.asarray(node["kernel"], np.float32)
            if k.ndim in (2, 3):
                q, scale = quantize_kernel(k)
                back = q.astype(np.float32) * scale[..., None, :]
                err = np.abs(back - k)
                denom = max(float(np.max(np.abs(k))), 1e-12)
                per_layer["/".join(path)] = {
                    "max_abs_err": float(err.max()),
                    "rel_err": float(err.max() / denom),
                    "shape": list(k.shape),
                }
                return
        for kk, v in node.items():
            rec(v, path + (kk,))

    rec(params, ())
    worst = sorted(per_layer.items(), key=lambda kv: -kv[1]["rel_err"])[:top_k]
    return {
        "per_layer": per_layer,
        "worst": [(p, d["rel_err"]) for p, d in worst],
        "max_rel_err": max((d["rel_err"] for d in per_layer.values()),
                           default=0.0),
    }


def forward_error_report(cfg, params, rt=None, batch: int = 1,
                         seed: int = 0, act_int8: bool = False) -> Dict[str, float]:
    """End-to-end int8-vs-float action diff on a fixed random forward —
    the number to check before serving int8 (README "validate before
    deploying"). ``act_int8=True`` reports the W8A8 path (dynamic per-token
    activation quantization) instead of weight-only. Returns max/mean abs
    diff over the (B, chunk, dim) chunk in *normalized* action units (the
    [-1, 1] training space)."""
    import jax
    import jax.numpy as jnp

    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    rt = rt or Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    import dataclasses as _dc

    rng = np.random.default_rng(seed)
    v = cfg.vision
    kwargs = dict(
        input_ids=jnp.asarray(
            rng.integers(3, min(cfg.llm.vocab_size, 10_000),
                         size=(batch, cfg.max_text_tokens)), jnp.int32),
        prompt_len=jnp.full((batch,), 8, jnp.int32),
        text_valid=jnp.ones((batch, cfg.max_text_tokens), jnp.int32),
        pixel_values=jnp.asarray(
            rng.normal(size=(batch, v.num_images, v.primary.image_size,
                             v.primary.image_size, v.channels_per_image)),
            rt.dtype),
        proprio=jnp.asarray(
            rng.normal(size=(batch, cfg.constants.proprio_dim)), jnp.float32),
    )
    float_model = VLAModel(cfg, rt)
    a_float = np.asarray(
        float_model.apply({"params": params}, **kwargs)["actions"], np.float32)

    q_model = VLAModel(cfg, _dc.replace(rt, weights_int8=True,
                                        act_int8=act_int8))
    q_params = quantize_params(jax.device_get(params))
    a_int8 = np.asarray(
        q_model.apply({"params": q_params}, **kwargs)["actions"], np.float32)

    diff = np.abs(a_float - a_int8)
    return {"max_abs_action_diff": float(diff.max()),
            "mean_abs_action_diff": float(diff.mean())}


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
