"""Shared building blocks: dtype policy, LoRA-capable Dense, RMSNorm.

LoRA design: instead of wrapping modules post-hoc (the reference injects
peft adapters into every torch Linear — finetune.py:832-844), every Dense in
this framework *natively* supports an optional low-rank delta. When
``rt.lora_rank > 0`` each Dense owns extra ``lora_a``/``lora_b`` params
(A ~ N(0, 1/r), B = 0, matching peft's "gaussian" init) and computes
``y = x @ W + b + scale * (x @ A) @ B``. Freezing the base and training only
lora/head params is then a pure optimizer-partition concern (train/optim.py),
and merging is a pure param-tree transform (models/lora.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

Dtype = Any


@dataclass(frozen=True)
class Runtime:
    """Runtime knobs orthogonal to model geometry.

    dtype: activation/compute dtype (bf16 on TPU — MXU native).
    param_dtype: parameter storage dtype (fp32 master copies by default).
    attn_impl: 'auto' | 'pallas' | 'xla'.
    lora_rank/lora_scale: 0 disables LoRA params entirely.
    """

    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    lora_rank: int = 0
    lora_scale: float = 1.0
    remat: bool = False
    # Remat policy when remat=True: "nothing" recomputes everything in the
    # backward (min memory); "dots_no_batch" saves matmul outputs with no
    # batch dims (XLA's checkpoint_dots_with_no_batch_dims — cheaper
    # recompute at slightly more memory). Measured on the v5e chip in
    # bench.py; see BASELINE.md.
    remat_policy: str = "nothing"
    # Per-component policy overrides as ((component, policy), ...) pairs —
    # kept a tuple-of-pairs so Runtime stays hashable. Needed because the
    # memory-optimal policy differs per stack: "attn_only" on the LLM saves
    # its wide-MLP activations cheaply (640 tokens), but the same policy on
    # the two ViT towers must hold ~4.6 GB of 4096/4304-wide activations at
    # bs8 and OOMs a 16 GB v5e (measured: 22.15 G needed — sweep rows 18-23).
    remat_policy_overrides: tuple = ()
    # Which stacks rematerialize when remat=True. Measured on v5e @ bs8:
    # full remat and ("llm","vit") time identically (0.445 s/step — the
    # recompute is not the bottleneck at 0.5B) and ("llm",) alone fails to
    # compile within HBM; keep full remat for the memory headroom.
    remat_components: tuple = ("vit", "llm", "head")

    def policy_for(self, component: str) -> str:
        """Effective remat policy for one stack ('vit' | 'llm' | 'head')."""
        for name, policy in self.remat_policy_overrides:
            if name == component:
                return policy
        return self.remat_policy
    # Weight-only int8 serving: every Dense stores (kernel_q int8,
    # kernel_scale per-out-channel) instead of a float kernel. Batch-1
    # inference is HBM-bound — halving weight bytes cuts the latency floor.
    # Build quantized trees with models/quantize.quantize_params.
    weights_int8: bool = False
    # W8A8 serving (requires weights_int8 params): activations are
    # dynamically quantized per token (symmetric absmax over the feature
    # axis) and the matmul runs int8 x int8 -> int32 on the MXU, whose int8
    # path is 2x bf16 peak on v5e (394 vs 197 TOPS; measured 1.75-1.9x at
    # VLA batch-16 shapes including the quantization cost). Dequantization
    # is the rank-1 outer product row_scale x kernel_scale, fused by XLA.
    # Matmuls with min(in, out) < act_int8_min_dim stay in the bf16
    # upcast path (tiny, quality-critical layers like the head's fc_out —
    # no speed to gain, precision to lose).
    act_int8: bool = False
    act_int8_min_dim: int = 256
    # W8A8 matmul implementation: "xla" (lax.dot_general with fused
    # quant/dequant epilogues), "pallas" (ops/pallas_matmul.w8a8_matmul —
    # hand-pipelined weight streaming with the dequant fused in VMEM,
    # targeting the small-row serving shapes BREAKDOWN.md measured at only
    # ~50-75% of the int8 roofline under XLA), or "pallas_stacked"
    # (w8a8_matmul_stacked — scan-stacked weights stay in HBM and the
    # kernel's scalar-prefetch index_map DMAs the current layer's panels
    # directly, eliminating the per-layer (K, N) dynamic-slice copy +
    # re-tiling pass the device trace charges ~0.4 ms/forward to;
    # BREAKDOWN.md "data formatting"), or "fused" (the pallas_stacked
    # layout plus ops/pallas_fused_mlp.py: each transformer MLP runs as ONE
    # kernel so its (M, F) wide intermediates never touch HBM — attacking
    # the ~1.8 ms/forward of elementwise MLP-midsection fusions the device
    # trace charges the XLA backend with). Inference-only: these kernels
    # define no VJP, and every weights_int8 Dense is frozen anyway.
    w8a8_impl: str = "xla"
    # Internal, set by the scanned stacks (Qwen2Model / VisionTransformer)
    # under a stacked serving mode: number of scan iterations, so a
    # Dense inside the scan declares its quantized kernel as the FULL
    # (L, in, out) stack in the broadcast "qstack" collection instead of a
    # per-iteration (in, out) slice in "params". 0 = not inside a stacked
    # scan. Build the split variable dict with models/quantize.split_qstack.
    stacked_layers: int = 0

    @property
    def stacked_serving(self) -> bool:
        """True for the serving modes that keep scanned stacks' int8
        kernels whole in the broadcast "qstack" collection."""
        return self.w8a8_impl in ("pallas_stacked", "fused")


# fp32 everywhere — used for CPU parity tests against reference numerics.
FP32_RUNTIME = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")


def remat_policy(rt: Runtime, component: str | None = None):
    """Resolve the (per-component) remat policy to a jax.checkpoint policy."""
    import jax

    policy = rt.policy_for(component) if component else rt.remat_policy
    if policy == "nothing":
        return jax.checkpoint_policies.nothing_saveable
    if policy == "attn_only":
        # Structural policy: Qwen2DecoderLayer/ViTBlock skip the whole-layer
        # wrap and checkpoint only their attention sublayer in-place. Stacks
        # without that split (phi, the bridge head) fall back to full-layer
        # recompute under this policy.
        return jax.checkpoint_policies.nothing_saveable
    if policy == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if policy == "dots_no_batch":
        return jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    if policy == "mlp_saved":
        # Save exactly the checkpoint_name-tagged wide MLP projections
        # (Qwen2MLP gate/up, ViTMLP fc1) — ~90% of a transformer layer's
        # recompute FLOPs for ~50 MB/layer at micro-batch 4, leaving the
        # cheap norms/attention-projection recompute in the backward.
        return jax.checkpoint_policies.save_only_these_names("mlp_wide")
    raise ValueError(f"unknown remat_policy {policy!r}")


def quantize_rows(x: jnp.ndarray):
    """Symmetric per-row (per-token) int8 quantization over the last axis.

    x float (..., K) -> (x_q int8, row_scale float32 (..., 1)) with
    x ≈ x_q * row_scale. fp32 internals: the absmax/divide run on the VPU
    and are a vanishing fraction of the adjacent matmul's work.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return xq, scale


class Dense(nn.Module):
    """Linear layer with optional fused LoRA path."""

    features: int
    use_bias: bool = True
    rt: Runtime = Runtime()
    kernel_init: Any = nn.initializers.lecun_normal()

    def _stacked_qkernel(self, in_features: int):
        """Declare/fetch this Dense's layer-stacked int8 kernel in the
        broadcast "qstack" collection. Only callable from inside
        __call__'s compact context (flax restricts variable creation to
        it); external consumers use ``__call__(x, layer,
        stacked_weights_only=True)``. Returns (kernel_q (L, in, out),
        kernel_scale (L, out), bias (out,) or None)."""
        L = self.rt.stacked_layers
        kernel_q = self.variable(
            "qstack", "kernel_q",
            lambda: jnp.zeros((L, in_features, self.features), jnp.int8),
        ).value
        kernel_scale = self.variable(
            "qstack", "kernel_scale",
            lambda: jnp.ones((L, self.features), jnp.float32),
        ).value
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.rt.param_dtype)
        return kernel_q, kernel_scale, bias

    @nn.compact
    def __call__(self, x: jnp.ndarray, layer=None, *,
                 stacked_weights_only: bool = False):
        in_features = x.shape[-1]
        if stacked_weights_only:
            # A fused kernel spanning several Denses (ops/pallas_fused_mlp)
            # consumes the stacked weights directly instead of running the
            # per-Dense matmul; x supplies only the input width.
            assert self.rt.stacked_serving and self.rt.stacked_layers > 0
            return self._stacked_qkernel(in_features)
        if (
            self.rt.weights_int8
            and self.rt.act_int8
            # under "fused" only the MLP weights live in qstack (consumed
            # via stacked_weights_only above); the remaining matmuls stay
            # on the XLA w8a8 path, which beats the stacked kernel for
            # them (measured: tools/probes/fused_mlp_probe.py)
            and self.rt.w8a8_impl == "pallas_stacked"
            and self.rt.stacked_layers > 0
            and layer is not None
            and min(in_features, self.features) >= self.rt.act_int8_min_dim
        ):
            # Stacked-serving path: this Dense sits inside a layer scan
            # (Qwen2Model / VisionTransformer set rt.stacked_layers and
            # thread the loop index in as `layer`). The quantized kernel is
            # declared as the FULL (L, in, out) stack in the broadcast
            # "qstack" collection — nn.scan never slices it — and the
            # Pallas kernel's scalar-prefetch index_map reads the current
            # layer's weight panels straight out of the stacked HBM buffer.
            from vla_adapter_tpu.ops.pallas_matmul import w8a8_matmul_stacked

            assert self.rt.lora_rank == 0, (
                "stacked serving expects LoRA merged into the base "
                "weights (weights/merge.py) before quantization")
            kernel_q, kernel_scale, bias = self._stacked_qkernel(in_features)
            xq, row_scale = quantize_rows(x)
            lead = x.shape[:-1]
            y = w8a8_matmul_stacked(
                xq.reshape(-1, in_features),
                row_scale.reshape(-1, 1),
                kernel_q,
                kernel_scale,
                layer,
                out_dtype=self.rt.dtype,
            ).reshape(*lead, self.features)
            if bias is not None:
                y = y + bias.astype(self.rt.dtype)
            return y
        if self.rt.weights_int8:
            kernel_q = self.param(
                "kernel_q",
                nn.initializers.zeros,
                (in_features, self.features),
                jnp.int8,
            )
            kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,),
                jnp.float32,
            )
            if self.rt.act_int8 and min(
                in_features, self.features
            ) >= self.rt.act_int8_min_dim:
                # W8A8: dynamic per-token activation quant, int8 MXU matmul.
                xq, row_scale = quantize_rows(x)
                if self.rt.w8a8_impl == "pallas":
                    from vla_adapter_tpu.ops.pallas_matmul import w8a8_matmul

                    lead = x.shape[:-1]
                    y = w8a8_matmul(
                        xq.reshape(-1, in_features),
                        row_scale.reshape(-1, 1),
                        kernel_q,
                        kernel_scale,
                        out_dtype=self.rt.dtype,
                    ).reshape(*lead, self.features)
                else:
                    y = lax.dot_general(
                        xq,
                        kernel_q,
                        (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    y = (
                        y.astype(jnp.float32)
                        * row_scale
                        * kernel_scale.astype(jnp.float32)
                    ).astype(self.rt.dtype)
            else:
                # int8 upcast in-register; HBM only streams 1 byte/weight.
                y = lax.dot_general(
                    x.astype(self.rt.dtype),
                    kernel_q.astype(self.rt.dtype),
                    (((x.ndim - 1,), (0,)), ((), ())),
                ) * kernel_scale.astype(self.rt.dtype)
        else:
            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features),
                self.rt.param_dtype,
            )
            y = lax.dot_general(
                x.astype(self.rt.dtype),
                kernel.astype(self.rt.dtype),
                (((x.ndim - 1,), (0,)), ((), ())),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.rt.param_dtype
            )
            y = y + bias.astype(self.rt.dtype)
        if self.rt.lora_rank > 0:
            r = self.rt.lora_rank
            lora_a = self.param(
                "lora_a",
                nn.initializers.normal(stddev=1.0 / r),
                (in_features, r),
                self.rt.param_dtype,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (r, self.features), self.rt.param_dtype
            )
            delta = (x.astype(self.rt.dtype) @ lora_a.astype(self.rt.dtype)) @ lora_b.astype(
                self.rt.dtype
            )
            y = y + self.rt.lora_scale * delta
        return y


class BatchedDense(nn.Module):
    """A stack of per-layer Dense projections applied in ONE einsum.

    kernel (L, in, out), bias (L, out); x (B, L, S, in) -> (B, L, S, out).
    Exists for the bridge-attention head: projecting all 24 layers'
    task/adapter streams as one big MXU matmul instead of 24 small ones
    inside the block scan (measured ~3x head speedup on v5e — the scan's
    per-iteration matmuls were far below MXU-efficient sizes). No LoRA path:
    the head is always fully trainable (reference finetune recipe), so
    low-rank adapters would be redundant parameters."""

    features: int
    num_layers: int
    use_bias: bool = True
    rt: Runtime = Runtime()
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        shape = (self.num_layers, in_features, self.features)
        if self.rt.weights_int8:
            kernel_q = self.param("kernel_q", nn.initializers.zeros, shape,
                                  jnp.int8)
            kernel_scale = self.param(
                "kernel_scale", nn.initializers.ones,
                (self.num_layers, self.features), jnp.float32,
            )
            if self.rt.act_int8 and min(
                in_features, self.features
            ) >= self.rt.act_int8_min_dim:
                xq, row_scale = quantize_rows(x)
                y = jnp.einsum(
                    "blsi,lio->blso", xq, kernel_q,
                    preferred_element_type=jnp.int32,
                )
                y = (
                    y.astype(jnp.float32)
                    * row_scale
                    * kernel_scale.astype(jnp.float32)[None, :, None, :]
                ).astype(self.rt.dtype)
            else:
                y = jnp.einsum(
                    "blsi,lio->blso", x.astype(self.rt.dtype),
                    kernel_q.astype(self.rt.dtype),
                    preferred_element_type=self.rt.dtype,
                ) * kernel_scale.astype(self.rt.dtype)[None, :, None, :]
        else:
            kernel = self.param("kernel", self.kernel_init, shape,
                                self.rt.param_dtype)
            y = jnp.einsum(
                "blsi,lio->blso", x.astype(self.rt.dtype),
                kernel.astype(self.rt.dtype),
                preferred_element_type=self.rt.dtype,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros,
                (self.num_layers, self.features), self.rt.param_dtype,
            )
            y = y + bias.astype(self.rt.dtype)[None, :, None, :]
        return y


class RMSNorm(nn.Module):
    """Qwen2/LLaMA RMSNorm: y = w * x / sqrt(mean(x^2) + eps), fp32 math."""

    eps: float = 1e-6
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.rt.param_dtype)
        xf = x.astype(jnp.float32)
        xf = xf * lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return (xf * scale.astype(jnp.float32)).astype(self.rt.dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm with fp32 internals (torch-compatible)."""

    eps: float = 1e-6
    rt: Runtime = Runtime()
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), self.rt.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (dim,), self.rt.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.rt.dtype)


def gelu(x: jnp.ndarray, approximate: bool) -> jnp.ndarray:
    """GELU matching torch nn.GELU(approximate='tanh' if approximate)."""
    return nn.gelu(x, approximate=approximate)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * nn.sigmoid(1.702 * x)


def activation(name: str):
    if name == "gelu":
        return lambda x: gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: gelu(x, approximate=True)
    if name == "quick_gelu":
        return quick_gelu
    raise ValueError(f"unknown activation {name!r}")
