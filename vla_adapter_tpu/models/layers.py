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
import jax
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
    # TRAIN-time int8 frozen base (VERDICT r3 item 4): with weights_int8 +
    # act_int8 set, frozen base Denses run their forward on the serving
    # w8a8 path and their dx-backward on the same int8 MXU path via an STE
    # custom-VJP (w8a8_matmul_ste) — the frozen W streams at 1 byte in
    # both passes, and dW is never computed (dead under LoRA anyway).
    # The trainable head/proprio/projector-of-the-head stay float
    # (models/vla.py swaps their Runtime); LoRA deltas stay bf16.
    # Requires w8a8_impl="xla" (the hand kernels define no VJP).
    train_base_int8: bool = False
    # W8A8 matmul implementation: "xla" (lax.dot_general with fused
    # quant/dequant epilogues), "fused" (scan-stacked int8 MLP weights stay
    # whole in HBM in the broadcast "qstack" collection and
    # ops/pallas_fused_mlp.py runs each transformer MLP as ONE Pallas
    # kernel — the (M, F) wide intermediates never touch HBM, and the
    # kernel's scalar-prefetch index_map DMAs the current layer's weight
    # panels directly, skipping the per-layer dynamic-slice/re-tiling pass;
    # the only hand kernel measured faster than XLA end to end, at batch 1:
    # 117.3 vs 110.2 chunks/s — BENCH_r03), or "auto" (a FRONTEND value:
    # batch-keyed dispatch picking "fused" at batch <= W8A8_FUSED_MAX_BATCH
    # and "xla" above, exactly like attention's gate; the two backends need
    # different param layouts, so "auto" must be resolved to a concrete
    # backend per batch bucket BEFORE model construction — infer/predict.py
    # Predictor and serve/* do this; a model built directly with "auto"
    # raises at trace time). Two slower hand backends from round 3
    # ("pallas" per-matmul, "pallas_stacked") were demoted out of this
    # dispatch — their kernels and measured verdicts live on in
    # ops/pallas_matmul.py, tools/probes/, and BREAKDOWN.md.
    # Inference-only: the fused kernel defines no VJP, and every
    # weights_int8 Dense is frozen anyway.
    w8a8_impl: str = "xla"
    # Internal, set by the scanned stacks (Qwen2Model / VisionTransformer)
    # under a stacked serving mode: number of scan iterations, so a
    # Dense inside the scan declares its quantized kernel as the FULL
    # (L, in, out) stack in the broadcast "qstack" collection instead of a
    # per-iteration (in, out) slice in "params". 0 = not inside a stacked
    # scan. Build the split variable dict with models/quantize.split_qstack.
    stacked_layers: int = 0

    def __post_init__(self):
        if self.w8a8_impl not in ("xla", "fused", "mega", "auto"):
            raise ValueError(
                f"w8a8_impl={self.w8a8_impl!r}: valid backends are 'xla', "
                "'fused', 'mega' (batch-1 whole-decoder-layer kernel, "
                "ops/pallas_megalayer.py), and the frontend value 'auto' "
                "(batch-keyed dispatch). The round-3 'pallas'/"
                "'pallas_stacked' backends measured slower than XLA end to "
                "end and were demoted to tools/probes/ (BREAKDOWN.md).")

    @property
    def stacked_serving(self) -> bool:
        """True for the serving modes that keep scanned stacks' int8 MLP
        (and, for 'mega', o-projection) kernels whole in the broadcast
        "qstack" collection."""
        return self.w8a8_impl in ("fused", "mega")


# Measured crossover of the batch-keyed "auto" w8a8 dispatch (BENCH_r03,
# re-confirmed r04 on the v5e chip): the fused whole-MLP kernel wins at
# batch 1 (117.3 vs 110.2 chunks/s, 8.53 vs 9.07 ms) and loses from batch 2
# up (122.6 vs 128.8 at b2) — at >=2 chunks the weight streaming the kernel
# optimizes already amortizes across rows and XLA's cross-op epilogue
# fusion wins back the difference.
W8A8_FUSED_MAX_BATCH = 1


def resolve_w8a8_impl(impl: str, batch: int) -> str:
    """Resolve the frontend 'auto' w8a8 backend for a concrete batch size.

    The two backends store weights in different collections (qstack vs
    params), so — unlike attention's in-graph gate — the choice must be
    made before model construction; serving layers call this per batch
    bucket (the dynamic batcher compiles per bucket anyway, so the
    per-bucket backend choice is free)."""
    if impl == "auto":
        return "fused" if batch <= W8A8_FUSED_MAX_BATCH else "xla"
    return impl


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


def _w8a8_fwd_math(x, kernel_q, kernel_scale, out_dtype):
    xq, row_scale = quantize_rows(x)
    y = lax.dot_general(
        xq, kernel_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * row_scale
            * kernel_scale.astype(jnp.float32)).astype(out_dtype)


@jax.custom_vjp
def w8a8_matmul_ste(x, kernel_q, kernel_scale):
    """W8A8 matmul with a straight-through-estimator backward — the
    TRAINING twin of the serving w8a8 path, for frozen int8 base weights
    under LoRA (BREAKDOWN.md train table / VERDICT r3 item 4).

    Forward: per-token int8 activation quant, int8xint8->int32 MXU dot,
    rank-1 dequant — identical math to the serving branch. Backward: the
    activation quantization is treated as identity (STE) and dx = dy @ W^T
    runs on the SAME int8 MXU path: dy is scaled by the per-out-channel
    kernel_scale, quantized per row, and dotted against kernel_q with the
    OUT axis contracted — the frozen W^T streams at 1 byte/weight just
    like the forward. No dW is ever computed (the kernel args get
    zero/float0 cotangents): under LoRA the base kernel is frozen, so its
    gradient is dead code by construction.
    """
    return _w8a8_fwd_math(x, kernel_q, kernel_scale, x.dtype)


def _w8a8_ste_fwd(x, kernel_q, kernel_scale):
    return _w8a8_fwd_math(x, kernel_q, kernel_scale, x.dtype), (
        kernel_q, kernel_scale)


def _w8a8_ste_bwd(res, dy):
    import numpy as np

    kernel_q, kernel_scale = res
    # dx = dy @ (kernel_q * scale)^T = (dy * scale) @ kernel_q^T
    dys = dy.astype(jnp.float32) * kernel_scale.astype(jnp.float32)
    dq, d_scale = quantize_rows(dys)
    dx = lax.dot_general(
        dq, kernel_q, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    dx = (dx.astype(jnp.float32) * d_scale).astype(dy.dtype)
    return (
        dx,
        np.zeros(kernel_q.shape, jax.dtypes.float0),  # int8: float0 cotangent
        jnp.zeros_like(kernel_scale),
    )


w8a8_matmul_ste.defvjp(_w8a8_ste_fwd, _w8a8_ste_bwd)


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

    def _stacked_qkernel(self, in_features: int, pad_in_to=None,
                         pad_out_to=None):
        """Declare/fetch this Dense's layer-stacked int8 kernel in the
        broadcast "qstack" collection. Only callable from inside
        __call__'s compact context (flax restricts variable creation to
        it); external consumers use ``__call__(x, layer,
        stacked_weights_only=True)``. Returns (kernel_q (L, in, out),
        kernel_scale (L, out), bias (out,) or None).

        pad_in_to / pad_out_to declare the STORAGE dims zero-padded up to
        the given size. TPU tiles s8 arrays (32, 128) over the trailing
        dims; a lane-unaligned minor dim (so400m's mlp_dim 4304) makes
        XLA re-lay-out the whole stack on EVERY pallas_call — 0.47 ms of
        "data formatting" per batch-1 forward in the round-4 device trace.
        Zero padding is inert: padded columns produce act(0)=0 hidden
        values and padded down-rows contribute exact zeros (split_qstack
        zero-fills the pad region when moving real weights in). The bias
        keeps its true (features,) shape in "params" (checkpoint compat);
        the fused-MLP wrapper pads it at call time."""
        L = self.rt.stacked_layers
        k_in = max(in_features, pad_in_to or 0)
        k_out = max(self.features, pad_out_to or 0)
        kernel_q = self.variable(
            "qstack", "kernel_q",
            lambda: jnp.zeros((L, k_in, k_out), jnp.int8),
        ).value
        kernel_scale = self.variable(
            "qstack", "kernel_scale",
            lambda: jnp.ones((L, k_out), jnp.float32),
        ).value
        bias = None
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.rt.param_dtype)
        return kernel_q, kernel_scale, bias

    @nn.compact
    def __call__(self, x: jnp.ndarray, layer=None, *,
                 stacked_weights_only: bool = False,
                 pad_in_to=None, pad_out_to=None):
        in_features = x.shape[-1]
        if stacked_weights_only:
            # A fused kernel spanning several Denses (ops/pallas_fused_mlp)
            # consumes the stacked weights directly instead of running the
            # per-Dense matmul; x supplies only the input width.
            assert self.rt.stacked_serving and self.rt.stacked_layers > 0
            return self._stacked_qkernel(in_features, pad_in_to, pad_out_to)
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
                if self.rt.w8a8_impl == "auto":
                    raise ValueError(
                        "Runtime(w8a8_impl='auto') reached a module: 'auto' "
                        "is a frontend value — resolve it per batch with "
                        "models.layers.resolve_w8a8_impl before building "
                        "the model (infer/predict.py does this).")
                # W8A8: dynamic per-token activation quant, int8 MXU matmul.
                # Under "fused" only the whole-MLP kernels are hand-written
                # (consumed via stacked_weights_only above); every other
                # matmul stays on this XLA path, which beats the round-3
                # per-matmul hand kernels for them (BREAKDOWN.md).
                if self.rt.train_base_int8:
                    # differentiable twin (STE backward on the int8 MXU)
                    y = w8a8_matmul_ste(
                        x.astype(self.rt.dtype), kernel_q, kernel_scale)
                else:
                    y = _w8a8_fwd_math(x, kernel_q, kernel_scale,
                                       self.rt.dtype)
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
    """Qwen2/LLaMA RMSNorm: y = w * x / sqrt(mean(x^2) + eps), fp32 math.

    ``scale_only=True`` declares and returns just the (dim,) scale param —
    for kernels that apply the norm in-VMEM (ops/pallas_megalayer.py) while
    keeping this module the param's owner so checkpoints stay layout-
    compatible across backends."""

    eps: float = 1e-6
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, scale_only: bool = False):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), self.rt.param_dtype)
        if scale_only:
            return scale.astype(jnp.float32)
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
