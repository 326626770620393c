"""Whole-decoder-layer w8a8 megakernel for TPU (Pallas) — batch-1 serving.

The round-4 floor analysis (BREAKDOWN.md) left ONE untested lever for the
batch-1 serving forward: attention + MLP in a single pallas_call. Two
prior attacks bounded it from below — the per-matmul and stacked-matmul
backends both LOST because per-pallas_call overhead plus XLA's lost
epilogue fusion outweighed the formatting they removed — so this kernel
attacks only what those experiments say can win: it extends the already-
winning whole-MLP kernel (ops/pallas_fused_mlp.py) upward through the
attention core, so the XLA<->kernel boundary per layer drops to one
round-trip and the score matrix, softmax, context, o-projection,
post-attention RMSNorm, and the (M, F) MLP midsection ALL stay in VMEM.

Scope (deliberately minimal — the VERDICT r4 item 6 experiment):
  * ONE configuration: the Qwen2 decoder layer at batch 1 (M = S tokens,
    single sequence; the kernel attends across all M rows).
  * The layer's prologue (RMSNorm1 + q/k/v projections + RoPE) stays in
    XLA — measured round 4: XLA wins those via bias/RoPE epilogue fusion.
  * Inference-only, bidirectional mask via an additive key-side bias row
    (the OFT serving mode); no VJP.

Grid: Hkv * (M / block_q) attention steps, then an o-proj/norm step, then
ceil(F / block_f) MLP panel steps — all in one sequential pallas_call so
scratch carries the intermediates:

  attention step (kvh, qb): the G=H/Hkv query heads of this kv group fold
    into the row axis of one (G*block_q, Dh) x (Dh, M) MXU dot
    (pallas_attention's proven GQA folding); VPU-lean softmax (additive
    bias fused into the scale pass, unnormalized bf16 probabilities, 1/l
    applied to the small output); context written to scratch (H, M, Dh).
  o step: per-token quantize the context, 14 int8 (M, Dh) x (Dh, D) dots
    accumulate the o-projection EXACTLY in f32 (each int32 partial is
    <= 64*127*127 and the 14-dot sum < 2^24), + residual, RMSNorm2,
    per-token quantize -> scratch for the MLP.
  MLP panel steps: the gated w8a8 MLP exactly as w8a8_gated_mlp_stacked,
    reading the quantized input from scratch; the last step adds the
    attention residual and writes the layer output — the only (M, D)
    tensor that touches HBM after the prologue.

Weights stream from layer-stacked HBM buffers via scalar-prefetch layer
indexing (same "qstack" storage as the fused-MLP backend); constant
index maps keep the o kernel and each panel resident across steps.

Numerics vs the fused backend: identical quantization granularity
(per-token inputs, per-(token, panel) MLP midsection); attention follows
ops/pallas_attention.py's f32-accumulation recipe; residual adds in bf16
like the Flax layer. Validated against the fused/XLA path in
tests/test_ops.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e9


def _qsteps(m: int, block_q: int) -> int:
    assert m % block_q == 0, (m, block_q)
    return m // block_q


def _megalayer_kernel(
    # static
    num_heads, num_kv_heads, block_q, block_f, nf, f_actual, eps, sm_scale,
    # scalar prefetch
    l_ref,
    # inputs
    x_ref, q_ref, k_ref, v_ref, bias_ref, n2_ref,
    oq_ref, os_ref, gq_ref, gs_ref, uq_ref, us_ref, dq_ref, ds_ref,
    # output
    o_ref,
    # scratch
    ctx_s, xattn_s, hq_s, hs_s, acc_s,
):
    t = pl.program_id(0)
    groups = num_heads // num_kv_heads
    m = x_ref.shape[0]
    dh = q_ref.shape[-1]
    n_qb = m // block_q
    n_attn = num_kv_heads * n_qb

    @pl.when(t < n_attn)
    def _attention():
        kvh = t // n_qb
        qb = t - kvh * n_qb
        q = q_ref[0, ...].reshape(groups * block_q, dh)       # (G*Bq, Dh)
        k = k_ref[0]                                          # (M, Dh)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (G*Bq, M)
        s = s * sm_scale + bias_ref[0, :][None, :]
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx).astype(v.dtype)                   # unnormalized
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        ctx = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
        ctx = ctx.reshape(groups, block_q, dh).astype(ctx_s.dtype)
        ctx_s[pl.ds(kvh * groups, groups),
              pl.ds(qb * block_q, block_q), :] = ctx

    @pl.when(t == n_attn)
    def _o_norm():
        # per-token quantize the context over the FULL (H*Dh) feature row
        # (matching the XLA o_proj's per-token granularity)
        ctx = ctx_s[...].astype(jnp.float32)                  # (H, M, Dh)
        absmax = jnp.max(jnp.abs(ctx), axis=(0, 2))           # (M,)
        scale = (jnp.maximum(absmax, 1e-8) / 127.0)[:, None]  # (M, 1)
        acc = jnp.zeros((m, x_ref.shape[1]), jnp.float32)
        for h in range(num_heads):
            cq = jnp.clip(jnp.round(ctx[h] / scale), -127, 127
                          ).astype(jnp.int8)                  # (M, Dh)
            acc = acc + jax.lax.dot_general(
                cq, oq_ref[pl.ds(h * dh, dh), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        o = acc * scale * os_ref[...]                         # (M, D) f32
        xattn = (x_ref[...].astype(jnp.float32) + o).astype(x_ref.dtype)
        xattn_s[...] = xattn
        # RMSNorm2 (fp32 math, as models/layers.RMSNorm)
        xf = xattn.astype(jnp.float32)
        h2 = xf * jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
        h2 = h2 * n2_ref[...]
        # per-token quantize the MLP input
        am = jnp.max(jnp.abs(h2), axis=-1, keepdims=True)     # (M, 1)
        hsc = jnp.maximum(am, 1e-8) / 127.0
        hs_s[:, 0:1] = hsc
        hq_s[...] = jnp.clip(jnp.round(h2 / hsc), -127, 127).astype(jnp.int8)

    @pl.when(t > n_attn)
    def _mlp_panel():
        p = t - (n_attn + 1)
        rs = hs_s[:, 0:1]
        g = (jax.lax.dot_general(
            hq_s[...], gq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
            * rs * gs_ref[...])
        u = (jax.lax.dot_general(
            hq_s[...], uq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
            * rs * us_ref[...])
        hmid = jax.nn.silu(g) * u
        if f_actual % block_f:
            col = p * block_f + jax.lax.broadcasted_iota(
                jnp.int32, hmid.shape, 1)
            hmid = jnp.where(col < f_actual, hmid, 0.0)
        am = jnp.max(jnp.abs(hmid), axis=-1, keepdims=True)
        hsc = jnp.maximum(am, 1e-8) / 127.0
        hq = jnp.clip(jnp.round(hmid / hsc), -127, 127).astype(jnp.int8)
        part = jax.lax.dot_general(
            hq, dq_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * hsc

        @pl.when(p == 0)
        def _():
            acc_s[...] = part

        @pl.when(p > 0)
        def _():
            acc_s[...] = acc_s[...] + part

        @pl.when(p == nf - 1)
        def _write():
            out = acc_s[...] * ds_ref[...]
            o_ref[...] = (xattn_s[...].astype(jnp.float32)
                          + out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "num_kv_heads", "eps", "block_q", "block_f", "out_dtype",
    "interpret"))
def w8a8_qwen2_layer_stacked(
    x: jnp.ndarray,        # (M, D) bf16 residual stream
    q: jnp.ndarray,        # (Hkv, G, M, Dh) roped queries
    k: jnp.ndarray,        # (Hkv, M, Dh) roped keys
    v: jnp.ndarray,        # (Hkv, M, Dh)
    bias: jnp.ndarray,     # (M,) f32 additive key-side mask (0 / -2e9)
    norm2_scale: jnp.ndarray,   # (D,) this layer's post-attn RMSNorm scale
    o_q: jnp.ndarray,      # (L, H*Dh, D) int8
    o_scale: jnp.ndarray,  # (L, D)
    gate_q: jnp.ndarray,   # (L, D, F) int8
    gate_scale: jnp.ndarray,
    up_q: jnp.ndarray,
    up_scale: jnp.ndarray,
    down_q: jnp.ndarray,   # (L, F, D) int8
    down_scale: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    num_heads: int,
    num_kv_heads: int,
    eps: float = 1e-6,
    block_q: int = 320,
    block_f: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One Qwen2 decoder layer (attention core onward) as ONE kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, d = x.shape
    dh = q.shape[-1]
    groups = num_heads // num_kv_heads
    num_l, _, f = gate_q.shape
    block_q = min(block_q, m)
    while m % block_q:
        block_q //= 2
    n_qb = m // block_q
    n_attn = num_kv_heads * n_qb
    block_f = min(block_f, f)
    nf = pl.cdiv(f, block_f)
    grid = (n_attn + 1 + nf,)
    sm_scale = dh ** -0.5

    def qmap(t, l):
        kvh = jnp.minimum(t // n_qb, num_kv_heads - 1)
        qb = jnp.where(t < n_attn, t - kvh * n_qb, n_qb - 1)
        return (kvh, 0, qb, 0)

    def kvmap(t, l):
        return (jnp.minimum(t // n_qb, num_kv_heads - 1), 0, 0)

    def pmap_gate(t, l):
        return (l[0], 0, jnp.clip(t - (n_attn + 1), 0, nf - 1))

    def pmap_down(t, l):
        return (l[0], jnp.clip(t - (n_attn + 1), 0, nf - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, d), lambda t, l: (0, 0)),              # x
            pl.BlockSpec((1, groups, block_q, dh), qmap),           # q
            pl.BlockSpec((1, m, dh), kvmap),                        # k
            pl.BlockSpec((1, m, dh), kvmap),                        # v
            pl.BlockSpec((1, m), lambda t, l: (0, 0)),              # bias
            pl.BlockSpec((1, d), lambda t, l: (0, 0)),              # n2
            pl.BlockSpec((None, num_heads * dh, d),
                         lambda t, l: (l[0], 0, 0)),                # o_q
            pl.BlockSpec((None, 1, d), lambda t, l: (l[0], 0, 0)),  # o_s
            pl.BlockSpec((None, d, block_f), pmap_gate),            # gate_q
            pl.BlockSpec((None, 1, block_f), pmap_gate),            # gate_s
            pl.BlockSpec((None, d, block_f), pmap_gate),            # up_q
            pl.BlockSpec((None, 1, block_f), pmap_gate),            # up_s
            pl.BlockSpec((None, block_f, d), pmap_down),            # down_q
            pl.BlockSpec((None, 1, d), lambda t, l: (l[0], 0, 0)),  # down_s
        ],
        out_specs=pl.BlockSpec((m, d), lambda t, l: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_heads, m, dh), x.dtype),    # context
            pltpu.VMEM((m, d), x.dtype),                # x + attn residual
            pltpu.VMEM((m, d), jnp.int8),               # quantized MLP in
            pltpu.VMEM((m, 128), jnp.float32),          # MLP input scales
            pltpu.VMEM((m, d), jnp.float32),            # down accumulator
        ],
    )
    flops = 2 * m * (num_heads * dh * m * 2        # scores + context
                     + num_heads * dh * d          # o proj
                     + d * f * 2 + f * d)          # gate/up + down
    call = pl.pallas_call(
        functools.partial(
            _megalayer_kernel, num_heads, num_kv_heads, block_q, block_f,
            nf, f, eps, sm_scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size * x.dtype.itemsize * 2
                            + q.size * q.dtype.itemsize * 2
                            + num_heads * dh * d + 2 * d * f + f * d),
            transcendentals=m * (f + num_heads * m),
        ),
    )
    return call(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, q, k, v,
        bias.astype(jnp.float32).reshape(1, m),
        norm2_scale.astype(jnp.float32).reshape(1, d),
        o_q, o_scale.astype(jnp.float32).reshape(num_l, 1, d),
        gate_q, gate_scale.astype(jnp.float32).reshape(num_l, 1, f),
        up_q, up_scale.astype(jnp.float32).reshape(num_l, 1, f),
        down_q, down_scale.astype(jnp.float32).reshape(num_l, 1, d),
    )
