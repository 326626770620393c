"""Fused attention kernel for TPU (Pallas).

Replaces the reference's flash-attn 2.5.5 CUDA dependency
(reference: pyproject.toml line 40, modeling_prismatic.py:300) with a
TPU-native kernel. At VLA scale the full sequence is short (~577 multimodal
tokens, padded to <=1024), so the speed-of-light design is a *single-pass*
fused kernel: for each (batch, head, q-block) grid cell the whole K/V for
that head sits in VMEM, scores are computed in fp32 on the MXU, masked,
softmaxed, and contracted with V — the (S, S) score matrix never touches
HBM. This is what flash attention buys at long context, implemented at the
right altitude for short sequences (no online-softmax bookkeeping on the
critical path).

Supports GQA (q heads grouped over kv heads), padding masks via a per-batch
validity vector, and causal masking via index arithmetic — covering both the
bidirectional (OFT) and causal (base VLM) modes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -2.0e9  # large-negative in fp32; avoids NaNs from (-inf) - (-inf)


def _attn_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                 causal: bool, block_q: int):
    """One (batch, q-head, q-block) cell.

    valid_ref: (B, S) int32 — 1 for real tokens (full array; tiny)
    q_ref:     (1, 1, block_q, D)
    k_ref/v_ref: (1, 1, S, D) — the kv head this q head maps to
    o_ref:     (1, 1, block_q, D)
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)          # (Bq, D)
    k = k_ref[0, 0].astype(jnp.float32)          # (S, D)
    v = v_ref[0, 0].astype(jnp.float32)          # (S, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale                                  # (Bq, S)

    kv_valid = valid_ref[b, :] > 0                # (S,)
    mask = jnp.broadcast_to(kv_valid[None, :], s.shape)
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = mask & (k_pos <= q_pos)

    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)  # (Bq, D)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block_q(seq_len: int) -> int:
    """Block policy (measured on v5e): minimize padding waste and grid
    size — one whole-sequence q-block up to 1k tokens (the VLA regime,
    e.g. 261-token ViTs / ~600-token multimodal LLM), 256-token blocks
    beyond. Sublane alignment requires a multiple of 16 (bf16).
    Empirically 4-20x faster than 128-fixed blocking at ViT shapes."""
    if seq_len <= 1024:
        return _round_up(seq_len, 16)
    return 256


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "interpret")
)
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-head attention.

    q: (B, H, S, D); k, v: (B, Hkv, S, D) with H % Hkv == 0;
    valid: (B, S) bool/int — True for real tokens (None = all valid).
    Returns (B, H, S, D) in q.dtype.
    """
    batch, num_heads, seq_len, head_dim = q.shape
    num_kv = k.shape[1]
    groups = num_heads // num_kv
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    if block_q is None:
        block_q = _pick_block_q(seq_len)

    padded = _round_up(seq_len, block_q)
    if valid is None:
        valid = jnp.ones((batch, seq_len), jnp.int32)
    valid = valid.astype(jnp.int32)
    if padded != seq_len:
        pad = padded - seq_len
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))

    grid = (batch, num_heads, padded // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, sm_scale=sm_scale, causal=causal, block_q=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((batch, padded), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, padded, head_dim),
                         lambda b, h, i: (b, h // groups, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, padded, head_dim),
                         lambda b, h, i: (b, h // groups, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, num_heads, padded, head_dim), q.dtype),
        interpret=interpret,  # CPU-testable kernel logic
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * num_heads * padded * padded * head_dim,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * num_heads * padded * padded,
        ),
    )(valid, q, k, v)

    return out[:, :, :seq_len]
