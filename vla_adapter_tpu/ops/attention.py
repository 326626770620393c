"""Attention dispatch: Pallas fused kernel on TPU, XLA reference elsewhere.

The public entry point is :func:`dot_product_attention`, taking tensors in
(B, S, H, D) layout (sequence-major, the layout the rest of the model uses)
and a per-batch validity vector plus a mode string instead of a materialized
(S, S) mask — the kernel builds masks from index arithmetic.

Training uses a ``jax.custom_vjp``: the forward runs the Pallas kernel; the
backward recomputes attention with XLA einsums (flash-style recomputation —
no (S, S) tensor is saved between fwd and bwd). At VLA sequence lengths
(<=1024) the recomputed backward is within a few percent of a hand-written
backward kernel while keeping the code surface small.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vla_adapter_tpu.ops.pallas_attention import fused_attention

NEG_INF = -2.0e9


def _supports_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _expand_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """(B, S, Hkv, D) -> (B, S, Hkv*groups, D) by repetition (GQA)."""
    if groups == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, groups, d)).reshape(
        b, s, h * groups, d
    )


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: Optional[jnp.ndarray],
    *,
    causal: bool,
    sm_scale: float,
) -> jnp.ndarray:
    """Reference implementation; q (B,S,H,D), k/v (B,S,Hkv,D).

    Matmuls run in the input dtype (bf16 on the MXU) with fp32
    accumulation — upcasting q/k to fp32 first would force the MXU's
    multi-pass fp32 path (~3x slower) for no accuracy gain over
    fp32-accumulated bf16. Softmax stays fp32.
    """
    groups = q.shape[2] // k.shape[2]
    k = _expand_kv(k, groups)
    v = _expand_kv(v, groups)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    s = s * sm_scale
    seq = q.shape[1]
    mask = None
    if valid is not None:
        mask = valid.astype(jnp.bool_)[:, None, None, :]
    if causal:
        cm = (jnp.arange(seq)[None, :] <= jnp.arange(seq)[:, None])[None, None]
        mask = cm if mask is None else (mask & cm)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attention_pallas_trainable(q, k, v, valid, causal, sm_scale):
    # (B,S,H,D) -> kernel layout (B,H,S,D) and back.
    out = fused_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        valid,
        causal=causal,
        sm_scale=sm_scale,
    )
    return out.transpose(0, 2, 1, 3)


def _attention_fwd(q, k, v, valid, causal, sm_scale):
    return _attention_pallas_trainable(q, k, v, valid, causal, sm_scale), (q, k, v, valid)


def _attention_bwd(causal, sm_scale, res, g):
    q, k, v, valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xla_attention(
            q_, k_, v_, valid, causal=causal, sm_scale=sm_scale
        ),
        q, k, v,
    )
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_attention_pallas_trainable.defvjp(_attention_fwd, _attention_bwd)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head (optionally grouped-query) attention.

    q: (B, S, H, D); k, v: (B, S, Hkv, D); valid: (B, S) True=real token.
    impl: 'auto' | 'auto_bwd' (training crossover) | 'pallas' | 'xla'.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if impl in ("auto", "auto_bwd"):
        # Measured on v5e (round 2, per-layer microbench at batch 16): the
        # VPU-lean kernel (additive mask bias, unnormalized bf16 probs,
        # deferred 1/l, ~1.3 MB score blocks) beats XLA's fused attention
        # ~2x in the VLA regime — 0.54 vs 1.06 ms at the 640-token LLM
        # shape, 0.49 vs 0.91 ms at the ViT shape (layout transposes
        # included; batch-1 is below tunnel measurement noise for both).
        # This regime is VPU/HBM-bound: XLA materializes the score matrix
        # in HBM, the kernel keeps it in VMEM. Tiny sequences stay on XLA
        # (padding overhead; nothing to win), and so do small batches: at
        # batch 1 the grid has ~20 cells, the pipeline never fills, and the
        # measured flagship batch-1 latency regressed 12.3 -> 13.8 ms under
        # the kernel while batch 16 improved 158 -> 151 ms (w8a8). The
        # round-3 end-to-end w8a8 batch sweep put the crossover at 16, not
        # 4: batch-4 forwards ran 42.1 ms under the kernel vs 36.8 ms on
        # XLA (94.9 -> 108.8 chunks/s) and batch-8 was a wash (109.5 vs
        # 110.8), while batch 16 kept favoring the kernel (104.5 vs 101.3).
        # Gradient paths are different: with the custom-VJP recompute
        # backward the kernel still wins at micro-batch 4 (flagship LoRA
        # step 0.364 vs 0.370 s/step), so training call sites pass
        # "auto_bwd" to keep the batch-4 threshold.
        min_batch = 4 if impl == "auto_bwd" else 16
        use_pallas = (
            _supports_pallas() and q.shape[1] >= 128
            and q.shape[0] >= min_batch
        )
        impl = "pallas" if use_pallas else "xla"
    if impl == "pallas":
        return _attention_pallas_trainable(q, k, v, valid, causal, sm_scale)
    return xla_attention(q, k, v, valid, causal=causal, sm_scale=sm_scale)
