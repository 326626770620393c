"""Rotary position embeddings.

Two layouts are used by the reference model family and must not be mixed:

* ``half`` — LLaMA/Qwen2 layout: the head dim is split into two halves and
  rotated as ``(x1, x2) -> (x1*cos - x2*sin, x2*cos + x1*sin)`` with the
  frequency vector duplicated ``cat(freqs, freqs)``. Used by the Qwen2
  decoder (HF modeling_qwen2 semantics).
* ``interleaved`` — even/odd pairs rotated in place. Used by the Pro
  bridge-attention blocks (reference: action_heads.py:125-146, where
  ``rotate_half`` stacks ``(-x[..., 1::2], x[..., ::2])`` pairwise).

All functions are pure jnp and shape-polymorphic over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(
    seq_len: int,
    head_dim: int,
    theta: float,
    dtype=jnp.float32,
    positions: jnp.ndarray | None = None,
):
    """Return (cos, sin) of shape (seq_len, head_dim).

    ``positions`` overrides the default arange (needed for KV-cache decoding
    or non-contiguous position ids). Frequencies are computed in float32 for
    accuracy and cast at the end, matching HF behavior.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    if positions is None:
        positions = jnp.arange(seq_len, dtype=jnp.float32)
    else:
        positions = positions.astype(jnp.float32)
    freqs = jnp.einsum("s,d->sd", positions, inv_freq)  # (S, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)      # (S, head_dim)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """LLaMA-style: (x1, x2) -> (-x2, x1) by halves."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                    layout: str = "bshd") -> jnp.ndarray:
    """Apply half-layout RoPE.

    x: (B, S, H, D) for layout="bshd" (the model's layout), (S, H, D) for
    "shd", (B, S, D) for "bsd"; cos/sin: (S, D). The layout is EXPLICIT —
    a shape heuristic over 3D inputs silently rotated by the wrong axis
    whenever the head count happened to equal the sequence length.
    """
    if layout == "bshd":
        assert x.ndim == 4, x.shape
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    elif layout == "shd":
        assert x.ndim == 3, x.shape
        cos = cos[:, None, :]
        sin = sin[:, None, :]
    elif layout == "bsd":
        assert x.ndim == 3, x.shape
    else:
        raise ValueError(f"unknown layout {layout!r}")
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)


def _rotate_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    """Pairwise: (e, o) -> (-o, e) for even/odd interleaved dims.

    Matches reference action_heads.py:135-140.
    """
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def interleaved_cos_sin(seq_len: int, head_dim: int, base: float, dtype=jnp.float32):
    """(cos, sin) for the interleaved layout, duplicated-halves frequency
    vector exactly as reference action_heads.py:150-164 (note: the reference
    *also* uses cat(freqs, freqs) even though its rotate is interleaved —
    replicate that faithfully)."""
    return rope_cos_sin(seq_len, head_dim, base, dtype=dtype)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply interleaved-pair RoPE; x: (..., S, D') with cos/sin (S, D')."""
    while cos.ndim < x.ndim:
        cos = cos[None]
        sin = sin[None]
    return (x * cos + _rotate_interleaved(x) * sin).astype(x.dtype)
