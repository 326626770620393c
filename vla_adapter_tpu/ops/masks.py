"""Attention-mask construction.

The VLA-Adapter checkpoints are trained with **fully bidirectional**
self-attention over the whole multimodal sequence (the pinned
``moojink/transformers-openvla-oft`` fork removes the causal mask entirely;
evidence in-reference: modeling_prismatic.py:756 appends the STOP token at
inference "needed in non-causal bi-directional self-attention, as it appears
at train time" — under a causal mask a trailing token could never influence
the action states). We therefore support three modes:

  * ``bidirectional`` — padding-mask only (VLA-Adapter default)
  * ``causal``        — standard autoregressive (base-VLM mode)
  * ``prefix_bidir``  — causal prefix with a bidirectional suffix block
                        (exposed for ablations; not used by released models)

Masks are boolean with True = "may attend".
"""

from __future__ import annotations

import jax.numpy as jnp


def padding_mask(valid: jnp.ndarray) -> jnp.ndarray:
    """(B, S) validity -> (B, 1, S, S) key-side mask (True = attend).

    Only the key side is masked; fully-masked query rows (padding queries)
    produce garbage that downstream consumers never read, matching the
    reference semantics of HF attention_mask.
    """
    valid = valid.astype(jnp.bool_)
    return valid[:, None, None, :] & jnp.ones(
        (valid.shape[0], 1, valid.shape[1], 1), dtype=jnp.bool_
    )


def causal_mask(seq_len: int) -> jnp.ndarray:
    """(1, 1, S, S) lower-triangular causal mask."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    return (j <= i)[None, None]


def prefix_bidirectional_mask(seq_len: int, suffix_start: jnp.ndarray) -> jnp.ndarray:
    """Causal prefix; positions >= suffix_start attend bidirectionally among
    themselves and to the whole prefix. suffix_start may be per-batch (B,)."""
    i = jnp.arange(seq_len)[:, None]
    j = jnp.arange(seq_len)[None, :]
    base = j <= i  # causal
    suffix_start = jnp.asarray(suffix_start)
    if suffix_start.ndim == 0:
        in_suffix_q = (i >= suffix_start)
        in_suffix_k = (j >= suffix_start)
        m = base | (in_suffix_q & in_suffix_k)
        return m[None, None]
    in_suffix_q = i[None] >= suffix_start[:, None, None]
    in_suffix_k = j[None] >= suffix_start[:, None, None]
    return (base[None] | (in_suffix_q & in_suffix_k))[:, None]


def combine_masks(*masks) -> jnp.ndarray:
    """AND together any number of broadcastable boolean masks."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else (out & m)
    return out


def build_attention_mask(
    mode: str,
    valid: jnp.ndarray | None,
    seq_len: int,
    suffix_start=None,
) -> jnp.ndarray | None:
    """Build the (B|1, 1, S, S) boolean attention mask for a given mode."""
    pad = padding_mask(valid) if valid is not None else None
    if mode == "bidirectional":
        return pad
    if mode == "causal":
        return combine_masks(causal_mask(seq_len), pad)
    if mode == "prefix_bidir":
        if suffix_start is None:
            raise ValueError("prefix_bidir requires suffix_start")
        return combine_masks(prefix_bidirectional_mask(seq_len, suffix_start), pad)
    raise ValueError(f"unknown attention mask mode: {mode!r}")
