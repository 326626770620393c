"""Decoding paths beyond L1 regression.

* :func:`discrete_actions_from_logits` — the parallel discrete decode: the
  single bidirectional pass already yields logits for every action slot, so
  the action chunk is argmax-ed in one step (reference
  modeling_prismatic.py:874-887 — slice starts one position before the
  action block, reading each slot's next-token prediction).

* :func:`greedy_generate` — autoregressive decode for the legacy/native
  OpenVLA path (reference vlas/openvla.py:24-134 predicts 7 action tokens
  via `generate`) and base-VLM text generation. Fixed-shape: the sequence
  buffer is pre-padded to prompt+max_new_tokens and a lax.scan fills one
  token per step (full recompute per step — at VLA sequence lengths the
  whole point of this framework is to NOT use this path; it exists for
  parity and base-VLM sampling).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _variables(params) -> dict:
    """Accept either a bare params tree or a full flax variables dict —
    the fused serving layout splits the scanned stacks' int8 MLP
    kernels into a separate "qstack" collection (models/quantize.py
    split_qstack), so decode callers pass {"params": ..., "qstack": ...}."""
    return params if "params" in params else {"params": params}


def discrete_actions_from_logits(
    logits: jnp.ndarray,
    prompt_len: jnp.ndarray,
    num_actions_chunk: int,
    action_dim: int,
    tokenizer_len: int,
    n_bins: int = 256,
) -> jnp.ndarray:
    """logits: (B, T_text, V) in original text coordinates (models/vla.py
    `logits` output). Returns normalized actions (B, chunk, action_dim)."""
    n = num_actions_chunk * action_dim
    # logits at position p-1 predict token p: the action block's predictions
    # live at [prompt_len-1, prompt_len-1+n)
    start = prompt_len - 1
    idx = start[:, None] + jnp.arange(n)[None, :]
    sliced = jnp.take_along_axis(logits, idx[:, :, None], axis=1)
    token_ids = jnp.argmax(sliced, axis=-1)  # (B, n)
    # detokenize via bin centers (reference :884-887 — uses vocab size minus
    # the pad_to_multiple padding, i.e. the extended tokenizer length)
    from vla_adapter_tpu.data.action_tokenizer import detokenize_bin_ids_jnp

    acts = detokenize_bin_ids_jnp(token_ids, tokenizer_len, n_bins)
    return acts.reshape(-1, num_actions_chunk, action_dim)


def greedy_generate(
    model,
    params,
    input_ids: jnp.ndarray,
    prompt_len: jnp.ndarray,
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Causal autoregressive decode on a Qwen2Model.

    input_ids: (B, T) pre-padded buffer with T >= max(prompt_len) +
    max_new_tokens. Returns the filled buffer. Stops writing past EOS per
    sequence (subsequent slots keep the pad value).
    """
    batch = input_ids.shape[0]
    variables = _variables(params)

    def step_fn(carry, i):
        ids, done = carry
        pos = prompt_len + i  # next slot per sequence
        valid = (jnp.arange(ids.shape[1])[None, :] < pos[:, None]).astype(jnp.int32)
        out = model.apply(
            variables, input_ids=ids, valid=valid, causal=True,
            compute_logits=True,
        )
        # logits at the last valid position predict the next token
        last = jnp.take_along_axis(
            out["logits"], (pos - 1)[:, None, None], axis=1
        )[:, 0]  # (B, V)
        if temperature > 0 and rng is not None:
            tok = jax.random.categorical(
                jax.random.fold_in(rng, i), last / temperature, axis=-1
            )
        else:
            tok = jnp.argmax(last, axis=-1)
        tok = tok.astype(ids.dtype)
        write = ~done
        ids = ids.at[jnp.arange(batch), pos].set(
            jnp.where(write, tok, ids[jnp.arange(batch), pos])
        )
        if eos_token_id is not None:
            done = done | (tok == eos_token_id)
        return (ids, done), None

    done0 = jnp.zeros((batch,), bool)
    (ids, _), _ = jax.lax.scan(
        step_fn, (input_ids, done0), jnp.arange(max_new_tokens)
    )
    return ids


def greedy_generate_cached(
    model,
    params,
    input_ids: jnp.ndarray,
    prompt_len: int,
    max_new_tokens: int,
    eos_token_id: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """KV-cached autoregressive decode (one prefill + O(1)-context steps).

    input_ids: (B, T) with a UNIFORM prompt length `prompt_len` (int) and
    T >= prompt_len + max_new_tokens. ~S/1 cheaper per step than
    :func:`greedy_generate`'s full recompute. HF-cache-equivalent: verified
    token-exact against transformers' cached generate in tests.
    """
    batch, total = input_ids.shape
    variables = _variables(params)
    prompt = input_ids[:, :prompt_len]
    out = model.apply(
        variables, input_ids=prompt,
        valid=jnp.ones((batch, prompt_len), jnp.int32), causal=True,
        compute_logits=True, return_kv=True,
    )
    k, v = out["kv_cache"]  # (L, B, S, Hkv, Dh)
    pad = total - prompt_len
    k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    first_logits = out["logits"][:, prompt_len - 1]

    def pick(logits, i):
        if temperature > 0 and rng is not None:
            return jax.random.categorical(
                jax.random.fold_in(rng, i), logits / temperature, axis=-1
            )
        return jnp.argmax(logits, axis=-1)

    from vla_adapter_tpu.models.qwen2 import Qwen2Decode

    decoder = Qwen2Decode(model.cfg, model.rt)

    def step_fn(carry, i):
        ids, kv_k, kv_v, logits, done = carry
        tok = pick(logits, i).astype(ids.dtype)
        pos = prompt_len + i
        write = ~done
        ids = ids.at[:, pos].set(jnp.where(write, tok, ids[:, pos]))
        next_logits, (kv_k, kv_v) = decoder.apply(
            variables, tok[:, None], (kv_k, kv_v), pos
        )
        if eos_token_id is not None:
            done = done | (tok == eos_token_id)
        return (ids, kv_k, kv_v, next_logits, done), None

    done0 = jnp.zeros((batch,), bool)
    (ids, _, _, _, _), _ = jax.lax.scan(
        step_fn, (input_ids, k, v, first_logits, done0),
        jnp.arange(max_new_tokens),
    )
    return ids


def predict_action_autoregressive(
    vlm,
    params,
    input_ids: jnp.ndarray,
    text_valid: jnp.ndarray,
    pixel_values: jnp.ndarray,
    prompt_len: jnp.ndarray,
    action_tokenizer,
    action_dim: int,
) -> np.ndarray:
    """The native-OpenVLA action path (reference vlas/openvla.py:24-134):
    autoregressively greedy-decode `action_dim` action tokens from a
    PrismaticVLM (causal, token objective) and detokenize via bin centers.
    Superseded by the parallel bidirectional path, kept for parity."""
    b, t = input_ids.shape

    def step_fn(carry, i):
        ids, valid = carry
        out = vlm.apply(
            {"params": params}, input_ids=ids, text_valid=valid,
            pixel_values=pixel_values, compute_logits=True,
        )
        pos = prompt_len + i
        last = jnp.take_along_axis(out["logits"], (pos - 1)[:, None, None],
                                   axis=1)[:, 0]
        tok = jnp.argmax(last, axis=-1).astype(ids.dtype)
        ids = ids.at[jnp.arange(b), pos].set(tok)
        valid = valid.at[jnp.arange(b), pos].set(1)
        return (ids, valid), tok

    (_, _), toks = jax.lax.scan(
        step_fn, (input_ids, text_valid), jnp.arange(action_dim)
    )
    token_ids = np.asarray(toks).T  # (B, action_dim)
    return action_tokenizer.decode_token_ids_to_actions(token_ids)
