"""Qwen2-family decoder, TPU-first.

Functionally equivalent to HF ``Qwen2ForCausalLM`` as used by the reference
(reference: config.json `text_config`; prismatic/models/backbones/llm/
qwen25.py) with the OFT-fork twist that attention over the multimodal
sequence may be fully **bidirectional** (see ops/masks.py).

TPU-first choices:
  * layers are stacked with ``nn.scan`` — one compiled layer body instead of
    24 unrolled ones; per-layer hidden states fall out as scan ys (the
    action head consumes hidden states of *every* layer).
  * optional ``jax.checkpoint`` (remat) on the scanned body.
  * attention runs through ops.attention (Pallas fused kernel on TPU).
  * logits are computed only on request (the VLA L1-regression path never
    needs them), and the embedding is tied (lm_head = embed^T).

Weight import from HF checkpoints: weights/convert.py.
"""

from __future__ import annotations

from typing import Optional, Type

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vla_adapter_tpu.core.config import Qwen2Config
from vla_adapter_tpu.models.layers import Dense, RMSNorm, Runtime
from vla_adapter_tpu.ops.attention import dot_product_attention
from vla_adapter_tpu.ops.rope import apply_rope_half, rope_cos_sin


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config
    rt: Runtime

    def setup(self):
        cfg, rt = self.cfg, self.rt
        self.q_proj = Dense(cfg.num_heads * cfg.head_dim,
                            use_bias=cfg.attention_bias, rt=rt)
        self.k_proj = Dense(cfg.num_kv_heads * cfg.head_dim,
                            use_bias=cfg.attention_bias, rt=rt)
        self.v_proj = Dense(cfg.num_kv_heads * cfg.head_dim,
                            use_bias=cfg.attention_bias, rt=rt)
        self.o_proj = Dense(cfg.hidden_size, use_bias=False, rt=rt)

    def _qkv(self, x, layer=None):
        # NOTE (round 4, measured): routing these projections through the
        # stacked scalar-prefetch Pallas matmul (shared input quantization,
        # no per-layer kernel slice) LOSES end to end — b1 9.44 vs 8.83 ms,
        # b2 21.7 vs 15.3 — per-pallas_call overhead plus XLA's lost
        # bias/RoPE/residual epilogue fusion outweigh the ~0.5 ms/fwd of
        # slice/re-tile formatting it removes (BREAKDOWN.md round 4).
        # Attention projections stay on the XLA w8a8 path.
        cfg = self.cfg
        b, s, _ = x.shape
        q = self.q_proj(x, layer).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = self.k_proj(x, layer).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = self.v_proj(x, layer).reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        return q, k, v

    def __call__(self, x, cos, sin, valid, causal: bool, return_kv: bool = False,
                 layer=None):
        cfg, rt = self.cfg, self.rt
        b, s, _ = x.shape
        q, k, v = self._qkv(x, layer)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        out = dot_product_attention(q, k, v, valid, causal=causal, impl=rt.attn_impl)
        out = self.o_proj(out.reshape(b, s, cfg.num_heads * cfg.head_dim), layer)
        if return_kv:
            return out, (k, v)  # roped k — directly cacheable
        return out

    def decode_step(self, x, k_cache, v_cache, pos, layer=None):
        """Single-token cached attention.

        x: (B, 1, D); k_cache/v_cache: (B, max_len, Hkv, Dh); pos: scalar
        position of the new token. Returns (out, k_cache, v_cache).
        """
        cfg = self.cfg
        b = x.shape[0]
        q, k, v = self._qkv(x, layer)
        cos, sin = rope_cos_sin(
            1, cfg.head_dim, cfg.rope_theta, dtype=x.dtype,
            positions=jnp.array([pos]),
        )
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        k_cache = jax.lax.dynamic_update_slice(k_cache, k, (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, v, (0, pos, 0, 0))
        # grouped attention directly against the (B, max, Hkv, Dh) cache —
        # no O(S*H) jnp.repeat materialization per decoded token
        groups = cfg.num_heads // cfg.num_kv_heads
        qg = q.reshape(b, 1, cfg.num_kv_heads, groups, cfg.head_dim)
        s = jnp.einsum("bqhgd,bkhd->bhgqk", qg.astype(jnp.float32),
                       k_cache.astype(jnp.float32)) * cfg.head_dim ** -0.5
        mask = jnp.arange(k_cache.shape[1])[None, None, None, None, :] <= pos
        s = jnp.where(mask, s, -2.0e9)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhgqk,bkhd->bqhgd", p, v_cache.astype(jnp.float32))
        out = out.astype(x.dtype).reshape(b, 1, cfg.num_heads * cfg.head_dim)
        return self.o_proj(out, layer), k_cache, v_cache


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config
    rt: Runtime

    def setup(self):
        cfg, rt = self.cfg, self.rt
        self.gate_proj = Dense(cfg.intermediate_size, use_bias=False, rt=rt)
        self.up_proj = Dense(cfg.intermediate_size, use_bias=False, rt=rt)
        self.down_proj = Dense(cfg.hidden_size, use_bias=False, rt=rt)

    def __call__(self, x, layer=None):
        cfg, rt = self.cfg, self.rt
        if (rt.weights_int8 and rt.act_int8 and rt.stacked_serving
                and rt.stacked_layers > 0 and layer is not None
                and min(cfg.hidden_size, cfg.intermediate_size)
                >= rt.act_int8_min_dim):
            # Whole-MLP fused kernel: the (M, F) gate/up/silu*mul
            # intermediates stay in VMEM (ops/pallas_fused_mlp.py) instead
            # of round-tripping HBM between the three dots.
            from vla_adapter_tpu.ops.pallas_fused_mlp import (
                w8a8_gated_mlp_stacked,
            )

            # F stored lane-aligned (see layers.py _stacked_qkernel; Qwen2's
            # 4864 already is — this only pads odd custom geometries)
            fp = -(-cfg.intermediate_size // 128) * 128
            gq, gs, _ = self.gate_proj(x, layer, stacked_weights_only=True,
                                       pad_out_to=fp)
            uq, us, _ = self.up_proj(x, layer, stacked_weights_only=True,
                                     pad_out_to=fp)
            dq, dsc, _ = self.down_proj(
                jnp.zeros((1, cfg.intermediate_size), x.dtype), layer,
                stacked_weights_only=True, pad_in_to=fp)
            lead = x.shape[:-1]
            return w8a8_gated_mlp_stacked(
                x.reshape(-1, cfg.hidden_size), gq, gs, uq, us, dq, dsc,
                layer, act="silu", out_dtype=rt.dtype,
            ).reshape(*lead, cfg.hidden_size)
        # checkpoint_name tags the two FLOPs-heavy up-projections so the
        # "mlp_saved" remat policy (layers.remat_policy) can save exactly
        # these in the backward: recomputing them is ~90% of a layer's
        # recompute FLOPs, while storing them is cheap at micro-batch sizes.
        gate = checkpoint_name(self.gate_proj(x, layer), "mlp_wide")
        up = checkpoint_name(self.up_proj(x, layer), "mlp_wide")
        return self.down_proj(nn.silu(gate) * up, layer)


class Qwen2DecoderLayer(nn.Module):
    cfg: Qwen2Config
    rt: Runtime

    def setup(self):
        cfg, rt = self.cfg, self.rt
        self.input_layernorm = RMSNorm(cfg.rms_norm_eps, rt=rt)
        self.self_attn = Qwen2Attention(cfg, rt)
        self.post_attention_layernorm = RMSNorm(cfg.rms_norm_eps, rt=rt)
        self.mlp = Qwen2MLP(cfg, rt)

    def __call__(self, x, cos, sin, valid, causal: bool,
                 return_kv: bool = False, layer=None):
        rt = self.rt
        if (rt.w8a8_impl == "mega" and rt.stacked_layers > 0
                and layer is not None and not return_kv):
            return self._mega(x, cos, sin, valid, causal, layer)
        if (self.rt.remat and self.rt.policy_for("llm") == "attn_only"
                and "llm" in self.rt.remat_components and not return_kv):
            # Structural remat: checkpoint ONLY the attention half; the MLP
            # (~75% of the layer's FLOPs at 896/4864) stays saved. Same
            # save/recompute split "mlp_saved" aims for, without the named
            # checkpoint policy that blows up XLA compile time inside the
            # layer scan (core/config.py remat notes). The outer scan wrap
            # in Qwen2Model is skipped for this policy.
            def attn_delta(mdl, h):
                return mdl.self_attn(h, cos, sin, valid, causal,
                                     return_kv=False, layer=layer)

            h = self.input_layernorm(x)
            x = x + nn.remat(attn_delta)(self, h)
            h = self.post_attention_layernorm(x)
            return x + self.mlp(h, layer)
        h = self.input_layernorm(x)
        attn = self.self_attn(h, cos, sin, valid, causal, return_kv=return_kv,
                              layer=layer)
        if return_kv:
            attn, kv = attn
        x = x + attn
        h = self.post_attention_layernorm(x)
        out = x + self.mlp(h, layer)
        return (out, kv) if return_kv else out

    def _mega(self, x, cos, sin, valid, causal, layer):
        """Whole-layer megakernel path (ops/pallas_megalayer.py): the XLA
        prologue (norm1 + q/k/v + RoPE — measured round 4 to beat stacked
        hand kernels) feeds ONE pallas_call that runs attention, the
        o-projection, the post-attention norm, and the gated MLP with every
        intermediate in VMEM. Batch-1 bidirectional serving only: the
        kernel folds batch into the token axis and attends across all rows,
        so b > 1 would cross-attend between examples."""
        from vla_adapter_tpu.ops.pallas_megalayer import (
            w8a8_qwen2_layer_stacked,
        )

        cfg, rt = self.cfg, self.rt
        b, s, d = x.shape
        assert b == 1, (
            "w8a8_impl='mega' is a batch-1 serving kernel; build the model "
            "with 'fused'/'xla' (or the batch-keyed 'auto') for batch > 1")
        assert not causal, "mega kernel implements the bidirectional mode"
        h = self.input_layernorm(x)
        q, k, v = self.self_attn._qkv(h, layer)          # (1, S, H(kv), Dh)
        from vla_adapter_tpu.ops.rope import apply_rope_half

        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        hkv, g = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads
        qk = q[0].transpose(1, 0, 2).reshape(hkv, g, s, cfg.head_dim)
        kk = k[0].transpose(1, 0, 2)                     # (Hkv, S, Dh)
        vk = v[0].transpose(1, 0, 2)
        if valid is None:
            bias = jnp.zeros((s,), jnp.float32)
        else:
            bias = jnp.where(valid[0] > 0, 0.0, -2.0e9).astype(jnp.float32)
        n2 = self.post_attention_layernorm(x, scale_only=True)
        oq, osc, _ = self.self_attn.o_proj(
            jnp.zeros((1, cfg.num_heads * cfg.head_dim), x.dtype), layer,
            stacked_weights_only=True)
        fp = -(-cfg.intermediate_size // 128) * 128
        gq, gs, _ = self.mlp.gate_proj(
            jnp.zeros((1, d), x.dtype), layer, stacked_weights_only=True,
            pad_out_to=fp)
        uq, us, _ = self.mlp.up_proj(
            jnp.zeros((1, d), x.dtype), layer, stacked_weights_only=True,
            pad_out_to=fp)
        dq, dsc, _ = self.mlp.down_proj(
            jnp.zeros((1, cfg.intermediate_size), x.dtype), layer,
            stacked_weights_only=True, pad_in_to=fp)
        out = w8a8_qwen2_layer_stacked(
            x[0], qk, kk, vk, bias, n2, oq, osc, gq, gs, uq, us, dq, dsc,
            layer, num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
            eps=cfg.rms_norm_eps, out_dtype=rt.dtype)
        return out[None]

    def decode_step(self, x, k_cache, v_cache, pos, layer=None):
        if self.rt.w8a8_impl == "mega":
            raise NotImplementedError(
                "w8a8_impl='mega' serves the batch-1 VLA forward only; the "
                "cached decode path stores the o-projection in the params "
                "collection — use 'fused' or 'xla' for generation")
        h = self.input_layernorm(x)
        attn, k_cache, v_cache = self.self_attn.decode_step(
            h, k_cache, v_cache, pos, layer
        )
        x = x + attn
        h = self.post_attention_layernorm(x)
        return x + self.mlp(h, layer), k_cache, v_cache


class _ScanBody(nn.Module):
    """Adapter giving nn.scan the (carry, y) protocol around a decoder layer.

    ys = the layer's *input* (stacked == HF hidden_states[0..L-1]) plus,
    when return_kv, the layer's roped (k, v) for cache prefill.
    """

    cfg: Qwen2Config
    rt: Runtime
    causal: bool
    layer_cls: Type[nn.Module]
    return_kv: bool = False

    @nn.compact
    def __call__(self, carry, layer_idx, cos, sin, valid):
        out = self.layer_cls(self.cfg, self.rt, name="layer")(
            carry, cos, sin, valid, self.causal, self.return_kv, layer_idx
        )
        if self.return_kv:
            out, kv = out
            return out, (carry, kv)
        return out, carry


class _DecodeScanBody(nn.Module):
    """Scan body for single-token cached decoding: carry = hidden state,
    xs/ys = the per-layer KV cache."""

    cfg: Qwen2Config
    rt: Runtime

    @nn.compact
    def __call__(self, carry, layer_idx, k_cache, v_cache, pos):
        layer = Qwen2DecoderLayer(self.cfg, self.rt, name="layer")
        out, k_cache, v_cache = layer.decode_step(
            carry, k_cache, v_cache, pos, layer_idx)
        return out, (k_cache, v_cache)


class Qwen2Model(nn.Module):
    """Decoder stack.

    Returns a dict with:
      last_hidden_state: (B, S, D) — final-norm applied
      hidden_states: (B, L+1, S, D) — HF convention: index 0 = embeddings,
        i in 1..L-1 = output of layer i (pre final norm), index L =
        norm(layer L output). The action head indexes entries 1..L
        (reference action_heads.py:117-118).
      logits: (B, S, vocab) — only if compute_logits=True (tied embedding).
    """

    cfg: Qwen2Config
    rt: Runtime = Runtime()

    def setup(self):
        # Defined in setup (not compact) so `embed_tokens` below is callable
        # from outside __call__ — the VLA model embeds text, splices in the
        # action queries and vision patches, then runs the decoder on the
        # result while keeping the table tied for the lm head.
        self.embed = nn.Embed(
            self.cfg.vocab_size,
            self.cfg.hidden_size,
            dtype=self.rt.dtype,
            param_dtype=self.rt.param_dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, S) ids -> (B, S, D) embeddings (shared/tied table)."""
        return self.embed(input_ids)

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        valid: Optional[jnp.ndarray] = None,
        causal: bool = True,
        positions: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
        compute_logits: bool = False,
        return_kv: bool = False,
    ):
        cfg, rt = self.cfg, self.rt
        if rt.stacked_serving:
            # Stacked w8a8 serving: Denses inside the scan keep their int8
            # kernels as the full (L, in, out) stack in the broadcast
            # "qstack" collection (models/layers.py) — the scan slices
            # nothing; the Pallas kernel indexes layers in HBM.
            import dataclasses as _dc

            rt = _dc.replace(rt, stacked_layers=cfg.num_layers)
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = inputs_embeds.astype(rt.dtype)
        seq_len = x.shape[1]

        cos, sin = rope_cos_sin(
            seq_len, cfg.head_dim, cfg.rope_theta, dtype=rt.dtype, positions=positions
        )

        layer_cls: Type[nn.Module] = Qwen2DecoderLayer
        if (rt.remat and "llm" in rt.remat_components
                and rt.policy_for("llm") != "attn_only"):
            from vla_adapter_tpu.models.layers import remat_policy

            layer_cls = nn.remat(
                Qwen2DecoderLayer,
                static_argnums=(5, 6),
                policy=remat_policy(rt, "llm"),
            )

        scanned = nn.scan(
            _ScanBody,
            variable_axes={"params": 0},
            variable_broadcast="qstack",
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(cfg=cfg, rt=rt, causal=causal, layer_cls=layer_cls,
          return_kv=return_kv, name="layers")
        x, ys = scanned(x, jnp.arange(cfg.num_layers, dtype=jnp.int32),
                        cos, sin, valid)
        if return_kv:
            per_layer_inputs, kv = ys
        else:
            per_layer_inputs = ys

        final = RMSNorm(cfg.rms_norm_eps, rt=rt, name="norm")(x)

        out = {"last_hidden_state": final}
        if output_hidden_states:
            hs = jnp.moveaxis(per_layer_inputs, 0, 1)          # (B, L, S, D)
            hs = jnp.concatenate([hs, final[:, None]], axis=1)  # (B, L+1, S, D)
            out["hidden_states"] = hs
        if compute_logits:
            out["logits"] = self.embed.attend(final)  # tied lm head
        if return_kv:
            out["kv_cache"] = kv  # (k, v) each (L, B, S, Hkv, Dh), k roped
        return out


class Qwen2Decode(nn.Module):
    """KV-cached single-token decode twin of :class:`Qwen2Model`.

    Same param tree by construction (embed / layers/layer / norm) — apply it
    with the params initialized by Qwen2Model. One cached step:

      input_ids: (B, 1) new token ids; kv_cache: (k, v) each
      (L, B, max_len, Hkv, Dh) with roped k; pos: scalar write/attend
      position. The attention mask is position <= pos with NO per-sequence
      validity, so every cached slot below pos must be a REAL token: batched
      decode requires a uniform TRUE prompt length (models/generate.py
      greedy_generate_cached enforces this — prefill runs with all-valid).
      Ragged prompts must use the uncached greedy_generate, which masks per
      sequence; right-padding ragged prompts into this path would bake the
      pads into the cache as attended context. Returns (logits (B, vocab),
      new kv_cache).
    """

    cfg: Qwen2Config
    rt: Runtime = Runtime()

    def setup(self):
        self.embed = nn.Embed(
            self.cfg.vocab_size,
            self.cfg.hidden_size,
            dtype=self.rt.dtype,
            param_dtype=self.rt.param_dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )

    @nn.compact
    def __call__(self, input_ids, kv_cache, pos):
        cfg, rt = self.cfg, self.rt
        if rt.stacked_serving:
            # mirror Qwen2Model: the scan's Denses read their int8 kernels
            # from the broadcast "qstack" stacks, indexed by layer_idx
            import dataclasses as _dc

            rt = _dc.replace(rt, stacked_layers=cfg.num_layers)
        x = self.embed(input_ids).astype(rt.dtype)
        scanned = nn.scan(
            _DecodeScanBody,
            variable_axes={"params": 0},
            variable_broadcast="qstack",
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=(0, 0, 0, nn.broadcast),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(cfg=cfg, rt=rt, name="layers")
        x, kv_cache = scanned(x, jnp.arange(cfg.num_layers, dtype=jnp.int32),
                              kv_cache[0], kv_cache[1], pos)
        final = RMSNorm(cfg.rms_norm_eps, rt=rt, name="norm")(x)
        return self.embed.attend(final)[:, 0], kv_cache
