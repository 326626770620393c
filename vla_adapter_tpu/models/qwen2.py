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

from vla_adapter_tpu.core.config import Qwen2Config
from vla_adapter_tpu.models.layers import Dense, RMSNorm, Runtime
from vla_adapter_tpu.ops.attention import dot_product_attention
from vla_adapter_tpu.ops.rope import apply_rope_half, rope_cos_sin


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config
    rt: Runtime

    @nn.compact
    def __call__(self, x, cos, sin, valid, causal: bool):
        cfg, rt = self.cfg, self.rt
        b, s, _ = x.shape
        q = Dense(cfg.num_heads * cfg.head_dim, use_bias=cfg.attention_bias,
                  rt=rt, name="q_proj")(x)
        k = Dense(cfg.num_kv_heads * cfg.head_dim, use_bias=cfg.attention_bias,
                  rt=rt, name="k_proj")(x)
        v = Dense(cfg.num_kv_heads * cfg.head_dim, use_bias=cfg.attention_bias,
                  rt=rt, name="v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope_half(q, cos, sin)
        k = apply_rope_half(k, cos, sin)
        out = dot_product_attention(q, k, v, valid, causal=causal, impl=rt.attn_impl)
        out = out.reshape(b, s, cfg.num_heads * cfg.head_dim)
        return Dense(cfg.hidden_size, use_bias=False, rt=rt, name="o_proj")(out)


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config
    rt: Runtime

    @nn.compact
    def __call__(self, x):
        cfg, rt = self.cfg, self.rt
        gate = Dense(cfg.intermediate_size, use_bias=False, rt=rt, name="gate_proj")(x)
        up = Dense(cfg.intermediate_size, use_bias=False, rt=rt, name="up_proj")(x)
        return Dense(cfg.hidden_size, use_bias=False, rt=rt, name="down_proj")(
            nn.silu(gate) * up
        )


class Qwen2DecoderLayer(nn.Module):
    cfg: Qwen2Config
    rt: Runtime

    @nn.compact
    def __call__(self, x, cos, sin, valid, causal: bool):
        cfg, rt = self.cfg, self.rt
        h = RMSNorm(cfg.rms_norm_eps, rt=rt, name="input_layernorm")(x)
        x = x + Qwen2Attention(cfg, rt, name="self_attn")(h, cos, sin, valid, causal)
        h = RMSNorm(cfg.rms_norm_eps, rt=rt, name="post_attention_layernorm")(x)
        x = x + Qwen2MLP(cfg, rt, name="mlp")(h)
        return x


class _ScanBody(nn.Module):
    """Adapter giving nn.scan the (carry, y) protocol around a decoder layer.

    y = the layer's *input*, so stacked ys == HF hidden_states[0..L-1]
    (embeddings followed by layer outputs 1..L-1).
    """

    cfg: Qwen2Config
    rt: Runtime
    causal: bool
    layer_cls: Type[nn.Module]

    @nn.compact
    def __call__(self, carry, cos, sin, valid):
        out = self.layer_cls(self.cfg, self.rt, name="layer")(
            carry, cos, sin, valid, self.causal
        )
        return out, carry


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
    ):
        cfg, rt = self.cfg, self.rt
        if inputs_embeds is None:
            inputs_embeds = self.embed(input_ids)
        x = inputs_embeds.astype(rt.dtype)
        seq_len = x.shape[1]

        cos, sin = rope_cos_sin(
            seq_len, cfg.head_dim, cfg.rope_theta, dtype=rt.dtype, positions=positions
        )

        layer_cls: Type[nn.Module] = Qwen2DecoderLayer
        if rt.remat:
            layer_cls = nn.remat(
                Qwen2DecoderLayer,
                static_argnums=(5,),
                policy=jax.checkpoint_policies.nothing_saveable,
            )

        scanned = nn.scan(
            _ScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(cfg=cfg, rt=rt, causal=causal, layer_cls=layer_cls, name="layers")
        x, per_layer_inputs = scanned(x, cos, sin, valid)

        final = RMSNorm(cfg.rms_norm_eps, rt=rt, name="norm")(x)

        out = {"last_hidden_state": final}
        if output_hidden_states:
            hs = jnp.moveaxis(per_layer_inputs, 0, 1)          # (B, L, S, D)
            hs = jnp.concatenate([hs, final[:, None]], axis=1)  # (B, L+1, S, D)
            out["hidden_states"] = hs
        if compute_logits:
            out["logits"] = self.embed.attend(final)  # tied lm head
        return out
