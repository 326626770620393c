"""Phi-2 decoder, TPU-first.

Functional equivalent of HF ``PhiForCausalLM`` as selected by the
reference's LLM-backbone registry (reference:
prismatic/models/backbones/llm/phi.py — `phi-2-3b` -> microsoft/phi-2).
This closes the one LLM family the rebuild previously documented as
unsupported.

Architecture (differs from the Qwen2/LLaMA family in models/qwen2.py):
  * LayerNorm with bias (not RMSNorm).
  * PARALLEL blocks: attention and MLP both consume the same
    ``input_layernorm(x)`` and their outputs are summed with the residual —
    ``x = x + attn(ln(x)) + mlp(ln(x))`` (no post-attention norm).
  * Partial rotary embeddings: only the first
    ``rotary_dim = head_dim * partial_rotary_factor`` dims of q/k rotate
    (NeoX half layout); the rest pass through.
  * MHA (no GQA); q/k/v/dense all carry biases; MLP = fc1 -> gelu(tanh) ->
    fc2; untied lm_head with bias.

Same TPU-first choices as the Qwen2 module: nn.scan-stacked layers (one
compiled body), per-layer hidden states as scan ys, attention through
ops.attention (Pallas/XLA dispatch), logits only on request.

Interface-compatible with Qwen2Model so PrismaticVLM and the VLA wiring can
host either family (models/llm.py dispatches on the config type).
"""

from __future__ import annotations

from typing import Optional, Type

import flax.linen as nn
import jax.numpy as jnp

from vla_adapter_tpu.core.config import PhiConfig
from vla_adapter_tpu.models.layers import Dense, LayerNorm, Runtime, gelu
from vla_adapter_tpu.ops.attention import dot_product_attention
from vla_adapter_tpu.ops.rope import apply_rope_half, rope_cos_sin


class PhiAttention(nn.Module):
    cfg: PhiConfig
    rt: Runtime

    @nn.compact
    def __call__(self, x, cos, sin, valid, causal: bool):
        cfg, rt = self.cfg, self.rt
        b, s, _ = x.shape
        q = Dense(cfg.num_heads * cfg.head_dim, rt=rt, name="q_proj")(x)
        k = Dense(cfg.num_heads * cfg.head_dim, rt=rt, name="k_proj")(x)
        v = Dense(cfg.num_heads * cfg.head_dim, rt=rt, name="v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = k.reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = v.reshape(b, s, cfg.num_heads, cfg.head_dim)

        r = cfg.rotary_dim
        q = jnp.concatenate(
            [apply_rope_half(q[..., :r], cos, sin), q[..., r:]], axis=-1
        )
        k = jnp.concatenate(
            [apply_rope_half(k[..., :r], cos, sin), k[..., r:]], axis=-1
        )
        out = dot_product_attention(q, k, v, valid, causal=causal,
                                    impl=rt.attn_impl)
        out = out.reshape(b, s, cfg.num_heads * cfg.head_dim)
        return Dense(cfg.hidden_size, rt=rt, name="dense")(out)


class PhiDecoderLayer(nn.Module):
    """Parallel attention + MLP over one shared pre-LN."""

    cfg: PhiConfig
    rt: Runtime

    @nn.compact
    def __call__(self, x, cos, sin, valid, causal: bool):
        cfg, rt = self.cfg, self.rt
        h = LayerNorm(eps=cfg.layer_norm_eps, rt=rt, name="input_layernorm")(x)
        attn = PhiAttention(cfg, rt, name="self_attn")(h, cos, sin, valid, causal)
        ff = Dense(cfg.intermediate_size, rt=rt, name="fc1")(h)
        ff = Dense(cfg.hidden_size, rt=rt, name="fc2")(gelu(ff, approximate=True))
        return x + attn + ff


class _PhiScanBody(nn.Module):
    cfg: PhiConfig
    rt: Runtime
    causal: bool
    layer_cls: Type[nn.Module]

    @nn.compact
    def __call__(self, carry, cos, sin, valid):
        out = self.layer_cls(self.cfg, self.rt, name="layer")(
            carry, cos, sin, valid, self.causal
        )
        return out, carry  # ys = layer *inputs* (HF hidden_states[0..L-1])


class PhiModel(nn.Module):
    """Decoder stack — same return contract as models/qwen2.Qwen2Model:
    {last_hidden_state, hidden_states?, logits?} with hidden_states
    (B, L+1, S, D) in the HF convention (index 0 = embeddings, index L =
    final-norm output)."""

    cfg: PhiConfig
    rt: Runtime = Runtime()

    def setup(self):
        self.embed = nn.Embed(
            self.cfg.vocab_size,
            self.cfg.hidden_size,
            dtype=self.rt.dtype,
            param_dtype=self.rt.param_dtype,
            embedding_init=nn.initializers.normal(stddev=0.02),
        )

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
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
            seq_len, cfg.rotary_dim, cfg.rope_theta, dtype=rt.dtype,
            positions=positions,
        )

        layer_cls: Type[nn.Module] = PhiDecoderLayer
        if rt.remat and "llm" in rt.remat_components:
            from vla_adapter_tpu.models.layers import remat_policy

            layer_cls = nn.remat(
                PhiDecoderLayer, static_argnums=(5,), policy=remat_policy(rt)
            )

        scanned = nn.scan(
            _PhiScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(cfg=cfg, rt=rt, causal=causal, layer_cls=layer_cls, name="layers")
        x, per_layer_inputs = scanned(x, cos, sin, valid)

        final = LayerNorm(eps=cfg.layer_norm_eps, rt=rt,
                          name="final_layernorm")(x)

        out = {"last_hidden_state": final}
        if output_hidden_states:
            hs = jnp.moveaxis(per_layer_inputs, 0, 1)
            out["hidden_states"] = jnp.concatenate(
                [hs, final[:, None]], axis=1
            )
        if compute_logits:
            out["logits"] = Dense(cfg.vocab_size, rt=rt, name="lm_head")(final)
        return out
