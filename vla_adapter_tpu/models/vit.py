"""Vision transformers (DINOv2-reg4 / SigLIP variants), TPU-first.

Replicates the timm `VisionTransformer` semantics the reference relies on
(reference: modeling_prismatic.py:120-144 creates timm towers and
monkey-patches forward to ``get_intermediate_layers(n={len(blocks)-2})``):

  * patch conv -> (B, N, E) tokens
  * positional embedding: added to patch tokens only when
    ``pos_embed_patches_only`` (timm `no_embed_class`, the DINOv2-reg4
    convention), else to the full token sequence (SigLIP);
    cls + register tokens are prepended after/before accordingly
  * pre-norm blocks with optional LayerScale
  * the feature tap is the raw output of block ``feature_layer``
    (second-to-last by default) with **no final norm** and prefix tokens
    stripped — exactly timm's ``get_intermediate_layers`` default.

TPU-first deviation: blocks after the tap are never executed — the
reference runs the full tower and discards everything past the tap (timm
`_intermediate_layers` loops over all blocks). We simply do not materialize
those parameters (weights/convert.py drops them on import), saving one
block of FLOPs and memory per tower with bit-identical outputs.

Blocks are stacked with ``nn.scan`` (single compiled body).
"""

from __future__ import annotations

from typing import Optional, Type

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vla_adapter_tpu.core.config import ViTConfig
from vla_adapter_tpu.models.layers import Dense, LayerNorm, Runtime, activation
from vla_adapter_tpu.ops.attention import dot_product_attention


class ViTAttention(nn.Module):
    cfg: ViTConfig
    rt: Runtime

    @nn.compact
    def __call__(self, x, layer=None):
        # Attention projections stay on the XLA w8a8 path: the stacked
        # Pallas matmul variant was measured slower end to end (see
        # Qwen2Attention._qkv note; BREAKDOWN.md round 4).
        cfg, rt = self.cfg, self.rt
        b, n, _ = x.shape
        h, d = cfg.num_heads, cfg.head_dim
        q = Dense(h * d, use_bias=cfg.qkv_bias, rt=rt, name="q_proj")(x, layer)
        k = Dense(h * d, use_bias=cfg.qkv_bias, rt=rt, name="k_proj")(x, layer)
        v = Dense(h * d, use_bias=cfg.qkv_bias, rt=rt, name="v_proj")(x, layer)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        out = dot_product_attention(q, k, v, None, causal=False, impl=rt.attn_impl)
        out = out.reshape(b, n, h * d)
        return Dense(cfg.hidden_size, rt=rt, name="out_proj")(out, layer)


class ViTMLP(nn.Module):
    cfg: ViTConfig
    rt: Runtime

    @nn.compact
    def __call__(self, x, layer=None):
        cfg, rt = self.cfg, self.rt
        fc1 = Dense(cfg.mlp_dim, rt=rt, name="fc1")
        fc2 = Dense(cfg.hidden_size, rt=rt, name="fc2")
        if (rt.weights_int8 and rt.act_int8 and rt.stacked_serving
                and rt.stacked_layers > 0 and layer is not None
                and min(cfg.hidden_size, cfg.mlp_dim)
                >= rt.act_int8_min_dim):
            # Whole-MLP fused kernel: the (M, F) fc1/activation
            # intermediate stays in VMEM (ops/pallas_fused_mlp.py) instead
            # of round-tripping HBM between the two dots. Handles the
            # ragged so400m mlp_dim (4304) by masking the padded panel.
            from vla_adapter_tpu.ops.pallas_fused_mlp import w8a8_mlp_stacked

            # store the hidden (F) dim lane-aligned: so400m's 4304 would
            # otherwise be re-laid-out by XLA on every call (layers.py
            # _stacked_qkernel)
            fp = -(-cfg.mlp_dim // 128) * 128
            q1, s1, b1 = fc1(x, layer, stacked_weights_only=True,
                             pad_out_to=fp)
            q2, s2, b2 = fc2(jnp.zeros((1, cfg.mlp_dim), x.dtype), layer,
                             stacked_weights_only=True, pad_in_to=fp)
            lead = x.shape[:-1]
            return w8a8_mlp_stacked(
                x.reshape(-1, cfg.hidden_size), q1, s1, b1, q2, s2, b2,
                layer, act=cfg.mlp_activation, out_dtype=rt.dtype,
            ).reshape(*lead, cfg.hidden_size)
        # Tagged for the "mlp_saved" remat policy (see models/layers.py):
        # the 4x-wide fc1 output is the block's dominant recompute cost.
        x = checkpoint_name(fc1(x, layer), "mlp_wide")
        x = activation(cfg.mlp_activation)(x)
        return fc2(x, layer)


class LayerScale(nn.Module):
    rt: Runtime
    # timm/DINOv2 init value (e.g. 1e-5): near-identity residual branches
    # at from-scratch init. Loaded checkpoints overwrite it either way.
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value),
            (x.shape[-1],), self.rt.param_dtype
        )
        return x * gamma.astype(self.rt.dtype)


class ViTBlock(nn.Module):
    """Pre-norm block; with cfg.film_llm_dim set, FiLM modulation
    x*(1+gamma)+beta is applied between the attention and MLP sublayers
    (reference film_vit_wrapper.py:57-80: zero-perturbation at init since
    the scale/shift projections start near zero)."""

    cfg: ViTConfig
    rt: Runtime

    @nn.compact
    def __call__(self, x, lang: Optional[jnp.ndarray] = None, layer=None):
        cfg, rt = self.cfg, self.rt

        def attn_delta(mdl, h):
            a = ViTAttention(cfg, rt, name="attn")(h, layer)
            if cfg.layer_scale_init is not None:
                a = LayerScale(rt, cfg.layer_scale_init, name="ls1")(a)
            return a

        if (rt.remat and rt.policy_for("vit") == "attn_only"
                and "vit" in rt.remat_components):
            # Structural remat (see Qwen2DecoderLayer): only the attention
            # sublayer recomputes in the backward; the 4x-wide MLP stays
            # saved. The outer block wrap below is skipped for this policy.
            h = nn.remat(attn_delta)(
                self, LayerNorm(cfg.layernorm_eps, rt=rt, name="norm1")(x))
        else:
            h = attn_delta(
                self, LayerNorm(cfg.layernorm_eps, rt=rt, name="norm1")(x))
        x = x + h
        if cfg.film_llm_dim is not None:
            assert lang is not None, "FiLM block needs a language embedding"
            # zero-init projections (bias is zero too): FiLM starts as the
            # identity so finetuning perturbs the pretrained features from
            # zero, as the docstring promises (lecun_normal here would
            # apply an O(1) random modulation in every block at step 0)
            zeros = nn.initializers.zeros
            gamma = Dense(cfg.hidden_size, rt=rt, kernel_init=zeros,
                          name="film_scale")(lang, layer)
            beta = Dense(cfg.hidden_size, rt=rt, kernel_init=zeros,
                         name="film_shift")(lang, layer)
            x = x * (1.0 + gamma[:, None, :]) + beta[:, None, :]
        h = ViTMLP(cfg, rt, name="mlp")(
            LayerNorm(cfg.layernorm_eps, rt=rt, name="norm2")(x), layer
        )
        if cfg.layer_scale_init is not None:
            h = LayerScale(rt, cfg.layer_scale_init, name="ls2")(h)
        return x + h


class _BlockScanBody(nn.Module):
    cfg: ViTConfig
    rt: Runtime
    block_cls: Type[nn.Module]

    @nn.compact
    def __call__(self, carry, layer_idx, lang):
        return self.block_cls(self.cfg, self.rt, name="block")(
            carry, lang, layer_idx), None


class VisionTransformer(nn.Module):
    """Feature extractor: images (B, H, W, 3) NHWC -> (B, N_patches, E).

    The returned features are the tap described in the module docstring.
    """

    cfg: ViTConfig
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 lang: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg, rt = self.cfg, self.rt
        b = images.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=rt.dtype,
            param_dtype=rt.param_dtype,
            name="patch_embed",
        )(images.astype(rt.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)  # (B, N, E) row-major == timm flatten

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.num_patches if cfg.pos_embed_patches_only
             else cfg.num_patches + cfg.num_prefix_tokens, cfg.hidden_size),
            rt.param_dtype,
        )

        prefix = []
        if cfg.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size),
                rt.param_dtype,
            )
            prefix.append(jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)))
        if cfg.num_register_tokens:
            reg = self.param(
                "reg_token",
                nn.initializers.zeros,
                (1, cfg.num_register_tokens, cfg.hidden_size),
                rt.param_dtype,
            )
            prefix.append(
                jnp.broadcast_to(reg, (b, cfg.num_register_tokens, cfg.hidden_size))
            )

        if cfg.pos_embed_patches_only:
            x = x + pos_embed.astype(rt.dtype)
            if prefix:
                x = jnp.concatenate(
                    [jnp.concatenate(prefix, axis=1).astype(rt.dtype), x], axis=1
                )
        else:
            if prefix:
                x = jnp.concatenate(
                    [jnp.concatenate(prefix, axis=1).astype(rt.dtype), x], axis=1
                )
            x = x + pos_embed.astype(rt.dtype)

        if cfg.pre_norm:
            x = LayerNorm(cfg.layernorm_eps, rt=rt, name="norm_pre")(x)

        if cfg.film_llm_dim is not None and lang is not None:
            lang = lang.astype(rt.dtype)

        block_cls = ViTBlock
        if (rt.remat and "vit" in rt.remat_components
                and rt.policy_for("vit") != "attn_only"):
            from vla_adapter_tpu.models.layers import remat_policy

            block_cls = nn.remat(ViTBlock, policy=remat_policy(rt, "vit"))

        num_blocks = cfg.resolved_feature_layer + 1
        if rt.stacked_serving:
            # Stacked w8a8 serving: see Qwen2Model — block Denses keep the
            # full int8 stack in the broadcast "qstack" collection.
            import dataclasses as _dc

            rt = _dc.replace(rt, stacked_layers=num_blocks)
        scanned = nn.scan(
            _BlockScanBody,
            variable_axes={"params": 0},
            variable_broadcast="qstack",
            split_rngs={"params": True},
            length=num_blocks,
            in_axes=(0, nn.broadcast),
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(cfg=cfg, rt=rt, block_cls=block_cls, name="blocks")
        x, _ = scanned(x, jnp.arange(num_blocks, dtype=jnp.int32), lang)

        return x[:, cfg.num_prefix_tokens:]
