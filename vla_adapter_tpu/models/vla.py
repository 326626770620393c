"""The full VLA policy model (OpenVLA-style action prediction, TPU-first).

Assembles: fused dual-ViT -> projector -> Qwen2 decoder (bidirectional) ->
per-layer hidden-state taps -> bridge-attention action head.
Functional equivalent of reference modeling_prismatic.py
(PrismaticForConditionalGeneration + OpenVLAForActionPrediction) and the
training-side extraction in finetune.py:394-418.

Fixed-shape design (XLA compiles once):
  * text tokens are padded to ``cfg.max_text_tokens``; each sample carries
    ``prompt_len`` = number of real prompt tokens before the 64-query action
    block. Text layout: [prompt(prompt_len) | 64 action queries | optional
    STOP (inference) | pads].
  * the multimodal sequence is [text token 0 | vision patches | text 1:]
    (reference modeling_prismatic.py:492-495), so its length is
    num_patches + max_text_tokens, static.

Faithfulness quirks replicated deliberately (SURVEY.md section 7.3 —
"match behavior, not intent"):
  * the action-state window the head consumes starts ONE position BEFORE
    the action block: multimodal index ``num_patches + prompt_len - 1``.
    Both reference paths land there — training masks labels[:, 1:]
    (finetune.py:394-409, a one-token shift) and inference slices
    ``NUM_PATCHES + NUM_PROMPT_TOKENS`` with NUM_PROMPT_TOKENS = P-1
    (modeling_prismatic.py:855-858).
  * the "task" stream is multimodal positions [0, num_patches): text token
    0 plus all but the last patch (modeling_prismatic.py:859).
  * attention over the whole sequence is fully bidirectional (OFT fork;
    see ops/masks.py docstring for the evidence).
  * action-query embeddings replace the action-token embeddings
    (modeling_prismatic.py:418-454,628-633); queries are zero-init
    (modeling_prismatic.py:375-376).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.models.action_head import L1RegressionActionHead
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.llm import llm_model_class
from vla_adapter_tpu.models.projector import FusedProjector, Projector, ProprioProjector
from vla_adapter_tpu.models.vit import VisionTransformer


class FusedVisionBackbone(nn.Module):
    """Dual-tower fused backbone over multi-image channel-stacked input.

    pixel_values: (B, num_images, H, W, C) NHWC with C = 6 (primary 3 +
    fused 3) or 3 (single tower). Images are folded into the batch so each
    tower runs ONE big MXU-friendly batch instead of a per-image loop
    (reference loops: modeling_prismatic.py:216-236).
    Output: (B, num_images * patches, primary_dim + fused_dim).
    """

    cfg: VLAConfig
    rt: Runtime

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray,
                 lang: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        vcfg = self.cfg.vision
        b, n_img, h, w, c = pixel_values.shape
        flat = pixel_values.reshape(b * n_img, h, w, c)
        flat_lang = None
        if lang is not None:
            flat_lang = jnp.repeat(lang, n_img, axis=0)  # (B*n, D)

        primary = VisionTransformer(vcfg.primary, self.rt, name="featurizer")(
            flat[..., 0:3], flat_lang
        )
        feats = primary
        if vcfg.fused is not None:
            fused = VisionTransformer(vcfg.fused, self.rt, name="fused_featurizer")(
                flat[..., 3:6], flat_lang
            )
            feats = jnp.concatenate([primary, fused], axis=-1)
        # (B*n, P, E) -> (B, n*P, E): images concatenated on sequence dim
        return feats.reshape(b, n_img * feats.shape[1], feats.shape[2])


class VLAModel(nn.Module):
    """End-to-end VLA policy.

    __call__ inputs (all fixed-shape):
      input_ids:   (B, T_text) int32 — [prompt | 64 queries(any ids) | stop? | pad]
      prompt_len:  (B,) int32 — real prompt tokens before the action block
      text_valid:  (B, T_text) bool/int — True on prompt+queries(+stop)
      pixel_values:(B, num_images, H, W, C) NHWC float
      proprio:     (B, proprio_dim) float or None
      train:       noise injection in the head (needs "noise" rng)

    Returns dict: actions (B, chunk, action_dim) normalized, plus
    hidden_states / logits when requested.
    """

    cfg: VLAConfig
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        prompt_len: jnp.ndarray,
        text_valid: jnp.ndarray,
        pixel_values: jnp.ndarray,
        proprio: Optional[jnp.ndarray] = None,
        train: bool = False,
        return_hidden_states: bool = False,
        compute_logits: bool = False,
        compute_actions: bool = True,
    ) -> Dict[str, Any]:
        cfg, rt = self.cfg, self.rt
        consts = cfg.constants
        num_q = consts.num_action_query_tokens
        num_patches = cfg.num_patches
        b, t_text = input_ids.shape

        # family dispatch (models/llm.py): the VLA wiring only needs the
        # shared decoder contract, so a Phi-backed VLA works identically
        llm = llm_model_class(cfg.llm)(cfg.llm, rt, name="language_model")

        # --- text embeddings (tied table inside the LLM) + query splice ---
        text_embeds = llm.embed_tokens(input_ids)

        action_queries = self.param(
            "action_queries",
            nn.initializers.zeros,
            (num_q, cfg.llm.hidden_size),
            rt.param_dtype,
        )
        q_positions = prompt_len[:, None] + jnp.arange(num_q)[None, :]  # (B, Q)
        batch_idx = jnp.arange(b)[:, None]
        text_embeds = text_embeds.at[batch_idx, q_positions].set(
            jnp.broadcast_to(
                action_queries.astype(rt.dtype), (b, num_q, cfg.llm.hidden_size)
            )
        )

        # --- vision (optional FiLM conditioning on the mean prompt
        # embedding — reference modeling_prismatic.py:610-615) ---
        lang_cond = None
        if cfg.vision.use_film:
            q_mask = jnp.zeros((b, t_text), bool).at[batch_idx, q_positions].set(True)
            lang_mask = text_valid.astype(jnp.float32) * (~q_mask).astype(jnp.float32)
            lang_cond = jnp.sum(
                text_embeds * lang_mask[..., None], axis=1
            ) / jnp.maximum(jnp.sum(lang_mask, axis=1, keepdims=True), 1.0)
        patches = FusedVisionBackbone(cfg, rt, name="vision_backbone")(
            pixel_values, lang_cond
        )
        proj_cls = FusedProjector if cfg.vision.fused is not None else Projector
        projected = proj_cls(cfg.llm.hidden_size, rt=rt, name="projector")(patches)

        # --- multimodal splice: [tok0 | patches | text 1:] ---
        mm_embeds = jnp.concatenate(
            [text_embeds[:, :1], projected.astype(rt.dtype), text_embeds[:, 1:]],
            axis=1,
        )
        patch_valid = jnp.ones((b, num_patches), dtype=jnp.bool_)
        text_valid = text_valid.astype(jnp.bool_)
        mm_valid = jnp.concatenate(
            [text_valid[:, :1], patch_valid, text_valid[:, 1:]], axis=1
        )

        # compute_actions=False (token-objective training): skip the
        # 25-layer hidden-state stack and the 24-block bridge head entirely
        # — their outputs would be discarded — and, for tied-embedding
        # LLMs, compute logits only at text positions (the ~512 patch
        # positions' logits are sliced away anyway; at the 151936 vocab
        # that is ~80% of the lm-head matmul).
        tied = getattr(cfg.llm, "tie_word_embeddings", False)
        fast_logits = compute_logits and not compute_actions and tied
        llm_out = llm(
            inputs_embeds=mm_embeds,
            valid=mm_valid,
            causal=not cfg.bidirectional_attention,
            output_hidden_states=compute_actions,
            compute_logits=compute_logits and not fast_logits,
        )

        out: Dict[str, Any] = {}
        if compute_actions:
            hs = llm_out["hidden_states"]  # (B, L+1, S_mm, D)

            # --- extraction (see module docstring for the off-by-one) ---
            task_states = hs[:, :, :num_patches]
            action_start = num_patches + prompt_len - 1  # (B,)
            gather_idx = action_start[:, None] + jnp.arange(num_q)[None, :]
            action_states = jnp.take_along_axis(
                hs, gather_idx[:, None, :, None], axis=2
            )  # (B, L+1, Q, D)
            head_input = jnp.concatenate([task_states, action_states], axis=2)

            # --- head ---
            head_rt = rt
            if rt.train_base_int8:
                # int8-frozen-base training quantizes only the FROZEN
                # stacks (vit/llm/projector); the fully-trainable head and
                # proprio projector keep float kernels and exact gradients.
                import dataclasses as _dc

                head_rt = _dc.replace(rt, weights_int8=False,
                                      act_int8=False, train_base_int8=False)
            proprio_features = None
            if cfg.use_proprio and proprio is not None:
                proprio_features = ProprioProjector(
                    cfg.llm.hidden_size, rt=head_rt, name="proprio_projector"
                )(proprio)[:, None, :]

            out["actions"] = L1RegressionActionHead(
                cfg.head,
                action_dim=consts.action_dim,
                num_actions_chunk=consts.num_actions_chunk,
                num_task_tokens=num_patches,
                rt=head_rt,
                name="action_head",
            )(head_input, proprio_features, train=train)
            if return_hidden_states:
                out["hidden_states"] = head_input
        if compute_logits:
            # text-region logits in text coordinates for the discrete-token
            # objective. Text position 0 takes the LAST PATCH position's
            # logit (multimodal index num_patches) so the HF shift predicts
            # the first post-image token from an image-aware position —
            # matching the reference's full-sequence shift-CE (see
            # models/vlm.py for the derivation). Positions >= 1 are the
            # text1: region either way.
            if fast_logits:
                last = llm_out["last_hidden_state"]
                out["logits"] = llm.embed.attend(last[:, num_patches:])
            else:
                out["logits"] = llm_out["logits"][:, num_patches:]
        return out
