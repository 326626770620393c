"""PrismaticVLM — the plain vision-language model (no action machinery).

The reference's native stack (prismatic/models/vlms/prismatic.py): fused
ViT -> projector -> causal LLM, with a multimodal next-token objective and
autoregressive generation. Used for VLM pretraining (align / finetune
stages, reference scripts/pretrain.py) and as the base the VLA is built
from. Shares every submodule with models/vla.py — the multimodal layout is
identical ([text token 0 | patches | text 1:]); the differences are causal
attention and a CE objective instead of action queries + L1.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.core.constants import IGNORE_INDEX
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.llm import llm_model_class
from vla_adapter_tpu.models.projector import FusedProjector, Projector
from vla_adapter_tpu.models.vla import FusedVisionBackbone


class PrismaticVLM(nn.Module):
    cfg: VLAConfig
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        text_valid: jnp.ndarray,
        pixel_values: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        compute_logits: bool = True,
    ) -> Dict[str, Any]:
        """Multimodal causal forward.

        pixel_values None -> unimodal language forward (the reference
        supports mixed align-stage batches the same way,
        vlms/prismatic.py:312-481).
        Returns logits in *original text coordinates* and, when labels are
        given, the CE loss over non-IGNORE positions.
        """
        cfg, rt = self.cfg, self.rt
        llm = llm_model_class(cfg.llm)(cfg.llm, rt, name="language_model")
        text_embeds = llm.embed_tokens(input_ids)
        text_valid = text_valid.astype(jnp.bool_)

        if pixel_values is not None:
            patches = FusedVisionBackbone(cfg, rt, name="vision_backbone")(
                pixel_values
            )
            proj_cls = FusedProjector if cfg.vision.fused is not None else Projector
            projected = proj_cls(cfg.llm.hidden_size, rt=rt, name="projector")(
                patches
            )
            num_patches = projected.shape[1]
            embeds = jnp.concatenate(
                [text_embeds[:, :1], projected.astype(rt.dtype),
                 text_embeds[:, 1:]], axis=1,
            )
            b = input_ids.shape[0]
            valid = jnp.concatenate(
                [text_valid[:, :1],
                 jnp.ones((b, num_patches), jnp.bool_),
                 text_valid[:, 1:]], axis=1,
            )
        else:
            num_patches = 0
            embeds, valid = text_embeds, text_valid

        out = llm(
            inputs_embeds=embeds, valid=valid, causal=True,
            compute_logits=compute_logits or labels is not None,
        )
        result: Dict[str, Any] = {"last_hidden_state": out["last_hidden_state"]}
        if "logits" in out:
            logits = out["logits"]
            if num_patches:
                # back to text coordinates for the HF-shifted CE. Text
                # position 0's logit must be the LAST PATCH position's
                # (multimodal index num_patches): under the shift it
                # predicts the first post-image text token, exactly like
                # the reference's full-multimodal-sequence shift-CE where
                # that token is predicted from the final patch. Keeping
                # multimodal position 0 here instead would train the first
                # supervised token image-blind.
                logits = logits[:, num_patches:]
            result["logits"] = logits
            if labels is not None:
                result["loss"] = multimodal_ce_loss(logits, labels, text_valid)
        return result


def multimodal_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """HF-shifted CE over non-IGNORE label positions."""
    import jax

    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX) & valid[:, 1:].astype(bool)
    safe = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
