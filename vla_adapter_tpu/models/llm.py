"""LLM-family dispatch: config dataclass -> decoder module class.

The VLM/VLA wiring is family-agnostic — every decoder exposes
``embed_tokens`` plus the ``__call__(inputs_embeds, valid, causal,
output_hidden_states, compute_logits)`` contract returning
{last_hidden_state, hidden_states?, logits?}. Reference equivalent:
prismatic/models/materialize.py:56-84 mapping llm_backbone ids to
backbone classes.
"""

from __future__ import annotations

from vla_adapter_tpu.core.config import PhiConfig, Qwen2Config


def llm_model_class(llm_cfg):
    """Return the decoder nn.Module class for a given LLM config."""
    if isinstance(llm_cfg, PhiConfig):
        from vla_adapter_tpu.models.phi import PhiModel

        return PhiModel
    if isinstance(llm_cfg, Qwen2Config):
        from vla_adapter_tpu.models.qwen2 import Qwen2Model

        return Qwen2Model
    raise TypeError(f"unknown LLM config type {type(llm_cfg).__name__}")
