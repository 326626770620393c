"""Projector MLPs.

* :class:`FusedProjector` — vision->LLM space (reference:
  modeling_prismatic.py:242-273, fused variant: 2176 -> 4*2176 -> 896 -> 896
  with GELUs between).
* :class:`Projector` — single-tower variant (fc1 -> GELU -> fc2).
* :class:`ProprioProjector` — proprio -> LLM dim (reference:
  projectors.py:6-25: fc1 -> GELU -> fc2).
* :class:`NoisyActionProjector` — per-token noisy action (diffusion path,
  off in released configs; reference projectors.py:28-50).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vla_adapter_tpu.models.layers import Dense, Runtime, gelu


class FusedProjector(nn.Module):
    """Fused dual-tower projector: vision_dim -> 4*vision_dim -> llm -> llm."""

    llm_dim: int
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        vision_dim = patches.shape[-1]
        x = Dense(4 * vision_dim, rt=self.rt, name="fc1")(patches)
        x = gelu(x, approximate=False)
        x = Dense(self.llm_dim, rt=self.rt, name="fc2")(x)
        x = gelu(x, approximate=False)
        return Dense(self.llm_dim, rt=self.rt, name="fc3")(x)


class Projector(nn.Module):
    """Single-tower projector: vision_dim -> llm -> llm with one GELU."""

    llm_dim: int
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.llm_dim, rt=self.rt, name="fc1")(patches)
        x = gelu(x, approximate=False)
        return Dense(self.llm_dim, rt=self.rt, name="fc2")(x)


class ProprioProjector(nn.Module):
    """proprio (B, P) -> (B, llm_dim)."""

    llm_dim: int
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, proprio: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.llm_dim, rt=self.rt, name="fc1")(proprio.astype(self.rt.dtype))
        x = gelu(x, approximate=False)
        return Dense(self.llm_dim, rt=self.rt, name="fc2")(x)


class NoisyActionProjector(nn.Module):
    """noisy action scalars (B, T, 1) -> (B, T, llm_dim)."""

    llm_dim: int
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, noisy_actions: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.llm_dim, rt=self.rt, name="fc1")(
            noisy_actions.astype(self.rt.dtype)
        )
        x = gelu(x, approximate=False)
        return Dense(self.llm_dim, rt=self.rt, name="fc2")(x)
