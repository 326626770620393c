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

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vla_adapter_tpu.models.layers import Dense, Runtime, gelu


def _use_fused_mlp(rt: Runtime, in_dim: int, hidden_dim: int,
                   out_dim: int) -> bool:
    """Whether this projector MLP should run as ONE Pallas kernel
    (ops/pallas_fused_mlp.py) under the "fused" w8a8 serving backend.

    The projector is not inside a scan, so unlike ViTMLP/Qwen2MLP it
    gates only on the serving mode and on every matmul clearing
    act_int8_min_dim (below it the XLA path would not be w8a8 either, and
    the kernel has no bf16-upcast fallback)."""
    return (rt.weights_int8 and rt.act_int8 and rt.stacked_serving
            and min(in_dim, hidden_dim, out_dim) >= rt.act_int8_min_dim)


def _fused_mlp(fc1: Dense, fc2: Dense, x: jnp.ndarray, hidden_dim: int,
               out_dim: int, rt: Runtime) -> jnp.ndarray:
    """act(x @ fc1 + b1) @ fc2 + b2 as one whole-MLP Pallas kernel.

    The (M, hidden) intermediate stays in VMEM — at the flagship shapes
    the projector's (512, 8704) GELU midsection is ~17 MB of HBM traffic
    per forward on the XLA path (VERDICT r4 item 3). The projector has no
    layer axis; its qstack is declared with a leading L=1 stack axis so
    the kernel's scalar-prefetch layer indexing degenerates to layer 0."""
    from vla_adapter_tpu.ops.pallas_fused_mlp import w8a8_mlp_stacked

    in_dim = x.shape[-1]
    # lane-align the hidden storage (layers._stacked_qkernel rationale)
    fp = -(-hidden_dim // 128) * 128
    q1, s1, b1 = fc1(x, 0, stacked_weights_only=True, pad_out_to=fp)
    q2, s2, b2 = fc2(jnp.zeros((1, hidden_dim), x.dtype), 0,
                     stacked_weights_only=True, pad_in_to=fp)
    lead = x.shape[:-1]
    return w8a8_mlp_stacked(
        x.reshape(-1, in_dim), q1, s1, b1, q2, s2, b2,
        jnp.zeros((), jnp.int32), act="gelu", out_dtype=rt.dtype,
    ).reshape(*lead, out_dim)


class FusedProjector(nn.Module):
    """Fused dual-tower projector: vision_dim -> 4*vision_dim -> llm -> llm."""

    llm_dim: int
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(self, patches: jnp.ndarray) -> jnp.ndarray:
        vision_dim = patches.shape[-1]
        if _use_fused_mlp(self.rt, vision_dim, 4 * vision_dim, self.llm_dim):
            srt = dataclasses.replace(self.rt, stacked_layers=1)
            x = _fused_mlp(Dense(4 * vision_dim, rt=srt, name="fc1"),
                           Dense(self.llm_dim, rt=srt, name="fc2"),
                           patches, 4 * vision_dim, self.llm_dim, self.rt)
        else:
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
        vision_dim = patches.shape[-1]
        if _use_fused_mlp(self.rt, vision_dim, self.llm_dim, self.llm_dim):
            srt = dataclasses.replace(self.rt, stacked_layers=1)
            return _fused_mlp(Dense(self.llm_dim, rt=srt, name="fc1"),
                              Dense(self.llm_dim, rt=srt, name="fc2"),
                              patches, self.llm_dim, self.llm_dim, self.rt)
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
