"""Bridge-attention action head (the VLA-Adapter contribution).

Re-implements reference prismatic/models/action_heads.py as scanned flax
modules. Architecture (reference lines cited per class):

  L1RegressionActionHead.predict_action (action_heads.py:43-81):
    input: per-layer VLM hidden states stacked (B, L+1, 512+64, D)
           (512 "task" positions = [token0 + vision patches], 64 action-query
           positions; see models/vla.py for the extraction quirks)
    chunk latents: zeros (B, chunk, action_dim*D) (+ fresh N(0, 0.02) noise
           each training step — reference `learnable_random_perturbations`
           is re-created per call and never optimizer-registered, i.e. pure
           noise injection, action_heads.py:14-17,69-72)
    24 blocks, block i conditioned on hidden-state entry i+1
           (action_heads.py:117-118)

  Block (original, action_heads.py:168-283): one shared q/k/v/o projection;
    keys/values = [self(chunk), adapter(64 action states + 1 proprio token),
    task(512)]; a zero-init tanh gate scales the *task*-stream logits;
    softmax over the concatenated logits; then x = ffn(attn_out + x) where
    ffn = LN -> Linear -> ReLU (NOTE: no second residual — faithful).

  Block (Pro, action_heads.py:287-410): separate K/V per stream, RoPE
    applied per stream (interleaved-pair rotation with duplicated-halves
    cos/sin table — see ops/rope.py), same gate on the task stream, same
    ffn. The reference's dead `film_gen` branch is dropped (checkpoint
    ingestion ignores those params).

TPU-first layout (round-2 perf restructure, measured on v5e): the task- and
adapter-stream K/V projections do not depend on the evolving chunk latents,
so they are hoisted OUT of the sequential block scan and computed for all
24 layers in single batched einsums (models/layers.BatchedDense) — the
in-scan matmuls were far below MXU-efficient sizes (8-585 rows) and ran the
head at 0.15 MFU. Param layout: the hoisted projections live at
``action_head/{k_task,v_task,k_adapter,v_adapter}`` (Pro) or
``action_head/{k_proj,v_proj}`` (original) with stacked (L, in, out)
kernels; weight converters map the reference's per-block torch params to
these stacks (weights/convert.py / weights/export.py round-trip).

All three K/V streams are concatenated into a single attention so the MXU
sees one (chunk x 577) score matrix per head per block.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vla_adapter_tpu.core.config import ActionHeadConfig
from vla_adapter_tpu.models.layers import (
    BatchedDense,
    Dense,
    LayerNorm,
    Runtime,
)
from vla_adapter_tpu.ops.rope import apply_rope_interleaved, interleaved_cos_sin


def _heads(t: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, S, D) -> (B, H, S, d)."""
    b, s, _ = t.shape
    return t.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def _heads_batched(t: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, L, S, D) -> (B, L, H, S, d)."""
    b, l, s, _ = t.shape
    return t.reshape(b, l, s, num_heads, -1).transpose(0, 1, 3, 2, 4)


def _merge(t: jnp.ndarray) -> jnp.ndarray:
    """(B, H, S, d) -> (B, S, D)."""
    b, h, s, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _rope_batched(t: jnp.ndarray, base: float) -> jnp.ndarray:
    """Interleaved RoPE over the second-to-last (position) axis.

    The rotation runs in t's dtype (tables computed in fp32, then cast):
    upcasting the full 24-layer K streams to fp32 would move ~150 MB extra
    through HBM per forward for rounding that bf16 activations cannot
    retain anyway. fp32 runtimes (CPU parity tests) are unaffected."""
    cos, sin = interleaved_cos_sin(t.shape[-2], t.shape[-1], base,
                                   dtype=jnp.float32)
    return apply_rope_interleaved(t, cos.astype(t.dtype), sin.astype(t.dtype))


class _BridgeBlockBase(nn.Module):
    cfg: ActionHeadConfig
    rt: Runtime

    def _attend(self, q, streams, gate_on_last: jnp.ndarray):
        """q: (B,H,T,d); streams: [(k, v), ...] with gate applied to the
        last stream's logits. Returns (B, T, D)."""
        d = q.shape[-1]
        logits = []
        values = []
        for i, (k, v) in enumerate(streams):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            if i == len(streams) - 1:
                s = s * gate_on_last
            logits.append(s)
            values.append(v)
        scores = jnp.concatenate(logits, axis=-1) / jnp.sqrt(
            jnp.asarray(d, jnp.float32)
        ).astype(q.dtype)
        p = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, jnp.concatenate(values, axis=2))
        return _merge(out)

    def _ffn(self, x):
        h = LayerNorm(rt=self.rt, eps=1e-5, name="ffn_norm")(x)
        h = Dense(self.cfg.hidden_dim, rt=self.rt, name="ffn_fc")(h)
        return nn.relu(h)


class BridgeBlock(_BridgeBlockBase):
    """Original block: shared q/k/v projections across streams. The shared
    k/v kernels live at head level (stacked); this block receives its
    layer's precomputed adapter/task k/v plus the raw kernel slices (+ the
    per-out-channel dequant scales — ones in float mode) to project the
    (evolving) self stream. The scale applies to the matmul OUTPUT
    ((x @ Wq) * s == x @ (Wq * s) exactly for per-column s), so in int8
    serving the kernel stacks stream from HBM at 1 byte/weight — the
    whole point of weights_int8 — instead of being dequantized to a full
    bf16 copy outside the scan."""

    @nn.compact
    def __call__(self, x, k_adapter, v_adapter, k_task, v_task,
                 k_kernel, k_scale, k_bias, v_kernel, v_scale, v_bias):
        cfg, rt = self.cfg, self.rt
        H = cfg.num_attn_heads
        gate = self.param("gating_factor", nn.initializers.zeros, (1,), rt.param_dtype)
        ratio_g = jnp.tanh(gate.astype(rt.dtype))

        q = _heads(Dense(cfg.hidden_dim, rt=rt, name="q_proj")(x), H)
        xc = x.astype(rt.dtype)
        k_self = _heads((xc @ k_kernel.astype(rt.dtype))
                        * k_scale.astype(rt.dtype)
                        + k_bias.astype(rt.dtype), H)
        v_self = _heads((xc @ v_kernel.astype(rt.dtype))
                        * v_scale.astype(rt.dtype)
                        + v_bias.astype(rt.dtype), H)
        streams = [(k_self, v_self), (k_adapter, v_adapter), (k_task, v_task)]
        out = self._attend(q, streams, ratio_g)
        out = Dense(cfg.hidden_dim, rt=rt, name="o_proj")(out)
        return self._ffn(out + x)


class BridgeBlockPro(_BridgeBlockBase):
    """Pro block: per-stream K/V; adapter/task streams arrive precomputed
    (+RoPE'd); the self stream projects + ropes the evolving latents here."""

    @nn.compact
    def __call__(self, x, k_adapter, v_adapter, k_task, v_task):
        cfg, rt = self.cfg, self.rt
        H = cfg.num_attn_heads

        gate = self.param("gating_factor", nn.initializers.zeros, (1,), rt.param_dtype)
        ratio_g = jnp.tanh(gate.astype(rt.dtype))

        q = _heads(Dense(cfg.hidden_dim, rt=rt, name="q_proj")(x), H)
        k_self = _heads(Dense(cfg.hidden_dim, rt=rt, name="k_self")(x), H)
        v_self = _heads(Dense(cfg.hidden_dim, rt=rt, name="v_self")(x), H)
        q = _rope_batched(q, cfg.rope_base)
        k_self = _rope_batched(k_self, cfg.rope_base)

        streams = [(k_self, v_self), (k_adapter, v_adapter), (k_task, v_task)]
        out = self._attend(q, streams, ratio_g)
        out = Dense(cfg.hidden_dim, rt=rt, name="o_proj")(out)
        return self._ffn(out + x)


class _BlockScan(nn.Module):
    """Scan body: carry = chunk latents, xs = per-layer precomputed streams
    (+, original variant, the shared k/v kernel slices for the self stream)."""

    cfg: ActionHeadConfig
    rt: Runtime

    @nn.compact
    def __call__(self, carry, *xs):
        cls = BridgeBlockPro if self.cfg.use_pro_version else BridgeBlock
        if self.rt.remat and "head" in self.rt.remat_components:
            from vla_adapter_tpu.models.layers import remat_policy

            cls = nn.remat(cls, policy=remat_policy(self.rt, "head"))
        out = cls(self.cfg, self.rt, name="block")(carry, *xs)
        return out, None


class L1RegressionActionHead(nn.Module):
    """Regress the normalized action chunk from per-layer VLM hidden states.

    __call__ args:
      hidden_states: (B, L+1, num_task_tokens + num_action_tokens, D)
      proprio_features: (B, 1, D) — already projected (models/projector.py)
      train: adds fresh N(0, train_noise_std) to the zero chunk latents
             (requires a "noise" rng)
    Returns (B, num_actions_chunk, action_dim) in rt.dtype.
    """

    cfg: ActionHeadConfig
    action_dim: int
    num_actions_chunk: int
    num_task_tokens: int = 512
    rt: Runtime = Runtime()

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        proprio_features: Optional[jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        cfg, rt = self.cfg, self.rt
        b = hidden_states.shape[0]
        llm_dim = hidden_states.shape[-1]
        num_blocks = cfg.num_blocks
        H = cfg.num_attn_heads

        h_task = hidden_states[:, 1 : num_blocks + 1, : self.num_task_tokens]
        h_action = hidden_states[:, 1 : num_blocks + 1, self.num_task_tokens :]
        if proprio_features is not None:
            # proprio token appended to the action-state stream per block
            # (reference action_heads.py:347: cat((h_a, p), dim=1))
            p = jnp.broadcast_to(
                proprio_features[:, None],
                (b, num_blocks, 1, llm_dim),
            ).astype(rt.dtype)
            h_adapter = jnp.concatenate([h_action.astype(rt.dtype), p], axis=2)
        else:
            h_adapter = h_action.astype(rt.dtype)
        h_task = h_task.astype(rt.dtype)

        # hoisted stream projections: all layers in one einsum each
        def batched(name, x):
            return _heads_batched(
                BatchedDense(cfg.hidden_dim, num_blocks, rt=rt, name=name)(x),
                H,
            )

        if cfg.use_pro_version:
            k_adapter = batched("k_adapter", h_adapter)
            v_adapter = batched("v_adapter", h_adapter)
            k_task = batched("k_task", h_task)
            v_task = batched("v_task", h_task)
            k_adapter = _rope_batched(k_adapter, cfg.rope_base)
            k_task = _rope_batched(k_task, cfg.rope_base)
            xs = (k_adapter, v_adapter, k_task, v_task)
            scan_in_axes = (1, 1, 1, 1)
        else:
            k_bd = BatchedDense(cfg.hidden_dim, num_blocks, rt=rt, name="k_proj")
            v_bd = BatchedDense(cfg.hidden_dim, num_blocks, rt=rt, name="v_proj")
            k_adapter = _heads_batched(k_bd(h_adapter), H)
            v_adapter = _heads_batched(v_bd(h_adapter), H)
            k_task = _heads_batched(k_bd(h_task), H)
            v_task = _heads_batched(v_bd(h_task), H)
            xs = (k_adapter, v_adapter, k_task, v_task)
            scan_in_axes = (1, 1, 1, 1)

        x = jnp.zeros(
            (b, self.num_actions_chunk, self.action_dim * llm_dim), rt.dtype
        )
        if train and cfg.train_noise_std > 0:
            noise = cfg.train_noise_std * jax.random.normal(
                self.make_rng("noise"), x.shape[1:], jnp.float32
            )
            x = x + noise.astype(rt.dtype)

        x = LayerNorm(rt=rt, eps=1e-5, name="input_norm")(x)
        x = Dense(cfg.hidden_dim, rt=rt, name="fc_in")(x)
        x = nn.relu(x)

        if not cfg.use_pro_version:
            # pass kernel slices (+ dequant scales) through the scan for the
            # self stream; the per-layer dequant happens inside the block so
            # int8 kernels stream as 1 byte/weight
            k_params = self.get_variable("params", "k_proj")
            v_params = self.get_variable("params", "v_proj")
            if self.rt.weights_int8:
                k_kernels, v_kernels = k_params["kernel_q"], v_params["kernel_q"]
                k_scales = k_params["kernel_scale"]
                v_scales = v_params["kernel_scale"]
            else:
                k_kernels, v_kernels = k_params["kernel"], v_params["kernel"]
                k_scales = jnp.ones((num_blocks, cfg.hidden_dim), rt.dtype)
                v_scales = k_scales  # exact: x1.0 is the identity
            xs = xs + (k_kernels, k_scales, k_params["bias"],
                       v_kernels, v_scales, v_params["bias"])
            scan_in_axes = scan_in_axes + (0, 0, 0, 0, 0, 0)

        scanned = nn.scan(
            _BlockScan,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=num_blocks,
            in_axes=scan_in_axes,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(cfg=cfg, rt=rt, name="blocks")
        x, _ = scanned(x, *xs)

        x = LayerNorm(rt=rt, eps=1e-5, name="out_norm")(x)
        return Dense(self.action_dim, rt=rt, name="fc_out")(x)
