"""Fused w8a8 transformer-MLP kernel for TPU (Pallas).

Motivation (BREAKDOWN.md, measured on v5e): the batch-1 w8a8 serving
residual is fusion-bound — ~1.8 ms/forward of "elementwise" HLO fusions,
dominated by MLP midsections. In the XLA backend each MLP materializes its
wide intermediates in HBM: the gate and up dots write (M, F) bf16 tensors,
the silu*mul(+quant) fusion reads both back and writes the quantized (M, F)
int8 input of the down projection. At the flagship shapes that is ~20 MB of
HBM traffic per LLM layer and ~14 MB per ViT layer that exists only because
XLA cannot fuse across MXU ops.

This kernel runs the ENTIRE MLP in one pallas_call so nothing wider than
the (M, D) output ever touches HBM. One grid step per block_f-wide column
group of the hidden dimension F:

  * step 0 quantizes x per token once into VMEM scratch;
  * every step streams this group's (K, TF) gate/up panels and (TF, D)
    down panel from the layer-stacked HBM buffers (scalar-prefetch layer
    indexing, as w8a8_matmul_stacked), int8-dots, dequantizes, applies the
    activation (* up for the gated variant), re-quantizes the (M, TF)
    group in-register, and immediately accumulates its down-projection
    contribution: acc += int8_dot(h_g, down_g) * h_scale_g;
  * the final step applies the per-out-channel down scale (+bias) and
    writes the single (M, D) output block.

Numerics vs the XLA w8a8 path: identical int8 weights and per-token input
quantization; the down projection's input is quantized per (token,
TF-column-group) instead of per token over the full F axis — a strictly
finer granularity (validated against fp32 in tests and by
models/quantize.forward_error_report).

Ragged shapes (so400m's F=4304 is not a multiple of the 512 panel) are
handled by masking the padded columns to exact zeros; int8 zeros contribute
exact zeros to the down dot regardless of the padded weight bytes. Batch>1
folds into extra m-blocks (outer grid dimension), reusing the same scratch.

Inference-only (no VJP): every weights_int8 Dense is frozen.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has
    no erf/erfc lowering, and 1.5e-7 is ~5 orders below the int8
    quantization noise this kernel already carries."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel_activation(name: str):
    """Activation by reference name (models/layers.activation twin), using
    only Mosaic-lowerable primitives."""
    if name == "silu":
        return jax.nn.silu
    if name == "gelu":
        return lambda x: 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    raise ValueError(f"unknown activation {name!r}")


def _gated_kernel(act, nf, f_actual, block_f,
                  l_ref, x_ref, gq_ref, gs_ref, uq_ref, us_ref,
                  dq_ref, ds_ref, o_ref, xq_s, rs_s, acc_s):
    _mlp_kernel_body(act, nf, f_actual, block_f, x_ref,
                     gq_ref, gs_ref, uq_ref, us_ref, None,
                     dq_ref, ds_ref, None, o_ref, xq_s, rs_s, acc_s)


def _plain_kernel(act, nf, f_actual, block_f,
                  l_ref, x_ref, gq_ref, gs_ref, b1_ref,
                  dq_ref, ds_ref, b2_ref, o_ref, xq_s, rs_s, acc_s):
    _mlp_kernel_body(act, nf, f_actual, block_f, x_ref,
                     gq_ref, gs_ref, None, None, b1_ref,
                     dq_ref, ds_ref, b2_ref, o_ref, xq_s, rs_s, acc_s)


def _int8_dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)


def _mlp_kernel_body(act, nf, f_actual, block_f, x_ref,
                     gq_ref, gs_ref, uq_ref, us_ref, b1_ref,
                     dq_ref, ds_ref, b2_ref, o_ref, xq_s, rs_s, acc_s):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _quantize_input():
        xf = x_ref[...].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        rs_s[:, 0:1] = scale
        xq_s[...] = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)

    rs = rs_s[:, 0:1]
    g = _int8_dot(xq_s[...], gq_ref[...]).astype(jnp.float32) * rs * gs_ref[...]
    if b1_ref is not None:
        g = g + b1_ref[...]
    if uq_ref is not None:
        u = (_int8_dot(xq_s[...], uq_ref[...]).astype(jnp.float32)
             * rs * us_ref[...])
        h = act(g) * u
    else:
        h = act(g)
    if f_actual % block_f:
        # mask the padded tail columns to EXACT zeros: their weight bytes
        # are unspecified HBM padding and must not reach the scale math or
        # the down dot
        col = t * block_f + jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
        h = jnp.where(col < f_actual, h, 0.0)
    absmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    hscale = jnp.maximum(absmax, 1e-8) / 127.0
    hq = jnp.clip(jnp.round(h / hscale), -127, 127).astype(jnp.int8)
    part = _int8_dot(hq, dq_ref[...]).astype(jnp.float32) * hscale

    @pl.when(t == 0)
    def _():
        acc_s[...] = part

    @pl.when(t > 0)
    def _():
        acc_s[...] = acc_s[...] + part

    @pl.when(t == nf - 1)
    def _write():
        out = acc_s[...] * ds_ref[...]
        if b2_ref is not None:
            out = out + b2_ref[...]
        o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "act", "block_m", "block_f", "out_dtype", "interpret"))
def w8a8_gated_mlp_stacked(
    x: jnp.ndarray,
    gate_q: jnp.ndarray,
    gate_scale: jnp.ndarray,
    up_q: jnp.ndarray,
    up_scale: jnp.ndarray,
    down_q: jnp.ndarray,
    down_scale: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    act: str = "silu",
    block_m: int = 640,
    block_f: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """act(x@gate)*(x@up) @ down, all w8a8, one kernel (Qwen2MLP shape).

    x: (M, K) float; gate_q/up_q: (L, K, F) int8 with (L, F) scales;
    down_q: (L, F, D) int8 with (L, D) scales; layer: int32 scalar.
    """
    return _fused_mlp_call(
        x, gate_q, gate_scale, up_q, up_scale, None,
        down_q, down_scale, None, layer, _kernel_activation(act),
        block_m=block_m, block_f=block_f, out_dtype=out_dtype,
        interpret=interpret)


@functools.partial(jax.jit, static_argnames=(
    "act", "block_m", "block_f", "out_dtype", "interpret"))
def w8a8_mlp_stacked(
    x: jnp.ndarray,
    fc1_q: jnp.ndarray,
    fc1_scale: jnp.ndarray,
    fc1_bias: jnp.ndarray,
    fc2_q: jnp.ndarray,
    fc2_scale: jnp.ndarray,
    fc2_bias: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    act: str = "gelu",
    block_m: int = 640,
    block_f: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """act(x@fc1 + b1) @ fc2 + b2, all w8a8, one kernel (ViTMLP shape).

    Biases are THIS layer's (F,)/(D,) vectors (the scan slices the stacked
    params per iteration; None for bias-free variants); fc1_bias is added
    before the activation inside the kernel, so the quantized
    down-projection input matches the float module's math.
    """
    if fc1_bias is None:
        fc1_bias = jnp.zeros((fc1_q.shape[2],), jnp.float32)
    elif fc1_bias.shape[-1] < fc1_q.shape[2]:
        # the stacked kernel storage may be lane-padded (layers.py
        # _stacked_qkernel) while the bias keeps its true params shape;
        # zero-pad so padded columns stay act(0 + 0) = 0
        fc1_bias = jnp.pad(
            fc1_bias, (0, fc1_q.shape[2] - fc1_bias.shape[-1]))
    if fc2_bias is None:
        fc2_bias = jnp.zeros((fc2_q.shape[2],), jnp.float32)
    return _fused_mlp_call(
        x, fc1_q, fc1_scale, None, None, fc1_bias,
        fc2_q, fc2_scale, fc2_bias, layer, _kernel_activation(act),
        block_m=block_m, block_f=block_f, out_dtype=out_dtype,
        interpret=interpret)


def _fused_mlp_call(x, w1_q, w1_s, up_q, up_s, b1, w2_q, w2_s, b2,
                    layer, act_fn, *, block_m, block_f, out_dtype,
                    interpret):
    if interpret is None:
        # interpret everywhere but real TPU so the CPU fake cluster runs
        # the same code path (matching ops/pallas_matmul.py)
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    num_l, _, f = w1_q.shape
    d = w2_q.shape[2]
    gated = up_q is not None
    block_f = min(block_f, _round_up(f, 128))
    nf = pl.cdiv(f, block_f)
    block_m = min(block_m, _round_up(m, 16))
    grid = (pl.cdiv(m, block_m), nf)

    def wpanel(i, t, l):
        return (l[0], 0, t)

    in_specs = [
        pl.BlockSpec((block_m, k), lambda i, t, l: (i, 0)),       # x
        pl.BlockSpec((None, k, block_f), wpanel),                 # w1_q
        pl.BlockSpec((None, 1, block_f), lambda i, t, l: (l[0], 0, t)),
    ]
    if gated:
        in_specs += [
            pl.BlockSpec((None, k, block_f), wpanel),             # up_q
            pl.BlockSpec((None, 1, block_f), lambda i, t, l: (l[0], 0, t)),
        ]
    else:
        in_specs += [
            pl.BlockSpec((1, block_f), lambda i, t, l: (0, t)),   # b1
        ]
    in_specs += [
        pl.BlockSpec((None, block_f, d), lambda i, t, l: (l[0], t, 0)),
        pl.BlockSpec((None, 1, d), lambda i, t, l: (l[0], 0, 0)),  # w2_s
    ]
    if not gated:
        in_specs += [pl.BlockSpec((1, d), lambda i, t, l: (0, 0))]  # b2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, d), lambda i, t, l: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_m, k), jnp.int8),        # quantized x
            pltpu.VMEM((block_m, 128), jnp.float32),   # per-row x scales
            pltpu.VMEM((block_m, d), jnp.float32),     # down accumulator
        ],
    )
    kernel = (_gated_kernel if gated else _plain_kernel)
    flops = 2 * ((2 if gated else 1) * m * k * f + m * f * d)
    call = pl.pallas_call(
        functools.partial(kernel, act_fn, nf, f, block_f),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + (2 if gated else 1) * k * f + f * d
                            + m * d * jnp.dtype(out_dtype).itemsize),
            transcendentals=m * f,
        ),
    )

    l_arg = jnp.asarray(layer, jnp.int32).reshape(1)
    if gated:
        return call(l_arg, x,
                    w1_q, w1_s.astype(jnp.float32).reshape(num_l, 1, f),
                    up_q, up_s.astype(jnp.float32).reshape(num_l, 1, f),
                    w2_q, w2_s.astype(jnp.float32).reshape(num_l, 1, d))
    return call(l_arg, x,
                w1_q, w1_s.astype(jnp.float32).reshape(num_l, 1, f),
                b1.astype(jnp.float32).reshape(1, f),
                w2_q, w2_s.astype(jnp.float32).reshape(num_l, 1, d),
                b2.astype(jnp.float32).reshape(1, d))
