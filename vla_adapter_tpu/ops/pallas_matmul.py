"""Fused w8a8 matmul kernel for TPU (Pallas).

The serving-mode Dense (models/layers.py W8A8 branch) computes
``dequant(int8_dot(quant(x), kernel_q))``. XLA already fuses the per-token
activation quantization into the producer's epilogue and the dequant
outer-product into the dot's epilogue, but the per-op breakdown
(BREAKDOWN.md, measured v5e) shows these small-row serving dots run at only
~50-75% of the int8 roofline: at batch-1 VLA shapes (512-640 activation
rows) the weight-streaming DMA and the MXU do not overlap well in XLA's
schedule.

This kernel is the hand-pipelined version: the quantized activations stay
resident in VMEM across the whole grid while weight columns stream in
block_n-wide slices, double-buffered by the Pallas pipeline, and the
int32->bf16 dequant epilogue runs on the block before it leaves VMEM. The
contraction (K) is unblocked — every VLA serving shape fits a full
(block_m, K) int8 activation panel and a (K, block_n) weight panel in VMEM
simultaneously.

Replaces nothing in the reference (its CUDA path serves bf16); this is a
TPU-specific optimization of the framework's own w8a8 serving mode.

STATUS (round 4): both kernels here measured SLOWER than XLA end to end
(plain 73.7 / stacked 85.9 vs XLA 110.2 chunks/s at batch 1 — BREAKDOWN.md:
the hand kernels forfeit XLA's cross-op epilogue fusion) and were demoted
out of the model dispatch (models/layers.Runtime.w8a8_impl is now
{xla, fused, auto}). They remain here as (a) the numerical oracle chain for
the winning whole-MLP kernel (ops/pallas_fused_mlp.py reuses the stacked
scalar-prefetch layout and is tested against these in tests/test_ops.py)
and (b) the probe surface (tools/probes/w8a8_kernel_probe.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8a8_kernel(xq_ref, rs_ref, wq_ref, ws_ref, o_ref):
    """One (m-block, n-block) cell.

    xq_ref: (block_m, K) int8 — quantized activations (resident across j)
    rs_ref: (block_m, 1) f32 — per-row activation scales
    wq_ref: (K, block_n) int8 — weight panel
    ws_ref: (1, block_n) f32 — per-column weight scales
    o_ref:  (block_m, block_n) — output in the caller's dtype
    """
    acc = jax.lax.dot_general(
        xq_ref[...],
        wq_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        acc.astype(jnp.float32) * rs_ref[...] * ws_ref[...]
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _w8a8_stacked_kernel(l_ref, xq_ref, rs_ref, wq_ref, ws_ref, o_ref):
    """Same cell math as _w8a8_kernel; the layer index l_ref is consumed by
    the BlockSpec index_maps (scalar prefetch), not by the body."""
    del l_ref
    _w8a8_kernel(xq_ref, rs_ref, wq_ref, ws_ref, o_ref)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def w8a8_matmul_stacked(
    xq: jnp.ndarray,
    row_scale: jnp.ndarray,
    kernel_q: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    layer: jnp.ndarray,
    *,
    block_m: int = 640,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """w8a8_matmul against ONE layer of a scan-stacked weight array.

    kernel_q: (L, K, N) int8; kernel_scale: (L, N) f32; layer: int32 scalar
    selecting the layer. The layer index rides Pallas scalar prefetch and is
    applied inside the weight BlockSpec index_maps, so weight panels are
    DMA'd straight out of the stacked HBM buffer — no (K, N) dynamic-slice
    copy materializes per scan iteration (the per-layer re-tiling pass the
    device trace attributes ~0.4 ms/forward to; BREAKDOWN.md).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = xq.shape
    n = kernel_q.shape[2]
    block_m = min(block_m, _round_up(m, 32))
    block_n = min(block_n, _round_up(n, 128))
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j, l: (i, 0)),
            pl.BlockSpec((block_m, 1), lambda i, j, l: (i, 0)),
            pl.BlockSpec((None, k, block_n), lambda i, j, l: (l[0], 0, j)),
            pl.BlockSpec((None, 1, block_n), lambda i, j, l: (l[0], 0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, l: (i, j)),
    )
    return pl.pallas_call(
        _w8a8_stacked_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=xq.size + k * n
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        xq,
        row_scale.astype(jnp.float32),
        kernel_q,
        kernel_scale.astype(jnp.float32).reshape(kernel_q.shape[0], 1, n),
    )


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def w8a8_matmul(
    xq: jnp.ndarray,
    row_scale: jnp.ndarray,
    kernel_q: jnp.ndarray,
    kernel_scale: jnp.ndarray,
    *,
    block_m: int = 640,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Pipelined int8 x int8 -> int32 matmul with fused dequantization.

    xq: (M, K) int8; row_scale: (M, 1) f32; kernel_q: (K, N) int8;
    kernel_scale: (N,) f32. Returns (M, N) out_dtype ≈
    (xq @ kernel_q) * row_scale * kernel_scale.
    """
    if interpret is None:
        # Auto: interpret everywhere but real TPU, so the CPU fake cluster
        # runs the same code path (matching ops/pallas_attention.py).
        interpret = jax.default_backend() != "tpu"
    m, k = xq.shape
    n = kernel_q.shape[1]
    block_m = min(block_m, _round_up(m, 32))
    block_n = min(block_n, _round_up(n, 128))
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n))

    return pl.pallas_call(
        _w8a8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=xq.size + kernel_q.size
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(xq, row_scale.astype(jnp.float32),
      kernel_q, kernel_scale.astype(jnp.float32).reshape(1, n))
