"""Scratch: Pallas w8a8 matmul kernel vs the XLA serving path, real chip.

Times a scan of L independent (quantize + int8 dot + dequant) projections
at the batch-1 serving shapes (and one batch-16 shape), XLA lax.dot_general
vs the pipelined Pallas kernel, with every output column consumed (guards
against DCE inflating the numbers — see BREAKDOWN.md).

Run: python tools/probes/w8a8_kernel_probe.py [block_n ...]
"""

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/vla_adapter_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import measure_dispatch_overhead  # noqa: E402
from vla_adapter_tpu.models.layers import quantize_rows  # noqa: E402
from vla_adapter_tpu.ops.pallas_matmul import (  # noqa: E402
    w8a8_matmul,
    w8a8_matmul_stacked,
)

L = 48  # layers per timed scan — amortizes dispatch
R = 24  # chained outer passes per dispatch — amortizes relay overhead


def make_fns(m, k, n, block_n):
    rng = np.random.default_rng(0)
    wq = jnp.asarray(rng.integers(-127, 128, size=(L, k, n)), jnp.int8)
    ws = jnp.asarray(rng.uniform(0.5, 2.0, size=(L, n)), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)

    def consume(x, y):
        # Fold y back to x's (m, k) carry shape with EVERY column
        # contributing, so XLA cannot dead-code-eliminate output columns
        # (see BREAKDOWN.md). The relu is the anti-fold barrier: a plain
        # mean could legally commute into the dot (x @ row_sums(W)),
        # collapsing the matmul under test to a matvec; max(y, 0) cannot.
        # Works for any (k, n) — no divisibility requirement — and fuses
        # into the dequant epilogue on both branches identically.
        r = jnp.maximum(y.astype(jnp.float32), 0).mean(axis=1, keepdims=True)
        return x + r.astype(jnp.bfloat16)

    def xla_body(x, w):
        wq_l, ws_l = w
        xq, rs = quantize_rows(x)
        y = lax.dot_general(xq, wq_l, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * rs * ws_l).astype(jnp.bfloat16)
        return consume(x, y), None

    def pallas_body(x, w):
        wq_l, ws_l = w
        xq, rs = quantize_rows(x)
        y = w8a8_matmul(xq, rs, wq_l, ws_l, block_n=block_n)
        return consume(x, y), None

    def stacked_body(x, layer):
        # Weights ride as scan CONSTANTS (closure), not xs: no per-layer
        # (K, N) dynamic-slice copy — the kernel's index_map picks the
        # layer's panels straight out of the stacked HBM buffer.
        xq, rs = quantize_rows(x)
        y = w8a8_matmul_stacked(xq, rs, wq, ws, layer, block_n=block_n)
        return consume(x, y), None

    # R outer passes per dispatch: the carry feeds pass i+1 from pass i, so
    # nothing inside a dispatch is memoizable, and one dispatch amortizes
    # the ~ms relay overhead over R*L matmuls instead of L.
    def outer(body, xs):
        def one(x, _):
            y, _ = lax.scan(body, x, xs)
            return y, None
        return one

    @jax.jit
    def run_xla(x):
        y, _ = lax.scan(outer(xla_body, (wq, ws)), x, None, length=R)
        return y

    @jax.jit
    def run_pallas(x):
        y, _ = lax.scan(outer(pallas_body, (wq, ws)), x, None, length=R)
        return y

    @jax.jit
    def run_stacked(x):
        y, _ = lax.scan(
            outer(stacked_body, jnp.arange(L, dtype=jnp.int32)),
            x, None, length=R)
        return y

    return x0, run_xla, run_pallas, run_stacked


def timeit(fn, m, k, overhead, reps=8):
    # Distinct device-resident input per timed call: the axon relay
    # memoizes repeated identical executions (returns in ~0.1 ms without
    # running), so same-input rep loops time nothing. Median, like
    # bench.timed_calls.
    rng = np.random.default_rng(7)
    xs = [jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
          for _ in range(reps + 1)]
    for x in xs:
        x.block_until_ready()
    fn(xs.pop()).block_until_ready()  # compile + warm (input never re-timed)
    walls = []
    for x in xs:
        t0 = time.time()
        np.asarray(fn(x))
        walls.append(time.time() - t0)
    return max(float(np.median(walls)) - overhead, 1e-9) / (L * R)


def main():
    blocks = [int(a) for a in _sys.argv[1:]] or [512]
    overhead = measure_dispatch_overhead()
    shapes = [
        (512, 1152, 1152),  # so400m qkv/o
        (512, 1152, 4304),  # so400m fc1
        (512, 4304, 1152),  # so400m fc2
        (640, 896, 4864),   # qwen mlp up/gate
        (640, 4864, 896),   # qwen mlp down
        (10240, 896, 4864),  # batch-16 qwen mlp up
    ]
    for m, k, n in shapes:
        ideal = 2 * m * k * n / 394e12 * 1e6
        _, run_xla, run_pallas, _ = make_fns(m, k, n, blocks[0])
        t_x = timeit(run_xla, m, k, overhead)
        print(f"{m}x{k}x{n}: xla {t_x * 1e6:7.2f} us"
              f"  (int8 ideal {ideal:6.2f})", flush=True)
        for bn in blocks:
            _, _, run_p, run_s = make_fns(m, k, n, bn)
            t_p = timeit(run_p, m, k, overhead)
            t_s = timeit(run_s, m, k, overhead)
            print(f"  pallas[bn={bn}] {t_p * 1e6:7.2f}"
                  f"   stacked[bn={bn}] {t_s * 1e6:7.2f}", flush=True)


if __name__ == "__main__":
    main()
