"""Scratch: fused-MLP Pallas kernel vs the XLA w8a8 MLP sequence, per layer.

Times a scan of L independent full MLPs (quantize + gate/up dots + act*mul
+ requantize + down dot) at the flagship serving shapes: the XLA sequence
(weights scan-sliced per layer, as nn.scan does in the model) vs
ops/pallas_fused_mlp.py (stacked weights + scalar-prefetch layer index).
Memoization-proof harness from w8a8_kernel_probe.py: chained carry, relu
consume barrier, distinct inputs per dispatch.

Run: python tools/probes/fused_mlp_kernel_probe.py
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
from vla_adapter_tpu.ops.pallas_fused_mlp import (  # noqa: E402
    w8a8_gated_mlp_stacked,
)

L = 12
R = 12


def make_fns(m, k, f):
    rng = np.random.default_rng(0)
    gq = jnp.asarray(rng.integers(-127, 128, size=(L, k, f)), jnp.int8)
    gs = jnp.asarray(rng.uniform(0.001, 0.002, size=(L, f)), jnp.float32)
    uq = jnp.asarray(rng.integers(-127, 128, size=(L, k, f)), jnp.int8)
    us = jnp.asarray(rng.uniform(0.001, 0.002, size=(L, f)), jnp.float32)
    dq = jnp.asarray(rng.integers(-127, 128, size=(L, f, k)), jnp.int8)
    ds = jnp.asarray(rng.uniform(0.001, 0.002, size=(L, k)), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)

    def consume(x, y):
        r = jnp.maximum(y.astype(jnp.float32), 0).mean(axis=1, keepdims=True)
        return x + r.astype(jnp.bfloat16)

    def xla_body(x, w):
        gq_l, gs_l, uq_l, us_l, dq_l, ds_l = w
        xq, rs = quantize_rows(x)
        g = lax.dot_general(xq, gq_l, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * rs * gs_l
        u = lax.dot_general(xq, uq_l, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * rs * us_l
        h = jax.nn.silu(g) * u
        hq, hs = quantize_rows(h)
        y = lax.dot_general(hq, dq_l, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                            ).astype(jnp.float32) * hs * ds_l
        return consume(x, y.astype(jnp.bfloat16)), None

    def outer(body, xs):
        def one(x, _):
            y, _ = lax.scan(body, x, xs)
            return y, None
        return one

    import functools

    # weights ride as jit ARGUMENTS: closure constants would be inlined
    # into the compile payload and trip the tunnel's request-size limit
    # (HTTP 413) at these stack sizes
    @jax.jit
    def run_xla(x, w):
        y, _ = lax.scan(outer(xla_body, w), x, None, length=R)
        return y

    @functools.partial(jax.jit, static_argnames=("bm", "bf"))
    def run_fused(x, w, bm, bf):
        gq, gs, uq, us, dq, ds = w

        def body(carry, layer):
            y = w8a8_gated_mlp_stacked(carry, gq, gs, uq, us, dq, ds, layer,
                                       block_m=bm, block_f=bf)
            return consume(carry, y), None

        def one(carry, _):
            y, _ = lax.scan(body, carry, jnp.arange(L, dtype=jnp.int32))
            return y, None

        y, _ = lax.scan(one, x, None, length=R)
        return y

    w = (gq, gs, uq, us, dq, ds)
    return x0, functools.partial(run_xla, w=w), (
        lambda x, bm, bf: run_fused(x, w, bm=bm, bf=bf))


def timeit(fn, m, k, overhead, reps=8):
    rng = np.random.default_rng(7)
    xs = [jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
          for _ in range(reps + 1)]
    for x in xs:
        x.block_until_ready()
    fn(xs.pop()).block_until_ready()
    walls = []
    for x in xs:
        t0 = time.time()
        np.asarray(fn(x))
        walls.append(time.time() - t0)
    return max(float(np.median(walls)) - overhead, 1e-9) / (L * R)


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)
    shapes = [
        (640, 896, 4864),   # Qwen2-0.5B MLP, batch 1
        (544, 1152, 4304),  # so400m MLP (2 images folded), ragged F
        (522, 1024, 4096),  # DINOv2-L MLP
    ]
    import functools

    for m, k, f in shapes:
        x0, run_xla, run_fused = make_fns(m, k, f)
        t_x = timeit(run_xla, m, k, overhead)
        ideal = 2 * (2 * m * k * f + m * f * k) / 394e12
        print(f"{m}x{k}x{f}: xla {t_x*1e6:8.2f} us/layer "
              f"(int8 ideal {ideal*1e6:6.2f})", flush=True)
        for bm in sorted({min(m, 640), m}):
            for bf in (512, 1024):
                t_f = timeit(lambda x: run_fused(x, bm, bf),
                             m, k, overhead)
                print(f"    fused bm={bm:5d} bf={bf:5d}: "
                      f"{t_f*1e6:8.2f} us/layer", flush=True)


if __name__ == "__main__":
    main()
