"""Scratch: attention impl microbench at serving batch-1 shapes.

Times a 24-layer chain of attention at the flagship LLM batch-1 shape and
a 27-layer chain at the ViT folded-batch shape, XLA vs Pallas, plus the
same with a batch-16 reference. Run on the real chip: python -u _attn_micro.py
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

from bench import measure_dispatch_overhead, timed_calls  # noqa: E402
from vla_adapter_tpu.ops.attention import dot_product_attention  # noqa: E402


def bench_attn(b, s, h, hkv, d, layers, impl, overhead, iters=6):
    reps = 16

    @jax.jit
    def chain(q0, ks, vs, eps):
        def rep(acc, e):
            def body(q, xs):
                k, v = xs
                out = dot_product_attention(q, k, v, None, causal=False,
                                            impl=impl)
                return out, None
            out, _ = lax.scan(body, q0 + e, (ks, vs))
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(rep, jnp.float32(0), eps)
        return acc

    def fresh(i):
        r = np.random.default_rng(100 + i)
        q0 = jnp.asarray(r.normal(size=(b, s, h, d)), jnp.bfloat16)
        ks = jnp.asarray(r.normal(size=(layers, b, s, hkv, d)), jnp.bfloat16)
        vs = jnp.asarray(r.normal(size=(layers, b, s, hkv, d)), jnp.bfloat16)
        eps = jnp.asarray(r.normal(scale=1e-3, size=(16,)), jnp.bfloat16)
        return q0, ks, vs, eps

    # carry q through layers: shape (b,s,h,d) must equal attention output
    wall = timed_calls(chain, [fresh(i) for i in range(iters)], fresh(-1))
    return max(wall - overhead, 1e-9) / layers / 16


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)
    shapes = [
        ("llm b1", dict(b=1, s=640, h=14, hkv=2, d=64, layers=24)),
        ("llm b16", dict(b=16, s=640, h=14, hkv=2, d=64, layers=24)),
        ("vit b2 (flagship b1)", dict(b=2, s=272, h=16, hkv=16, d=72,
                                      layers=27)),
        ("vit b32 (flagship b16)", dict(b=32, s=272, h=16, hkv=16, d=72,
                                        layers=27)),
    ]
    for name, kw in shapes:
        for impl in ("xla", "pallas"):
            try:
                t = bench_attn(**kw, impl=impl, overhead=overhead)
                print(f"{name:<24s} {impl:<7s} {t*1e6:8.1f} us/layer",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name:<24s} {impl:<7s} FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
