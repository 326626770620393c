"""Scratch: per-matmul serving-mode probe at the real b1 shapes.

For the ViT row count (2x256 folded images) and LLM row count (640), time a
scan of L layers of a single (rows, D) x (D, F) projection under:
  * w8a8: per-token quant + int8 MXU dot + dequant (today's serving mode)
  * int8: weight-only int8, in-register upcast, bf16 MXU dot
  * bf16: plain bf16 dot
  * w8a8_qkv3 vs w8a8_qkv1: three separate projections of the same input
    vs one fused (D -> 3F) projection.
Run: python -u _matmul_probe.py
"""
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))


import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/vla_adapter_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import measure_dispatch_overhead, timed_calls  # noqa: E402
from vla_adapter_tpu.models.layers import quantize_rows  # noqa: E402

K_CHAIN = 100


def probe(rows, d, f, L, mode, overhead, iters=6):
    r = np.random.default_rng(0)
    n_proj = 3 if mode.endswith("qkv3") else 1
    fo = f * (3 if mode.endswith("qkv1") else 1)
    ws, scales = [], []
    for _ in range(n_proj):
        ws.append(jnp.asarray(r.integers(-127, 127, size=(L, d, fo)), jnp.int8))
        scales.append(jnp.asarray(r.normal(size=(L, fo)) ** 2 + 0.5,
                                  jnp.float32))
    wbf = [w.astype(jnp.bfloat16) * 0.01 for w in ws]

    def one(h, wi, si):
        if mode.startswith("w8a8"):
            hq, rs = quantize_rows(h)
            y = lax.dot_general(hq, wi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * rs * si).astype(jnp.bfloat16)
        if mode == "int8":
            y = lax.dot_general(h, wi.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())))
            return y * si.astype(jnp.bfloat16)
        return lax.dot_general(h, wi, (((1,), (0,)), ((), ())))

    use_bf = mode == "bf16"

    @jax.jit
    def chain(x0, eps):
        def outer(acc, e):
            def body(h, xs):
                outs = []
                for i in range(n_proj):
                    wi = xs[2 * i]
                    si = xs[2 * i + 1]
                    outs.append(one(h, wi, si))
                y = outs[0] if len(outs) == 1 else sum(outs)
                if y.shape[-1] != d:
                    # consume EVERY output column: slicing y[:, :d] lets XLA
                    # dead-code-eliminate the unused columns of the matmul
                    y = y[:, :d] + y.mean(axis=1, keepdims=True)
                return (y / jnp.float32(40.0).astype(jnp.bfloat16)), None

            xs = []
            for i in range(n_proj):
                xs += [wbf[i] if use_bf else ws[i], scales[i]]
            out, _ = lax.scan(body, x0 + e, tuple(xs))
            return acc + out.astype(jnp.float32).mean(), None

        acc, _ = lax.scan(outer, jnp.float32(0), eps)
        return acc

    def fresh(i):
        rr = np.random.default_rng(100 + i)
        return (jnp.asarray(rr.normal(size=(rows, d)), jnp.bfloat16),
                jnp.asarray(rr.normal(scale=1e-3, size=(K_CHAIN,)),
                            jnp.bfloat16))

    wall = timed_calls(chain, [fresh(i) for i in range(iters)], fresh(-1))
    per = max(wall - overhead, 1e-9) / K_CHAIN / L
    flops = 2 * rows * d * f * (3 if "qkv" in mode else 1)
    ideal8 = flops / 394e12
    print(f"rows={rows:4d} d={d} f={fo:5d} {mode:<10s} {per*1e6:7.2f} us/layer"
          f"  (int8 ideal {ideal8*1e6:5.2f}, bf16 {2*ideal8*1e6:5.2f})",
          flush=True)


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)
    # ViT qkv-ish shape and LLM mlp-ish shape
    for rows, d, f, L in ((640, 896, 4864, 24),):
        for mode in ("w8a8", "int8", "bf16"):
            probe(rows, d, f, L, mode, overhead)
    # fused vs separate qkv at the ViT shape
    for mode in ("w8a8_qkv3", "w8a8_qkv1"):
        probe(512, 1152, 1152, 26, mode, overhead)


if __name__ == "__main__":
    main()
