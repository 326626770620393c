"""Scratch: int8 scanned-weight layout probe.

The fwd profile shows ~15 us/layer of 'data formatting' on s8[1,896,896]
inside the LLM scan — XLA transposes each layer's int8 kernel slice every
forward. Compare: (a) stacks stored (L, in, out), dot contracting RHS dim 0
(today's Dense); (b) stacks stored (L, out, in), contracting RHS dim 1.

Run: python -u _int8_layout_probe.py
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

L, S, D = 24, 640, 896
K_CHAIN = 100


def run(mode, overhead, iters=6):
    r = np.random.default_rng(0)
    if mode == "in_out":
        w = jnp.asarray(r.integers(-127, 127, size=(L, D, D)), jnp.int8)
        dims = (((1,), (0,)), ((), ()))
    else:
        w = jnp.asarray(r.integers(-127, 127, size=(L, D, D)), jnp.int8)
        dims = (((1,), (1,)), ((), ()))
    scale = jnp.asarray(r.normal(size=(L, D)) ** 2 + 0.5, jnp.float32)

    @jax.jit
    def chain(x0, eps):
        def fwd(x):
            def body(h, xs):
                wi, si = xs
                hq, rs = quantize_rows(h)
                y = lax.dot_general(hq, wi, dims,
                                    preferred_element_type=jnp.int32)
                y = (y.astype(jnp.float32) * rs * si).astype(jnp.bfloat16)
                # keep norm bounded through 24 layers
                return y / jnp.float32(30.0).astype(jnp.bfloat16), None

            out, _ = lax.scan(body, x, (w, scale))
            return out

        def outer(acc, e):
            return acc + fwd(x0 + e).astype(jnp.float32).mean(), None

        acc, _ = lax.scan(outer, jnp.float32(0), eps)
        return acc

    def fresh(i):
        rr = np.random.default_rng(100 + i)
        return (jnp.asarray(rr.normal(size=(S, D)), jnp.bfloat16),
                jnp.asarray(rr.normal(scale=1e-3, size=(K_CHAIN,)),
                            jnp.bfloat16))

    wall = timed_calls(chain, [fresh(i) for i in range(iters)], fresh(-1))
    per_layer = max(wall - overhead, 1e-9) / K_CHAIN / L
    ideal = 2 * S * D * D / 394e12
    print(f"{mode:<8s} {per_layer*1e6:7.2f} us/layer (int8 ideal "
          f"{ideal*1e6:.2f})", flush=True)


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)
    for mode in ("in_out", "out_in"):
        run(mode, overhead)


if __name__ == "__main__":
    main()
