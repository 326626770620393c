"""Scratch: measure the chip's actual matmul peak (bf16 and int8)."""
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import numpy as np
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/tmp/vla_adapter_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from bench import measure_dispatch_overhead, timed_calls

N = 4096
K = 48

def run(dtype, overhead):
    r = np.random.default_rng(0)
    if dtype == "int8":
        a = jnp.asarray(r.integers(-127, 127, size=(N, N)), jnp.int8)
        b = jnp.asarray(r.integers(-127, 127, size=(N, N)), jnp.int8)
        def mm(x, y):
            return lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    else:
        a = jnp.asarray(r.normal(size=(N, N)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(r.normal(size=(N, N)) * 0.05, jnp.bfloat16)
        def mm(x, y):
            return lax.dot_general(x, y, (((1,), (0,)), ((), ())))

    @jax.jit
    def chain(a, b, eps):
        def body(acc, e):
            if dtype == "int8":
                y = mm(a, b)
                return acc + (y.sum(dtype=jnp.int32) + e).astype(jnp.float32) * 0, None
            y = mm(a + e.astype(a.dtype), b)
            # scale down so the carry stays finite; consume all columns
            return acc + y.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, jnp.float32(0), eps)
        return acc

    def fresh(i):
        rr = np.random.default_rng(10 + i)
        return (a, b, jnp.asarray(rr.normal(scale=1e-2, size=(K,)), jnp.float32))

    wall = timed_calls(chain, [fresh(i) for i in range(5)], fresh(-1))
    per = max(wall - overhead, 1e-9) / K
    tf = 2 * N**3 / per / 1e12
    print(f"{dtype}: {per*1e6:.1f} us per {N}^3 matmul -> {tf:.1f} TFLOP/s",
          flush=True)

overhead = measure_dispatch_overhead()
print(f"overhead {overhead*1e3:.1f} ms", flush=True)
run("bf16", overhead)
run("int8", overhead)
