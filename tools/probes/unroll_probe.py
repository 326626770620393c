"""Scratch: measure b1 w8a8 serving forward with unroll_layers on vs off.

Run: python -u _unroll_probe.py
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

from bench import (  # noqa: E402
    measure_dispatch_overhead, timed_calls, zeros_like_shapes,
)
from vla_adapter_tpu.core.config import VLAConfig  # noqa: E402
from vla_adapter_tpu.models.layers import Runtime  # noqa: E402
from vla_adapter_tpu.models.vla import VLAModel  # noqa: E402

K = 12
ITERS = 6


def run(batch, unroll, overhead):
    cfg = VLAConfig()
    rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 attn_impl="auto", weights_int8=True, act_int8=True,
                 unroll_layers=unroll)
    model = VLAModel(cfg, rt)
    v = cfg.vision
    t_text, num_q = cfg.max_text_tokens, cfg.constants.num_action_query_tokens
    ids = jnp.zeros((batch, t_text), jnp.int32).at[:, :24].set(100)
    plen = jnp.full((batch,), 24, jnp.int32)
    valid = jnp.zeros((batch, t_text), jnp.int32).at[:, : 24 + num_q + 1].set(1)
    pix_shape = (batch, v.num_images, v.primary.image_size,
                 v.primary.image_size, v.channels_per_image)
    pixels = jnp.asarray(np.random.default_rng(0).normal(size=pix_shape),
                         jnp.bfloat16)
    params = zeros_like_shapes(jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), input_ids=ids, prompt_len=plen,
            text_valid=valid, pixel_values=pixels,
            proprio=jnp.zeros((batch, 8), jnp.float32))))

    @jax.jit
    def chain(params, eps, proprios):
        def body(acc, xs):
            e, pr = xs
            out = model.apply(
                params, input_ids=ids, prompt_len=plen, text_valid=valid,
                pixel_values=pixels + e, proprio=pr)["actions"]
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, jnp.float32(0), (eps, proprios))
        return acc

    def fresh(i):
        r = np.random.default_rng(1000 + i)
        return (params,
                jnp.asarray(r.normal(scale=1e-3, size=(K,)), jnp.bfloat16),
                jnp.asarray(r.normal(size=(K, batch, 8)), jnp.float32))

    import time
    t0 = time.time()
    t = timed_calls(chain, [fresh(i) for i in range(ITERS)], fresh(-1))
    print(f"b{batch} unroll={unroll}: {(t-overhead)/K*1e3:.3f} ms/fwd "
          f"(compile+measure took {time.time()-t0:.0f}s)", flush=True)
    import gc
    gc.collect()
    jax.clear_caches()


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)
    run(1, True, overhead)
    run(1, False, overhead)


if __name__ == "__main__":
    main()
