"""Scratch: quantify the int8 param-layout tax on the serving forward.

Hypothesis (from bench_breakdown vs bench discrepancy, 6.6 vs 9.2 ms b1):
passing the w8a8 param tree as a jit argument re-tiles ~2 GB of int8
weights every call, because the executable's preferred (32,128)-tiled int8
layouts differ from the arrays' default layouts. Device-putting the params
into the executable's AUTO-chosen input formats should reclaim it.

Run on the real chip: python -u _layout_probe.py
"""
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))


import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.layout import Format, Layout

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


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    cfg = VLAConfig()
    batch = 1
    rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 attn_impl="auto", weights_int8=True, act_int8=True)
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

    def chain(params, eps, proprios):
        def body(acc, xs):
            e, pr = xs
            out = model.apply(
                params, input_ids=ids, prompt_len=plen, text_valid=valid,
                pixel_values=pixels + e, proprio=pr)["actions"]
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, jnp.float32(0), (eps, proprios))
        return acc

    def fresh(p, i):
        r = np.random.default_rng(1000 + i)
        return (p,
                jnp.asarray(r.normal(scale=1e-3, size=(K,)), jnp.bfloat16),
                jnp.asarray(r.normal(size=(K, batch, 8)), jnp.float32))

    # (a) params as plain jit args (bench.py today)
    f = jax.jit(chain)
    t = timed_calls(f, [fresh(params, i) for i in range(ITERS)],
                    fresh(params, -1))
    print(f"args-default-layout: {(t-overhead)/K*1e3:.3f} ms/fwd", flush=True)

    # (b) params as args, device_put into the executable's AUTO formats
    f2 = jax.jit(chain, in_shardings=(Format(Layout.AUTO), None, None))
    args = fresh(params, -1)
    comp = f2.lower(*args).compile()
    fmts, _ = comp.input_formats
    params_t = jax.device_put(params, fmts[0])
    t = timed_calls(comp, [fresh(params_t, i) for i in range(ITERS)],
                    fresh(params_t, -1))
    print(f"args-auto-layout:    {(t-overhead)/K*1e3:.3f} ms/fwd", flush=True)


if __name__ == "__main__":
    main()
