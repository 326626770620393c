"""Tune the fused-MLP kernel's block_m/block_f at batch-2 serving shapes.

At batch 2 the LLM rows double to 1280; with block_m=640 the grid has two
m-blocks and every weight panel is streamed twice. This probe measures the
kernel directly (chained dispatches, distinct inputs, R passes per
dispatch) across block_m/block_f at the flagship shapes.

    python tools/probes/fused_mlp_block_probe.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from vla_adapter_tpu.ops.pallas_fused_mlp import w8a8_gated_mlp_stacked

R = 24  # chained passes per dispatch (relay through the output)


def bench(m, k, f, d, L, block_m, block_f, iters=30):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
    gq = jnp.asarray(rng.integers(-127, 128, (L, k, f)), jnp.int8)
    gs = jnp.asarray(rng.uniform(0.001, 0.01, (L, f)), jnp.float32)
    uq = jnp.asarray(rng.integers(-127, 128, (L, k, f)), jnp.int8)
    us = jnp.asarray(rng.uniform(0.001, 0.01, (L, f)), jnp.float32)
    dq = jnp.asarray(rng.integers(-127, 128, (L, f, d)), jnp.int8)
    ds = jnp.asarray(rng.uniform(0.001, 0.01, (L, d)), jnp.float32)

    @jax.jit
    def chain(x):
        def body(h, l):
            out = w8a8_gated_mlp_stacked(
                h, gq, gs, uq, us, dq, ds, l % L,
                act="silu", block_m=block_m, block_f=block_f)
            # relay: renormalize so the chain stays finite
            out = out / (jnp.max(jnp.abs(out)) + 1e-3)
            return out.astype(jnp.bfloat16), None
        h, _ = jax.lax.scan(body, x, jnp.arange(R))
        return h

    chain(x).block_until_ready()
    t0 = time.perf_counter()
    for i in range(iters):
        # start the perturbation at i+1: chain(x + 0) is bitwise-identical
        # to the warmup dispatch and the tunnel relay memoizes identical
        # executions, which would serve iteration 0 from cache and bias
        # per_call low by ~1/iters
        out = chain(x + jnp.bfloat16((i + 1) * 1e-3))
    out.block_until_ready()
    per_call = (time.perf_counter() - t0) / (iters * R)
    return per_call


def main():
    shapes = [
        ("LLM b1", 640, 896, 4864, 896, 24),
        ("LLM b2", 1280, 896, 4864, 896, 24),
        ("ViT so400m b2", 1088, 1152, 4304, 1152, 27),
    ]
    for name, m, k, f, d, L in shapes:
        seen_bm = set()
        for block_m in (256, 640, 1280):
            # the kernel clamps block_m to round_up(m, 16), so block_m > m
            # still measures a valid single-m-block config (the one that
            # streams each weight panel once — the probe's motivation);
            # skip only when the clamp duplicates an already-measured size
            eff_bm = min(block_m, -(-m // 16) * 16)
            if eff_bm in seen_bm:
                continue
            seen_bm.add(eff_bm)
            for block_f in (256, 512, 1024):
                try:
                    t = bench(m, k, f, d, L, block_m, block_f)
                    print(f"{name:14s} m={m:5d} bm={block_m:5d} "
                          f"bf={block_f:5d}  {t*1e6:8.2f} us/layer",
                          flush=True)
                except Exception as e:
                    print(f"{name:14s} m={m:5d} bm={block_m:5d} "
                          f"bf={block_f:5d}  FAIL {repr(e)[:90]}",
                          flush=True)


if __name__ == "__main__":
    main()
