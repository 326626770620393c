"""Measure the fused-MLP w8a8 backend vs XLA at flagship serving shapes.

Runs bench.py's chain methodology (distinct inputs per dispatch, dispatch
overhead subtracted) for w8a8_impl in {xla, fused} at the batch sizes that
matter — the data behind the "auto" dispatch crossover
(models/layers.W8A8_FUSED_MAX_BATCH). Run from the repo root on the real
chip:

    python tools/probes/fused_mlp_probe.py [batch ...]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import bench

bench._jax_setup()  # persistent compile cache: bench.py no longer
# configures it at import time (the orchestrator must not), so every
# timing probe must opt in or it silently recompiles the flagship
# from scratch (~12 min) on EVERY run


def main():
    from vla_adapter_tpu.core.config import VLAConfig
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    batches = [int(b) for b in sys.argv[1:]] or [1, 2]
    cfg = VLAConfig()
    err = bench.check_device_reachable(timeout_s=600.0)
    assert err is None, err
    overhead = bench.measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    for batch in batches:
        for impl in ("xla", "fused"):
            rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                         attn_impl="auto", weights_int8=True, act_int8=True,
                         w8a8_impl=impl)
            model = VLAModel(cfg, rt)
            per_fwd = bench.bench_forward(
                model, cfg, batch, k_chain=12, iters=6, overhead=overhead,
                int8=True)
            print(f"b{batch} {impl:14s} {per_fwd*1e3:8.3f} ms/forward "
                  f"({batch/per_fwd:7.2f} chunks/s)", flush=True)
            import gc

            gc.collect()
            jax.clear_caches()


if __name__ == "__main__":
    main()
