"""Measure the whole-decoder-layer megakernel backend end to end at b1.

VERDICT r4 item 6: the round-4 floor analysis parked "attention + MLP in
one pallas_call" as the only untested lever for the batch-1 serving
forward. ops/pallas_megalayer.py is that kernel (w8a8_impl="mega");
this probe measures the flagship batch-1 forward under
{fused (shipped b1 default), mega} in ONE process with bench.py's chain
methodology, interleaved A/B/A/B so tunnel drift averages out of the
delta. Run from the repo root on the real chip:

    python tools/probes/megalayer_probe.py [iters]
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

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = VLAConfig()
    err = bench.check_device_reachable(timeout_s=600.0)
    assert err is None, err
    overhead = bench.measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    results = {}
    for trial in range(trials):
        for impl in ("fused", "mega"):
            rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                         attn_impl="auto", weights_int8=True, act_int8=True,
                         w8a8_impl=impl)
            model = VLAModel(cfg, rt)
            per_fwd = bench.bench_forward(
                model, cfg, 1, k_chain=12, iters=iters, overhead=overhead,
                int8=True)
            results.setdefault(impl, []).append(per_fwd)
            print(f"trial{trial} {impl:6s} {per_fwd*1e3:8.3f} ms/forward "
                  f"({1/per_fwd:7.2f} chunks/s)", flush=True)
            import gc

            gc.collect()
            jax.clear_caches()
    fused = min(results["fused"])
    mega = min(results["mega"])
    print(f"best fused={fused*1e3:.3f} ms  best mega={mega*1e3:.3f} ms  "
          f"delta={(fused-mega)*1e3:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
