"""A/B the round-5 projector fused-kernel path at batch 1, same session.

VERDICT r4 item 3: FusedProjector (2176 -> 8704 -> 896 -> 896 over 512
patch tokens) ran XLA w8a8 while its (512, 8704) GELU midsection is
exactly the HBM round-trip the whole-MLP kernel eliminates. This probe
measures the flagship b1 w8a8[fused] forward with the projector kernel ON
(current code) vs OFF (the pre-round-5 behavior, forced by patching
projector._use_fused_mlp) in ONE process, so tunnel/load drift cannot
masquerade as a win. Run from the repo root on the real chip:

    python tools/probes/proj_fused_probe.py [iters]
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
    from vla_adapter_tpu.models import projector
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = VLAConfig()
    err = bench.check_device_reachable(timeout_s=600.0)
    assert err is None, err
    overhead = bench.measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 attn_impl="auto", weights_int8=True, act_int8=True,
                 w8a8_impl="fused")
    real_gate = projector._use_fused_mlp
    results = {}
    # interleave the arms A,B,A,B so slow drift averages out of the delta
    for trial in range(2):
        for arm, gate in (("proj_kernel_on", real_gate),
                          ("proj_kernel_off", lambda *a: False)):
            projector._use_fused_mlp = gate
            model = VLAModel(cfg, rt)
            per_fwd = bench.bench_forward(
                model, cfg, 1, k_chain=12, iters=iters, overhead=overhead,
                int8=True)
            results.setdefault(arm, []).append(per_fwd)
            print(f"trial{trial} {arm:16s} {per_fwd*1e3:8.3f} ms/forward "
                  f"({1/per_fwd:7.2f} chunks/s)", flush=True)
            import gc

            gc.collect()
            jax.clear_caches()
    projector._use_fused_mlp = real_gate
    on = min(results["proj_kernel_on"])
    off = min(results["proj_kernel_off"])
    print(f"best on={on*1e3:.3f} ms  best off={off*1e3:.3f} ms  "
          f"delta={(off-on)*1e3:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
