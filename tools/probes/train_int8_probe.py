"""Measure the flagship LoRA train step with the frozen base in w8a8 int8
(TrainConfig.base_int8 / models/layers.w8a8_matmul_ste) vs the committed
bf16-base default (0.364 s/step @ bs8 accum2, BREAKDOWN.md).

The base is frozen under LoRA: its forward AND its dx-backward stream the
same int8 weights through the MXU's 2x-rate int8 path, while the trainable
head/proprio/LoRA keep exact float math. Numerics are gated separately
(tests/test_train_step.py test_base_int8_loss_curve_matches_float); this
probe answers the speed question on the real chip.

Run from /root/repo:  python -u tools/probes/train_int8_probe.py
"""
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vla_adapter_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import measure_dispatch_overhead, zeros_like_shapes  # noqa: E402
from vla_adapter_tpu.core.config import TrainConfig  # noqa: E402
from vla_adapter_tpu.data.dummy import make_dummy_batch  # noqa: E402
from vla_adapter_tpu.models.quantize import quantize_params_jax  # noqa: E402
from vla_adapter_tpu.models.vla import VLAModel  # noqa: E402
from vla_adapter_tpu.train.loop import build_runtime, float_twin  # noqa: E402
from vla_adapter_tpu.train.optim import make_optimizer  # noqa: E402
from vla_adapter_tpu.train.partition import split_trainable  # noqa: E402
from vla_adapter_tpu.train.step import TrainState, make_train_step  # noqa: E402


def train_step_time(overhead, base_int8, accum=2, batch_size=8,
                    moments_dtype=None, accum_dtype=None):
    import dataclasses as _dc
    import gc

    tcfg = TrainConfig(batch_size=batch_size,
                       grad_accumulation_steps=accum,
                       base_int8=base_int8,
                       accum_dtype=accum_dtype)
    if moments_dtype is not None:
        tcfg = tcfg.replace(optim=_dc.replace(tcfg.optim,
                                              moments_dtype=moments_dtype))
    rt = build_runtime(tcfg)
    model = VLAModel(tcfg.model, rt)
    tx = make_optimizer(tcfg.optim)

    batch_np = make_dummy_batch(tcfg.model, batch_size,
                                np.random.default_rng(0),
                                accum_steps=accum if accum > 1 else None)
    batch = jax.tree.map(jnp.asarray, batch_np)
    example = (jax.tree.map(lambda x: x[0], batch) if accum > 1 else batch)
    init_model = VLAModel(tcfg.model, float_twin(rt)) if base_int8 else model
    shapes = jax.eval_shape(
        lambda: init_model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            input_ids=example["input_ids"], prompt_len=example["prompt_len"],
            text_valid=example["text_valid"],
            pixel_values=example["pixel_values"],
            proprio=example.get("proprio"), train=True,
        )["params"]
    )
    params = zeros_like_shapes(shapes)
    trainable, frozen = split_trainable(params, lora_enabled=True)
    frozen = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, frozen)
    if base_int8:
        frozen = jax.jit(quantize_params_jax)(frozen)  # on device
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       frozen=frozen, opt_state=tx.init(trainable))
    step = jax.jit(make_train_step(model, tx, tcfg), donate_argnums=0)

    def fresh(i):
        r = np.random.default_rng(2000 + i)
        b = dict(batch)
        b["actions"] = jnp.asarray(
            r.normal(size=np.shape(batch_np["actions"])), jnp.float32)
        b["proprio"] = jnp.asarray(
            r.normal(size=np.shape(batch_np["proprio"])), jnp.float32)
        return b, jax.random.key(3000 + i)

    try:
        state, _ = step(state, *fresh(-1))
        walls = []
        for i in range(5):
            b, k = fresh(i)
            t0 = time.time()
            state, metrics = step(state, b, k)
            float(metrics["loss"])
            walls.append(time.time() - t0)
        res = max(float(np.median(walls)) - overhead, 1e-9)
    except Exception as e:  # noqa: BLE001
        res = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
    del state, params, trainable, frozen, batch
    gc.collect()
    jax.clear_caches()
    return res


def main():
    import bench as _bench

    _bench.check_device_reachable()  # fail fast if the tunnel is wedged
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)
    if "--ab-moments" in _sys.argv:
        # HBM-traffic levers on the SHIPPED recipe (int8 base, accum 2):
        # bf16-stored Adam moments and/or a bf16 accum carry
        # (BREAKDOWN.md round-5 train trace). Interleaved trials so
        # session-level chip/tunnel drift cancels.
        arms = [("f32 moments, f32 carry (shipped)", None, None),
                ("bf16 moments", "bfloat16", None),
                ("bf16 carry", None, "bfloat16"),
                ("bf16 moments + carry", "bfloat16", "bfloat16")]
        for trial in range(2):
            for name, md, ad in arms:
                t = train_step_time(overhead, True, accum=2,
                                    moments_dtype=md, accum_dtype=ad)
                msg = (f"{t:.4f} s/step ({8 / t:.2f} samples/s)"
                       if isinstance(t, float) else t)
                print(f"trial {trial} | {name:34s} {msg}", flush=True)
        return
    rows = [("bf16 base (default)", False, 2),
            ("int8 base (w8a8+STE)", True, 2),
            ("int8 base accum1", True, 1)]
    for name, q, accum in rows:
        t = train_step_time(overhead, q, accum=accum)
        if isinstance(t, float):
            print(f"{name:24s} accum={accum}  {t:.4f} s/step "
                  f"({8 / t:.2f} samples/s)", flush=True)
        else:
            print(f"{name:24s} accum={accum}  {t}", flush=True)


if __name__ == "__main__":
    main()
