"""Scratch: device-op profile of the b1 w8a8 serving forward (+ bs8 train
step with PROFILE_TRAIN=1). Captures a jax.profiler trace on the real chip
and aggregates device-side op durations by HLO category and fusion.

Run: python -u _profile_fwd.py
"""
import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parents[2]))


import glob
import gzip
import json
import os
import re
from collections import defaultdict

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/vla_adapter_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from bench import zeros_like_shapes  # noqa: E402


def newest_trace(root):
    paths = sorted(glob.glob(os.path.join(root, "plugins/profile/*/*.trace.json.gz")))
    return paths[-1]


def aggregate(trace_path, label):
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    meta = {e.get("pid"): e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = [pid for pid, name in meta.items() if "TPU" in name]
    evs = [e for e in tr["traceEvents"]
           if e.get("ph") == "X" and e.get("pid") in dev_pids
           and "hlo_category" in e.get("args", {})]
    total = sum(e["dur"] for e in evs)
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    op_count = defaultdict(int)
    op_bytes = defaultdict(float)
    for e in evs:
        cat = e["args"]["hlo_category"]
        by_cat[cat] += e["dur"]
        ln = e["args"].get("long_name", "")
        # key: category + result shape, e.g. "fusion bf16[512,1024]"
        m = re.match(r"%\S+ = (\S+?\[[^\]]*\])", ln)
        shape = m.group(1).split("{")[0] if m else "?"
        key = f"{cat:<24s} {shape}"
        by_op[key] += e["dur"]
        op_count[key] += 1
        op_bytes[key] += float(e["args"].get("bytes_accessed", 0))
    print(f"\n==== {label}: total device time {total/1e3:.3f} ms over "
          f"{len(evs)} ops ====")
    print("-- by category --")
    for cat, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28s} {d/1e3:8.3f} ms  {100*d/total:5.1f}%")
    print("-- top 30 op groups --")
    for key, d in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        n = op_count[key]
        gbps = op_bytes[key] / 1e9 / (d / 1e6) if d else 0
        print(f"  {key:<60s} {d/1e3:8.3f} ms  x{n:<4d} {gbps:6.0f} GB/s")


def profile_forward():
    from vla_adapter_tpu.core.config import VLAConfig
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    cfg = VLAConfig()
    batch = int(os.environ.get("PROFILE_BATCH", "1"))
    impl = os.environ.get("PROFILE_IMPL", "xla")  # "xla" | "fused"
    rt = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                 attn_impl="auto", weights_int8=True, act_int8=True,
                 w8a8_impl=impl)
    model = VLAModel(cfg, rt)
    v = cfg.vision
    t_text = cfg.max_text_tokens
    num_q = cfg.constants.num_action_query_tokens
    ids = jnp.zeros((batch, t_text), jnp.int32).at[:, :24].set(100)
    plen = jnp.full((batch,), 24, jnp.int32)
    valid = jnp.zeros((batch, t_text), jnp.int32).at[:, : 24 + num_q + 1].set(1)
    pix_shape = (batch, v.num_images, v.primary.image_size,
                 v.primary.image_size, v.channels_per_image)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), input_ids=ids, prompt_len=plen,
            text_valid=valid, pixel_values=jnp.zeros(pix_shape, jnp.bfloat16),
            proprio=jnp.zeros((batch, 8), jnp.float32)))
    # fused layout: shapes carries BOTH collections ({"params", "qstack"});
    # the zeros tree matches either layout by construction
    params = zeros_like_shapes(shapes)

    @jax.jit
    def fwd(params, pixels, proprio):
        return model.apply(
            params, input_ids=ids, prompt_len=plen, text_valid=valid,
            pixel_values=pixels, proprio=proprio)["actions"]

    def args(i):
        r = np.random.default_rng(i)
        return (params,
                jnp.asarray(r.normal(size=pix_shape), jnp.bfloat16),
                jnp.asarray(r.normal(size=(batch, 8)), jnp.float32))

    jax.block_until_ready(fwd(*args(0)))
    root = "/tmp/jaxtrace_fwd"
    with jax.profiler.trace(root):
        for i in range(1, 4):
            jax.block_until_ready(fwd(*args(i)))
    aggregate(newest_trace(root), f"b{batch} w8a8[{impl}] forward x3")


def profile_train():
    """Device-op profile of the SHIPPED train recipe (bs8, accum 2, LoRA
    r64, int8 frozen base — core/experiments.py; PROFILE_INT8_BASE=0 for
    the bf16-base comparability row). Mirrors bench.bench_train_step's
    construction exactly so the trace attributes the same step the bench
    times (VERDICT r4 item 7: the train residual story was inferential —
    no device-trace attribution existed for training)."""
    from vla_adapter_tpu.core.config import TrainConfig
    from vla_adapter_tpu.data.dummy import make_dummy_batch
    from vla_adapter_tpu.models.vla import VLAModel
    from vla_adapter_tpu.train.loop import build_runtime, float_twin
    from vla_adapter_tpu.train.optim import make_optimizer
    from vla_adapter_tpu.train.partition import split_trainable
    from vla_adapter_tpu.train.step import TrainState, make_train_step

    base_int8 = os.environ.get("PROFILE_INT8_BASE", "1") == "1"
    tcfg = TrainConfig(batch_size=8, grad_accumulation_steps=2,
                       base_int8=base_int8)
    rt = build_runtime(tcfg)
    model = VLAModel(tcfg.model, rt)
    tx = make_optimizer(tcfg.optim)
    batch_np = make_dummy_batch(tcfg.model, tcfg.batch_size,
                                np.random.default_rng(0),
                                accum_steps=tcfg.grad_accumulation_steps)
    batch = jax.tree.map(jnp.asarray, batch_np)
    example = jax.tree.map(lambda x: x[0], batch)
    init_model = (VLAModel(tcfg.model, float_twin(rt))
                  if base_int8 else model)
    shapes = jax.eval_shape(
        lambda: init_model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            input_ids=example["input_ids"], prompt_len=example["prompt_len"],
            text_valid=example["text_valid"],
            pixel_values=example["pixel_values"],
            proprio=example.get("proprio"), train=True,
        )["params"])
    params = zeros_like_shapes(shapes)
    trainable, frozen = split_trainable(params, lora_enabled=True)
    frozen = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, frozen)
    if base_int8:
        from vla_adapter_tpu.models.quantize import quantize_params_jax

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

    state, m = step(state, *fresh(-1))
    float(m["loss"])
    root = "/tmp/jaxtrace_train"
    with jax.profiler.trace(root):
        for i in range(2):
            state, m = step(state, *fresh(i))
            float(m["loss"])
    base = "int8" if base_int8 else "bf16"
    aggregate(newest_trace(root),
              f"bs8 accum2 lora64 {base}-base train step x2")


if __name__ == "__main__":
    if os.environ.get("PROFILE_TRAIN", "0") == "1":
        profile_train()
    else:
        profile_forward()
