"""Scratch: sweep remat policy x accumulation for the bs8 LoRA train step.

Run from /root/repo on the real chip:  python -u _sweep_remat.py
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
from vla_adapter_tpu.models.layers import Runtime  # noqa: E402
from vla_adapter_tpu.models.vla import VLAModel  # noqa: E402
from vla_adapter_tpu.train.optim import make_optimizer  # noqa: E402
from vla_adapter_tpu.train.partition import split_trainable  # noqa: E402
from vla_adapter_tpu.train.step import TrainState, make_train_step  # noqa: E402


def train_step_time(overhead, accum, remat, policy, components=("vit", "llm", "head"),
                    batch_size=8, overrides=()):
    import dataclasses as dc
    import gc

    tcfg = TrainConfig(batch_size=batch_size,
                       grad_accumulation_steps=accum,
                       remat_llm=remat, remat_policy=policy,
                       remat_policy_overrides=tuple(overrides))
    rt = Runtime(
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
        lora_rank=tcfg.lora.rank, lora_scale=tcfg.lora.scale,
        remat=remat, remat_policy=policy, remat_components=tuple(components),
        remat_policy_overrides=tuple(overrides),
        attn_impl="auto",
    )
    model = VLAModel(tcfg.model, rt)
    tx = make_optimizer(tcfg.optim)

    batch_np = make_dummy_batch(tcfg.model, batch_size,
                                np.random.default_rng(0),
                                accum_steps=accum if accum > 1 else None)
    batch = jax.tree.map(jnp.asarray, batch_np)
    example = (jax.tree.map(lambda x: x[0], batch) if accum > 1 else batch)
    shapes = jax.eval_shape(
        lambda: model.init(
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
        res = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
    del state, params, trainable, frozen, batch
    gc.collect()
    jax.clear_caches()
    return res


SWEEPS = [
    ("baseline nothing a1", dict(accum=1, remat=True, policy="nothing")),
    ("no-remat a1", dict(accum=1, remat=False, policy="nothing")),
    ("no-remat a2", dict(accum=2, remat=False, policy="nothing")),
    ("dots_no_batch a2", dict(accum=2, remat=True, policy="dots_no_batch")),
    ("no-remat a4", dict(accum=4, remat=False, policy="nothing")),
    ("nothing a2", dict(accum=2, remat=True, policy="nothing")),
    ("dots_no_batch vit-only a1",
     dict(accum=1, remat=True, policy="dots_no_batch", components=("vit",))),
    ("remat vit+llm only a1 dots_no_batch",
     dict(accum=1, remat=True, policy="dots_no_batch",
          components=("vit", "llm"))),
    ("nothing a4", dict(accum=4, remat=True, policy="nothing")),           # 8
    ("dots_no_batch a4", dict(accum=4, remat=True, policy="dots_no_batch")),  # 9
    ("nothing a2 vit+llm", dict(accum=2, remat=True, policy="nothing",
                                components=("vit", "llm"))),               # 10
    ("nothing a2 llm+head", dict(accum=2, remat=True, policy="nothing",
                                 components=("llm", "head"))),             # 11
    ("dots a2", dict(accum=2, remat=True, policy="dots")),                 # 12
    ("dots a4", dict(accum=4, remat=True, policy="dots")),                 # 13
    ("nothing a2 bs16", dict(accum=2, remat=True, policy="nothing",
                             batch_size=16)),                              # 14
    ("mlp_saved a1", dict(accum=1, remat=True, policy="mlp_saved")),       # 15
    ("mlp_saved a2", dict(accum=2, remat=True, policy="mlp_saved")),       # 16
    ("mlp_saved a4", dict(accum=4, remat=True, policy="mlp_saved")),       # 17
    ("attn_only a2 vit+llm",
     dict(accum=2, remat=True, policy="attn_only",
          components=("vit", "llm"))),                                     # 18
    ("attn_only a2 full", dict(accum=2, remat=True, policy="attn_only")),  # 19
    ("attn_only a4 vit+llm",
     dict(accum=4, remat=True, policy="attn_only",
          components=("vit", "llm"))),                                     # 20
    ("attn_only a1 vit+llm",
     dict(accum=1, remat=True, policy="attn_only",
          components=("vit", "llm"))),                                     # 21
    ("nothing a1 vit+llm bs16",
     dict(accum=1, remat=True, policy="nothing", batch_size=16,
          components=("vit", "llm"))),                                     # 22
    ("attn_only a2 vit+llm bs16",
     dict(accum=2, remat=True, policy="attn_only", batch_size=16,
          components=("vit", "llm"))),                                     # 23
    # rows 18-23 postmortem: attn_only on BOTH stacks needs 22.15 G of
    # 15.75 G HBM (the ViT towers' wide-MLP activations); these split rows
    # keep full recompute on the ViTs and attn_only on the LLM only.
    ("llm-attn_only vit-nothing a2",
     dict(accum=2, remat=True, policy="attn_only",
          overrides=(("vit", "nothing"),), components=("vit", "llm"))),    # 24
    ("llm-attn_only vit-nothing a1",
     dict(accum=1, remat=True, policy="attn_only",
          overrides=(("vit", "nothing"),), components=("vit", "llm"))),    # 25
    ("llm-attn_only vit-nothing a2 bs16",
     dict(accum=2, remat=True, policy="attn_only", batch_size=16,
          overrides=(("vit", "nothing"),), components=("vit", "llm"))),    # 26
    ("llm-attn_only vit-nothing a4",
     dict(accum=4, remat=True, policy="attn_only",
          overrides=(("vit", "nothing"),), components=("vit", "llm"))),    # 27
    # row 24 ran out of HBM at runtime by a margin — rematting the bridge
    # head too (cheap recompute, frees its 24-block activations) may fit.
    ("llm-attn_only vit/head-nothing a2 +head",
     dict(accum=2, remat=True, policy="attn_only",
          overrides=(("vit", "nothing"), ("head", "nothing")),
          components=("vit", "llm", "head"))),                             # 28
]


def main():
    # one config per process: TPU HBM is not reliably reclaimed across
    # flagship train-step executables in one interpreter (fragmentation),
    # so a driver runs `python _sweep_remat.py <idx>` per row
    import sys

    idx = int(sys.argv[1])
    name, kw = SWEEPS[idx]
    overhead = measure_dispatch_overhead()
    t = train_step_time(overhead, **kw)
    val = f"{t:.4f} s/step" if isinstance(t, float) else t
    print(f"{name:<36s} {val}", flush=True)


if __name__ == "__main__":
    main()
