"""Scratch: decompose the bs8 LoRA train step into fwd / fwd+bwd / update.

Answers VERDICT r2 item 5: where does 0.405 s/step go? Times, on the real
chip with the bench.py overhead discipline:
  * forward loss only (train=True, full remat config as in training)
  * value_and_grad (fwd + bwd, no optimizer)
  * the full train step (reference point; bench.py's number)
  * value_and_grad with the Pallas-vs-XLA attention toggled
Run: python -u _train_decomp.py
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
from vla_adapter_tpu.train.step import (  # noqa: E402
    TrainState, make_loss_fn, make_train_step,
)


def setup(attn_impl="auto", remat=True, policy="nothing"):
    tcfg = TrainConfig(batch_size=8)
    rt = Runtime(
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
        lora_rank=tcfg.lora.rank, lora_scale=tcfg.lora.scale,
        remat=remat, remat_policy=policy, attn_impl=attn_impl,
    )
    model = VLAModel(tcfg.model, rt)
    batch_np = make_dummy_batch(tcfg.model, 8, np.random.default_rng(0))
    batch = jax.tree.map(jnp.asarray, batch_np)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            input_ids=batch["input_ids"], prompt_len=batch["prompt_len"],
            text_valid=batch["text_valid"], pixel_values=batch["pixel_values"],
            proprio=batch.get("proprio"), train=True,
        )["params"]
    )
    params = zeros_like_shapes(shapes)
    trainable, frozen = split_trainable(params, lora_enabled=True)
    frozen = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, frozen)
    return tcfg, model, trainable, frozen, batch, batch_np


def fresh_batch(batch, batch_np, i):
    r = np.random.default_rng(2000 + i)
    b = dict(batch)
    b["actions"] = jnp.asarray(
        r.normal(size=np.shape(batch_np["actions"])), jnp.float32)
    b["proprio"] = jnp.asarray(
        r.normal(size=np.shape(batch_np["proprio"])), jnp.float32)
    return b


def timeit(fn, mk_args, overhead, n=5):
    out = fn(*mk_args(-1))
    jax.block_until_ready(out)
    walls = []
    for i in range(n):
        args = mk_args(i)
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        walls.append(time.time() - t0)
    return max(float(np.median(walls)) - overhead, 1e-9)


def main():
    overhead = measure_dispatch_overhead()
    print(f"dispatch overhead {overhead*1e3:.1f} ms", flush=True)

    for tag, kw in [
        ("remat-nothing auto", dict()),
        ("remat-nothing xla-attn", dict(attn_impl="xla")),
    ]:
        tcfg, model, trainable, frozen, batch, batch_np = setup(**kw)
        loss_fn = make_loss_fn(model)

        fwd = jax.jit(lambda tr, fz, b, r: loss_fn(tr, fz, b, r)[0])
        t_fwd = timeit(
            fwd,
            lambda i: (trainable, frozen, fresh_batch(batch, batch_np, i),
                       jax.random.key(3000 + i)),
            overhead)
        print(f"[{tag}] forward loss      {t_fwd:.4f} s", flush=True)

        grad = jax.jit(jax.grad(lambda tr, fz, b, r: loss_fn(tr, fz, b, r)[0]))
        t_grad = timeit(
            grad,
            lambda i: (trainable, frozen, fresh_batch(batch, batch_np, i),
                       jax.random.key(3000 + i)),
            overhead)
        print(f"[{tag}] fwd+bwd (grad)    {t_grad:.4f} s", flush=True)

        tx = make_optimizer(tcfg.optim)
        state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                           frozen=frozen, opt_state=tx.init(trainable))
        step = jax.jit(make_train_step(model, tx, tcfg), donate_argnums=0)
        s = state
        s, m = step(s, fresh_batch(batch, batch_np, -1), jax.random.key(0))
        float(m["loss"])
        walls = []
        for i in range(5):
            b = fresh_batch(batch, batch_np, i)
            t0 = time.time()
            s, m = step(s, b, jax.random.key(3000 + i))
            float(m["loss"])
            walls.append(time.time() - t0)
        t_step = max(float(np.median(walls)) - overhead, 1e-9)
        print(f"[{tag}] full step         {t_step:.4f} s "
              f"(update ~= {t_step - t_grad:.4f})", flush=True)
        del s, state, trainable, frozen, batch
        import gc
        gc.collect()
        jax.clear_caches()


if __name__ == "__main__":
    main()
