"""The finetune orchestrator (reference vla-scripts/finetune.py:689-1122).

Wires config -> model -> mesh/shardings -> optimizer -> data -> compiled
train step -> metrics/checkpoints. Data comes from any iterator of
model-format batches (data/rlds for real RLDS data, data/dummy for smoke
runs — the reference documents the same swap, finetune.py:937-946).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vla_adapter_tpu.core.config import TrainConfig
from vla_adapter_tpu.data.dummy import DummyDataset
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vla import VLAModel
from vla_adapter_tpu.parallel.sharding import (
    create_mesh,
    host_local_rows,
    per_process_seed,
    process_local_batch_size,
    shard_batch_from_local,
    shard_params,
)
from vla_adapter_tpu.train.checkpoints import (
    find_resume_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from vla_adapter_tpu.train.metrics import Metrics
from vla_adapter_tpu.train.optim import make_optimizer
from vla_adapter_tpu.train.step import (
    TrainState,
    init_train_state,
    make_train_step,
)


def get_run_id(cfg: TrainConfig) -> str:
    """Hyperparam-encoding run id (reference get_run_id, finetune.py:158-191)."""
    if cfg.run_id is not None:
        return cfg.run_id
    lora = f"lora-r{cfg.lora.rank}" if cfg.lora.enabled else "full"
    return (
        f"{cfg.model.platform}+b{cfg.batch_size}+{lora}"
        f"+lr-{cfg.optim.learning_rate}"
        f"+{'pro' if cfg.model.head.use_pro_version else 'orig'}"
    )


def build_runtime(cfg: TrainConfig) -> Runtime:
    return Runtime(
        dtype=jnp.bfloat16,
        param_dtype=jnp.float32,
        attn_impl="auto_bwd",
        lora_rank=cfg.lora.rank if cfg.lora.enabled else 0,
        lora_scale=cfg.lora.scale,
        remat=cfg.remat_llm,
        remat_policy=cfg.remat_policy,
        remat_policy_overrides=tuple(cfg.remat_policy_overrides),
        remat_components=cfg.remat_components,
        weights_int8=cfg.base_int8,
        act_int8=cfg.base_int8,
        train_base_int8=cfg.base_int8,
    )


def float_twin(rt: Runtime) -> Runtime:
    """The float-kernel Runtime matching a train_base_int8 runtime — used
    to INITIALIZE params (init must produce float kernels to quantize)."""
    import dataclasses as _dc

    return _dc.replace(rt, weights_int8=False, act_int8=False,
                       train_base_int8=False)


def finetune(
    cfg: TrainConfig,
    data_iter: Optional[Iterator[Dict[str, np.ndarray]]] = None,
    dataset_statistics: Optional[Dict] = None,
    max_steps: Optional[int] = None,
    rt: Optional[Runtime] = None,
    resume: bool = False,
    val_iter: Optional[Iterator[Dict[str, np.ndarray]]] = None,
    val_batches: int = 8,
) -> TrainState:
    rt = rt or build_runtime(cfg)
    model = VLAModel(cfg.model, rt)
    mesh = create_mesh(data=cfg.data_axis, fsdp=cfg.fsdp_axis,
                       tensor=cfg.tensor_axis)
    tx = make_optimizer(cfg.optim)
    max_steps = max_steps if max_steps is not None else cfg.optim.max_steps

    # data_iter yields HOST-LOCAL batches (global batch_size / process
    # count rows) — one distinctly-seeded pipeline per host, assembled
    # into global arrays by shard_batch_from_local below. The reference
    # has the same contract: every DDP rank owns an RLDSDataset with a
    # per-rank seed (finetune.py:952-994, torch_utils.py:31-77).
    if data_iter is None:
        data_iter = iter(DummyDataset(
            cfg.model, process_local_batch_size(cfg.batch_size),
            seed=per_process_seed(cfg.seed),
            accum_steps=cfg.grad_accumulation_steps
            if cfg.grad_accumulation_steps > 1 else None,
        ))

    first = next(data_iter)
    example = {k: v for k, v in first.items() if k != "dataset_name"}
    if cfg.grad_accumulation_steps > 1:
        example = jax.tree.map(lambda x: x[0], example)
    example = jax.tree.map(jnp.asarray, example)

    # train_base_int8: initialize with FLOAT kernels (the int8 layout is a
    # storage transform, not an init distribution), then quantize the
    # frozen subtree below. The step model (rt) expects kernel_q/scale.
    init_model = (VLAModel(cfg.model, float_twin(rt))
                  if rt.train_base_int8 else model)
    state = init_train_state(init_model, tx, example,
                             jax.random.key(cfg.seed),
                             lora_enabled=cfg.lora.enabled)
    frozen = state.frozen
    if cfg.frozen_bf16:
        frozen = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            frozen,
        )
    if rt.train_base_int8:
        from vla_adapter_tpu.models.quantize import quantize_params_jax

        # on device: the host twin (quantize_params(jax.device_get(...)))
        # round-trips the full frozen base through the host — minutes on
        # a tunneled chip (BREAKDOWN.md r5)
        frozen = jax.jit(quantize_params_jax)(frozen)
    state = TrainState(
        step=state.step,
        trainable=shard_params(state.trainable, mesh),
        frozen=shard_params(frozen, mesh),
        opt_state=jax.tree.map(
            lambda x: shard_params(x, mesh) if isinstance(x, dict) else x,
            state.opt_state,
            is_leaf=lambda x: isinstance(x, dict),
        ),
    )

    run_dir = Path(cfg.run_root_dir) / get_run_id(cfg)
    if resume:
        ckpt = find_resume_checkpoint(run_dir)
        if ckpt is not None:
            state = load_checkpoint(ckpt, state)

    step_fn = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    metrics = Metrics(run_dir, window=max(cfg.grad_accumulation_steps, 8),
                      run_id=get_run_id(cfg))

    eval_fn = None
    if val_iter is not None:
        from vla_adapter_tpu.train.step import make_eval_step

        eval_fn = jax.jit(make_eval_step(
            model, objective=getattr(cfg, "objective", "l1")))

    def run_validation(step_idx: int, cur_state: TrainState):
        """Averaged eval metrics over val_batches (reference
        run_validation, finetune.py:605-686)."""
        accs = []
        for _ in range(val_batches):
            vb = {k: v for k, v in next(val_iter).items()
                  if k != "dataset_name"}
            vb = shard_batch_from_local(vb, mesh)
            accs.append(jax.device_get(
                eval_fn(cur_state, vb, jax.random.key(step_idx))
            ))
        avg = {f"val_{k}": float(np.mean([a[k] for a in accs]))
               for k in accs[0]}
        metrics.commit(**avg)
        metrics.push(step_idx)
        print(f"step {step_idx} validation: " +
              " ".join(f"{k}={v:.4f}" for k, v in avg.items()), flush=True)

    rng = jax.random.key(cfg.seed + 1)
    start_step = int(jax.device_get(state.step))
    batch = first
    # preemption safety lives inside _train, where the loop-local state is
    # the latest completed step (the reference loses up to save_freq steps)
    state = _train(cfg, state, step_fn, metrics, data_iter, batch, rng,
                   start_step, max_steps, mesh, run_dir,
                   dataset_statistics, run_validation if eval_fn else None)

    save_checkpoint(run_dir, state, dataset_statistics,
                    latest_only=cfg.save_latest_checkpoint_only)
    metrics.close()
    return state


def _train(cfg, state, step_fn, metrics, data_iter, batch, rng, start_step,
           max_steps, mesh, run_dir, dataset_statistics, run_validation):
    # Metrics are materialized one step LATE: float()-ing the current step's
    # metrics would block the host on the device and serialize tf.data prep
    # with TPU compute. Deferring the fetch until after the *next* step is
    # dispatched keeps the device queue full — the previous step has always
    # finished by then, so the commit costs ~nothing.
    pending = None  # (step_idx, device metrics, dataset names of that step)

    # grad-accumulation batches are (A, B/A, ...): the example axis is 1
    batch_axis = 1 if cfg.grad_accumulation_steps > 1 else 0

    def commit(idx, m, names):
        host = dict(m)
        per_sample = host.pop("per_sample", None)
        metrics.commit(**{k: float(v)
                          for k, v in jax.device_get(host).items()})
        if per_sample and names is not None:
            # Per-dataset mixture attribution (reference VLAMetrics
            # per-dataset trackers, training/metrics.py:208-348): pair this
            # PROCESS's per-sample rows with its host-local dataset names —
            # the reference likewise attributes per rank and logs rank 0.
            names_arr = np.asarray(names)
            b_local = names_arr.shape[-1] if names_arr.ndim else 0
            p, nproc = jax.process_index(), jax.process_count()

            def extract(v):
                arr = host_local_rows(v, batch_axis)
                if nproc > 1 and arr.shape[batch_axis] == b_local * nproc:
                    # replicated-output fallback: every process got all
                    # rows — take this process's contiguous block
                    # (make_array_from_process_local_data layout)
                    arr = np.take(arr, range(p * b_local, (p + 1) * b_local),
                                  axis=batch_axis)
                return arr.reshape(-1)

            local = {k: extract(v) for k, v in per_sample.items()}
            flat_names = names_arr.reshape(-1).tolist()
            if all(len(v) == len(flat_names) for v in local.values()):
                metrics.commit_per_dataset(flat_names, local)
        if idx % cfg.log_freq == 0:
            sm = metrics.push(idx)
            print(f"step {idx}: " +
                  " ".join(f"{k}={v:.4f}" for k, v in sm.items()), flush=True)

    try:
        for step_idx in range(start_step, max_steps):
            names = batch.get("dataset_name")
            device_batch = {k: v for k, v in batch.items()
                            if k != "dataset_name"}
            device_batch = shard_batch_from_local(
                device_batch, mesh, batch_axis=batch_axis)
            state, m = step_fn(state, device_batch,
                               jax.random.fold_in(rng, step_idx))
            if pending is not None:
                commit(*pending)
            pending = (step_idx, m, names)
            if step_idx > 0 and step_idx % cfg.save_freq == 0:
                save_checkpoint(run_dir, state, dataset_statistics,
                                latest_only=cfg.save_latest_checkpoint_only)
            if run_validation is not None and step_idx > 0 and (
                    step_idx % cfg.val_freq == 0):
                run_validation(step_idx, state)
            if step_idx + 1 < max_steps:
                batch = next(data_iter)  # host work overlaps the device step
    except KeyboardInterrupt:
        # Preemption-safe save INSIDE the loop scope: `state` here is the
        # latest completed step's state (the donated pre-training state the
        # caller holds would be deleted buffers). If the interrupt landed
        # mid-step the buffers may already be donated — warn, don't mask
        # the interrupt with a second exception.
        print("interrupted — saving checkpoint before exit", flush=True)
        try:
            save_checkpoint(run_dir, state, dataset_statistics,
                            latest_only=cfg.save_latest_checkpoint_only)
        except Exception as e:  # noqa: BLE001
            print(f"interrupt checkpoint failed ({e}); latest saved "
                  "checkpoint stands", flush=True)
        raise
    if pending is not None:
        commit(*pending)
    return state
