"""Checkpoint save/load/resume (orbax).

Reference behavior (finetune.py:494-601 save_training_checkpoint):
per-component files in ``runs/<run_id>--<step>_chkpt/`` plus
``dataset_statistics.json`` (required at inference for unnormalization),
with a ``save_latest_checkpoint_only`` overwrite mode; resume reloads
per-module checkpoints and offsets the step counter
(finetune.py:102-103,195-211,275-278,1056).

TPU-native: one orbax PyTreeCheckpointer per component (trainable /
frozen / opt_state), multi-host-safe (orbax handles the gather the
reference does with rank0 FULL_STATE_DICT + dist.barrier — fsdp.py:95-133).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from vla_adapter_tpu.train.step import TrainState

LATEST = "latest"


def _ckptr():
    return ocp.PyTreeCheckpointer()


def checkpoint_dir(run_dir, step: int, latest_only: bool) -> Path:
    run_dir = Path(run_dir)
    return run_dir / (LATEST if latest_only else f"step-{step:06d}")


def _sync(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(
    run_dir,
    state: TrainState,
    dataset_statistics: Optional[Dict] = None,
    latest_only: bool = True,
) -> Path:
    """Multi-host correct: sharded arrays are handed to orbax as-is (each
    process writes its addressable shards; orbax coordinates), directory
    surgery and metadata happen on process 0 only, with barriers replacing
    the reference's dist.barrier() around checkpoint I/O
    (finetune.py:544,575,601)."""
    step = int(jax.device_get(state.step))  # step is replicated — safe
    final = checkpoint_dir(run_dir, step, latest_only)
    # write into a staging dir and swap at the END: deleting the previous
    # `latest` before the (seconds-to-minutes) orbax write would leave a
    # preempted run with NO valid checkpoint; meta.json is written last so
    # find_resume_checkpoint never sees a half-written dir either way
    out = final.with_name(final.name + ".tmp") if latest_only else final
    if jax.process_index() == 0:
        if out.exists():
            shutil.rmtree(out)
        out.mkdir(parents=True)
    _sync("ckpt_dir_ready")
    ck = _ckptr()
    ck.save(out / "trainable", state.trainable)
    if jax.tree.leaves(state.frozen):
        ck.save(out / "frozen", state.frozen)
    ck.save(out / "opt_state", state.opt_state)
    if jax.process_index() == 0:
        (out / "meta.json").write_text(json.dumps({"step": step}))
        if dataset_statistics is not None:
            (out / "dataset_statistics.json").write_text(
                json.dumps(dataset_statistics, indent=2)
            )
        if latest_only:
            if final.exists():
                shutil.rmtree(final)
            out.rename(final)
    _sync("ckpt_written")
    return final


def _restore_args(target):
    """Per-leaf restore policy: leaves that live on an explicit sharding
    (committed, e.g. via shard_params — incl. cross-process shards) restore
    onto that same sharding; everything else (host numpy, uncommitted
    scalars like Adam's count) restores as host values so jit re-places
    them, exactly like the pre-resume state."""
    from orbax.checkpoint import type_handlers

    def one(x):
        if isinstance(x, jax.Array) and (
            not x.is_fully_addressable or getattr(x, "_committed", False)
        ):
            return type_handlers.ArrayRestoreArgs(
                sharding=x.sharding, global_shape=x.shape, dtype=x.dtype
            )
        return type_handlers.RestoreArgs()

    return jax.tree.map(one, target)


def load_checkpoint(path, state: TrainState) -> TrainState:
    """Restore into the structure of `state` (shapes/shardings preserved —
    sharded leaves come back with the same sharding, multi-host included)."""
    path = Path(path)
    ck = _ckptr()
    meta = json.loads((path / "meta.json").read_text())

    def restore(sub, tree):
        return ck.restore(path / sub, item=tree,
                          restore_args=_restore_args(tree))

    trainable = restore("trainable", state.trainable)
    frozen = state.frozen
    if (path / "frozen").exists():
        frozen = restore("frozen", state.frozen)
    opt_state = restore("opt_state", state.opt_state)
    import jax.numpy as jnp

    return TrainState(
        step=jnp.asarray(meta["step"], jnp.int32),
        trainable=trainable,
        frozen=frozen,
        opt_state=opt_state,
    )


def save_params(path, params: Dict[str, Any]) -> Path:
    """Deployment export: a single merged param tree (post LoRA-merge)."""
    path = Path(path)
    if jax.process_index() == 0 and path.exists():
        shutil.rmtree(path)
    _sync("params_dir_ready")
    _ckptr().save(path, params)
    _sync("params_written")
    return path


def load_params(path, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    return _ckptr().restore(Path(path), item=like)


def find_resume_checkpoint(run_dir) -> Optional[Path]:
    """Latest checkpoint in a run dir, or None."""
    run_dir = Path(run_dir)
    if not run_dir.exists():
        return None
    if (run_dir / LATEST / "meta.json").exists():
        return run_dir / LATEST
    steps = sorted(run_dir.glob("step-*/meta.json"))
    return steps[-1].parent if steps else None
