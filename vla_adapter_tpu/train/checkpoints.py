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
import numpy as np
import orbax.checkpoint as ocp

from vla_adapter_tpu.train.step import TrainState

LATEST = "latest"


def _ckptr():
    return ocp.PyTreeCheckpointer()


def checkpoint_dir(run_dir, step: int, latest_only: bool) -> Path:
    run_dir = Path(run_dir)
    return run_dir / (LATEST if latest_only else f"step-{step:06d}")


def save_checkpoint(
    run_dir,
    state: TrainState,
    dataset_statistics: Optional[Dict] = None,
    latest_only: bool = True,
) -> Path:
    step = int(jax.device_get(state.step))
    out = checkpoint_dir(run_dir, step, latest_only)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    ck = _ckptr()
    host_state = jax.device_get(state)
    ck.save(out / "trainable", host_state.trainable)
    if jax.tree.leaves(host_state.frozen):
        ck.save(out / "frozen", host_state.frozen)
    ck.save(out / "opt_state", host_state.opt_state)
    (out / "meta.json").write_text(json.dumps({"step": step}))
    if dataset_statistics is not None:
        (out / "dataset_statistics.json").write_text(
            json.dumps(dataset_statistics, indent=2)
        )
    return out


def load_checkpoint(path, state: TrainState) -> TrainState:
    """Restore into the structure of `state` (shapes/shardings preserved)."""
    path = Path(path)
    ck = _ckptr()
    meta = json.loads((path / "meta.json").read_text())
    trainable = ck.restore(path / "trainable", item=jax.device_get(state.trainable))
    frozen = state.frozen
    if (path / "frozen").exists():
        frozen = ck.restore(path / "frozen", item=jax.device_get(state.frozen))
    opt_state = ck.restore(path / "opt_state", item=jax.device_get(state.opt_state))
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
    if path.exists():
        shutil.rmtree(path)
    _ckptr().save(path, jax.device_get(params))
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
