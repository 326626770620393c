"""Dataset statistics + action/proprio normalization.

Format-compatible with the reference's `dataset_statistics.json` and the
`norm_stats` dict embedded in checkpoints (reference
rlds/utils/data_utils.py:176-284, configuration_prismatic.py norm_stats):
per-dataset {"action": {...}, "proprio": {...}, "num_transitions",
"num_trajectories"} with min/max/mean/std/q01/q99 lists and an optional
boolean "mask" marking dims to normalize (gripper dim excluded).

Schemes (reference constants.py:19-24 + data_utils.py:52-127):
  NORMAL      x -> (x - mean) / (std + eps)
  BOUNDS      x -> clip(2 (x - min) / (max - min + eps) - 1, -1, 1)
  BOUNDS_Q99  x -> clip(2 (x - q01) / (q99 - q01 + eps) - 1, -1, 1)
Dims where mask is False pass through; degenerate dims (hi == lo) map to 0.
Unnormalization matches reference modeling_prismatic.py:786-805:
  x -> 0.5 (a + 1) (hi - lo + 1e-8) + lo  on masked dims.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from vla_adapter_tpu.core.constants import NormalizationType

_EPS = 1e-8


def compute_statistics(arr: np.ndarray) -> Dict[str, list]:
    """Per-dim stats over a (N, D) array."""
    arr = np.asarray(arr, np.float64)
    return {
        "mean": arr.mean(0).tolist(),
        "std": arr.std(0).tolist(),
        "max": arr.max(0).tolist(),
        "min": arr.min(0).tolist(),
        "q01": np.quantile(arr, 0.01, axis=0).tolist(),
        "q99": np.quantile(arr, 0.99, axis=0).tolist(),
    }


def dataset_statistics(
    actions: np.ndarray,
    proprio: Optional[np.ndarray] = None,
    num_trajectories: int = 0,
    action_mask: Optional[np.ndarray] = None,
) -> Dict:
    stats = {
        "action": compute_statistics(actions),
        "num_transitions": int(actions.shape[0]),
        "num_trajectories": int(num_trajectories),
    }
    if action_mask is not None:
        stats["action"]["mask"] = np.asarray(action_mask, bool).tolist()
    if proprio is not None:
        stats["proprio"] = compute_statistics(proprio)
    return stats


def statistics_cache_key(dataset_name: str, spec: str) -> str:
    """sha256 cache key (reference data_utils.py:231-247 keys on the
    dataset spec string)."""
    return hashlib.sha256((dataset_name + spec).encode()).hexdigest()


def save_dataset_statistics(stats: Dict[str, Dict], path) -> None:
    """Write `dataset_statistics.json` next to checkpoints (reference
    data_utils.py:265-284) — REQUIRED at inference for unnormalization."""
    Path(path).write_text(json.dumps(stats, indent=2))


def load_dataset_statistics(path) -> Dict:
    return json.loads(Path(path).read_text())


def _bounds(stats: Dict, norm_type: NormalizationType):
    if norm_type == NormalizationType.BOUNDS:
        return np.asarray(stats["min"]), np.asarray(stats["max"])
    if norm_type == NormalizationType.BOUNDS_Q99:
        return np.asarray(stats["q01"]), np.asarray(stats["q99"])
    raise ValueError(f"unsupported normalization: {norm_type}")


def _mask(stats: Dict) -> np.ndarray:
    if "mask" in stats:
        return np.asarray(stats["mask"], bool)
    return np.ones(len(stats["min"]), bool)


def normalize(
    x: np.ndarray, stats: Dict, norm_type: NormalizationType
) -> np.ndarray:
    x = np.asarray(x, np.float64)
    if norm_type == NormalizationType.NORMAL:
        mean, std = np.asarray(stats["mean"]), np.asarray(stats["std"])
        out = (x - mean) / (std + _EPS)
        return np.where(_mask(stats), out, x).astype(np.float32)
    lo, hi = _bounds(stats, norm_type)
    out = np.clip(2.0 * (x - lo) / (hi - lo + _EPS) - 1.0, -1.0, 1.0)
    out = np.where(_mask(stats), out, x)
    # Degenerate dims (min == max — NOT q01 == q99, and regardless of mask)
    # map to 0, matching reference data_utils.py:86-89 exactly.
    degenerate = np.asarray(stats["min"]) == np.asarray(stats["max"])
    return np.where(degenerate, 0.0, out).astype(np.float32)


def unnormalize(
    a: np.ndarray, stats: Dict, norm_type: NormalizationType
) -> np.ndarray:
    """Inverse for BOUNDS/BOUNDS_Q99 (reference :786-805)."""
    a = np.asarray(a, np.float64)
    lo, hi = _bounds(stats, norm_type)
    out = 0.5 * (a + 1.0) * (hi - lo + _EPS) + lo
    return np.where(_mask(stats), out, a).astype(np.float32)


# Gripper-action relabeling helpers (reference data_utils.py:20-50;
# behavior-parity reimplementations, numpy instead of tf).

def binarize_gripper_actions(actions: np.ndarray) -> np.ndarray:
    """Continuous [0,1] gripper -> binary, exactly reference
    data_utils.py:100-127: backwards scan; in-between values (0.05..0.95)
    inherit the NEXT definitive value; a trailing in-between run inherits
    the RAW final action value."""
    actions = np.asarray(actions, np.float32)
    open_mask = actions > 0.95
    closed_mask = actions < 0.05
    in_between = ~(open_mask | closed_mask)
    out = np.empty_like(actions)
    carry = actions[-1]
    for i in range(len(actions) - 1, -1, -1):
        carry = carry if in_between[i] else float(open_mask[i])
        out[i] = carry
    return out


def rel2abs_gripper_actions(actions: np.ndarray) -> np.ndarray:
    """Relative (-1 region = opening, +1 region = closing per the
    reference's thresholds) -> absolute (0 = closed, 1 = open); exactly
    reference data_utils.py:130-151 incl. the inferred start state
    (opposite of the first nonzero change; open when no change at all)."""
    actions = np.asarray(actions, np.float32)
    thresh = np.where(actions < -0.1, 1, np.where(actions > 0.1, -1, 0))
    nz = np.nonzero(thresh)[0]
    start = int(-thresh[nz[0]]) if len(nz) else 1
    if start == 0:  # parity with the reference's guard
        start = 1
    out = np.empty(len(actions), np.float32)
    carry = start
    for i in range(len(actions)):
        if thresh[i] != 0:
            carry = int(thresh[i])
        out[i] = carry
    return out / 2.0 + 0.5


def invert_gripper_actions(actions: np.ndarray) -> np.ndarray:
    return 1.0 - np.asarray(actions)


def relabel_bridge_actions(actions: np.ndarray, states: np.ndarray):
    """Bridge-V2 relabel (reference data_utils.py:156-162): movement = state
    deltas; keeps the original gripper dim; drops the last (action-less)
    timestep. Returns (T-1, action_dim)."""
    movement = states[1:, :6] - states[:-1, :6]
    return np.concatenate([movement, actions[:-1, -1:]], axis=1)
