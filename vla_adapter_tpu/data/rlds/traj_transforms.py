"""Trajectory-level transforms (reference rlds/traj_transforms.py).

Operate on a trajectory dict whose tensors share leading dim = traj length:
  * :func:`chunk_act_obs` — windowed observation history (window_size) and
    future-action chunking (future_action_window_size); past indices are
    floored at 0 (history padding, flagged via observation/pad_mask) and
    future action indices are clamped to the final step (the "repeat last
    action at episode end" semantics the VLA-Adapter L1 objective relies
    on). NOTE the reference truncates the trajectory to
    ``traj_len - future_action_window_size`` frames (the tail frames whose
    chunks would be mostly padding are dropped) — replicated.
  * :func:`subsample` — random frame subset for long trajectories.
  * :func:`add_pad_mask_dict` — per-key validity masks (empty strings are
    padding).
"""

from __future__ import annotations

from typing import Dict

import tensorflow as tf


def chunk_act_obs(traj: Dict, window_size: int,
                  future_action_window_size: int = 0) -> Dict:
    traj_len = tf.shape(traj["action"])[0]
    effective_len = traj_len - future_action_window_size

    base = tf.range(effective_len)[:, None]
    obs_idx = base + tf.range(-window_size + 1, 1)[None, :]
    act_idx = base + tf.range(-window_size + 1,
                              1 + future_action_window_size)[None, :]

    floored_obs_idx = tf.maximum(obs_idx, 0)
    clamped_act_idx = tf.minimum(tf.maximum(act_idx, 0), traj_len - 1)

    traj["observation"] = tf.nest.map_structure(
        lambda x: tf.gather(x, floored_obs_idx), traj["observation"]
    )
    traj["action"] = tf.gather(traj["action"], clamped_act_idx)
    traj["observation"]["pad_mask"] = obs_idx >= 0

    keep = tf.range(effective_len)
    traj["task"] = tf.nest.map_structure(
        lambda x: tf.gather(x, keep), traj["task"]
    )
    for key in ("dataset_name", "absolute_action_mask"):
        if key in traj:
            traj[key] = tf.gather(traj[key], keep)
    return traj


def subsample(traj: Dict, subsample_length: int) -> Dict:
    traj_len = tf.shape(traj["action"])[0]
    if traj_len > subsample_length:
        indices = tf.random.shuffle(tf.range(traj_len))[:subsample_length]
        traj = tf.nest.map_structure(lambda x: tf.gather(x, indices), traj)
    return traj


def add_pad_mask_dict(traj: Dict) -> Dict:
    traj_len = tf.shape(traj["action"])[0]
    for key in ("observation", "task"):
        masks = {}
        for subkey, val in traj[key].items():
            if val.dtype == tf.string:
                masks[subkey] = tf.strings.length(val) != 0
            else:
                masks[subkey] = tf.ones([traj_len], tf.bool)
        traj[key]["pad_mask_dict"] = masks
    return traj
