"""Goal relabeling (reference rlds/utils/goal_relabeling.py).

BC-style relabeling: each transition gets a goal drawn uniformly from its
future states; goal observation keys are merged into the "task" dict.
"""

from __future__ import annotations

from typing import Dict

import tensorflow as tf


def _tree_merge(*trees: Dict) -> Dict:
    merged: Dict = {}
    for tree in trees:
        for k, v in tree.items():
            if isinstance(v, dict):
                merged[k] = _tree_merge(merged.get(k, {}), v)
            else:
                merged[k] = v
    return merged


def uniform(traj: Dict) -> Dict:
    """Uniform-over-future goal relabel (reference :15-31)."""
    traj_len = tf.shape(tf.nest.flatten(traj["observation"])[0])[0]
    rand = tf.random.uniform([traj_len])
    low = tf.cast(tf.range(traj_len) + 1, tf.float32)
    high = tf.cast(traj_len, tf.float32)
    goal_idxs = tf.cast(rand * (high - low) + low, tf.int32)
    goal_idxs = tf.minimum(goal_idxs, traj_len - 1)
    goal = tf.nest.map_structure(
        lambda x: tf.gather(x, goal_idxs), traj["observation"]
    )
    traj["task"] = _tree_merge(traj["task"], goal)
    return traj
