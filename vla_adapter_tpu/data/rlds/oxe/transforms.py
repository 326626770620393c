"""Per-dataset standardization transforms.

Each transform maps a raw TFDS trajectory into the pre-restructure schema:
action (T, 7) with gripper in RLDS convention (0 = close, 1 = open) and the
proprio keys the registry's ``state_obs_keys`` name (reference
rlds/oxe/transforms.py, 60 transforms). This ships the transforms for the
registry subset in configs.py; the registry pattern widens mechanically.
"""

from __future__ import annotations

from typing import Any, Dict

import tensorflow as tf


def _tf_invert_gripper(actions: tf.Tensor) -> tf.Tensor:
    return 1.0 - actions


def _tf_binarize_gripper(actions: tf.Tensor) -> tf.Tensor:
    """tf twin of data/normalization.binarize_gripper_actions."""
    open_mask = actions > 0.95
    closed_mask = actions < 0.05
    in_between = tf.logical_not(tf.logical_or(open_mask, closed_mask))
    is_open_float = tf.cast(open_mask, tf.float32)

    def scan_fn(carry, i):
        return tf.cond(in_between[i], lambda: tf.cast(carry, tf.float32),
                       lambda: is_open_float[i])

    return tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), actions[-1],
                   reverse=True)


def _tf_rel2abs_gripper(actions: tf.Tensor) -> tf.Tensor:
    """tf twin of data/normalization.rel2abs_gripper_actions."""
    opening_mask = actions < -0.1
    closing_mask = actions > 0.1
    thresholded = tf.where(opening_mask, 1, tf.where(closing_mask, -1, 0))

    def scan_fn(carry, i):
        return tf.cond(thresholded[i] == 0, lambda: carry,
                       lambda: thresholded[i])

    start = -1 * thresholded[tf.argmax(thresholded != 0, axis=0)]
    start = tf.cond(start == 0, lambda: 1, lambda: start)
    new = tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), start)
    return tf.cast(new, tf.float32) / 2 + 0.5


def libero_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """LIBERO: gripper -1(open)..1(close) -> clip [0,1], flip -> 1=open
    (reference transforms.py:827-843)."""
    gripper = _tf_invert_gripper(tf.clip_by_value(traj["action"][:, -1:], 0, 1))
    traj["action"] = tf.concat([traj["action"][:, :6], gripper], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -2:]
    return traj


def calvin_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """CALVIN: gripper clip [0,1] (already 1=open); gripper_state =
    [state[6], state[-1]] (reference transforms.py:845-870)."""
    gripper = tf.clip_by_value(traj["action"][:, -1:], 0, 1)
    traj["action"] = tf.concat([traj["action"][:, :6], gripper], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = tf.concat(
        [traj["observation"]["state"][:, 6:7],
         traj["observation"]["state"][:, -1:]], axis=1,
    )
    return traj


def bridge_orig_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Bridge V2: drop the final (action-less) step, binarize gripper."""
    for key in list(traj.keys()):
        traj[key] = tf.nest.map_structure(lambda x: x[:-1], traj[key])
    gripper = _tf_binarize_gripper(traj["action"][:, -1])
    traj["action"] = tf.concat(
        [traj["action"][:, :6], gripper[:, None]], axis=1
    )
    traj["observation"]["EEF_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    return traj


def rt1_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """RT-1/fractal: world-vector + rotation-delta actions; relative
    gripper -> absolute."""
    a = traj["action"]
    gripper = _tf_rel2abs_gripper(a["gripper_closedness_action"][:, 0])
    traj["action"] = tf.concat(
        [a["world_vector"], a["rotation_delta"], gripper[:, None]], axis=1
    )
    return traj


def kuka_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    a = traj["action"]
    gripper = _tf_rel2abs_gripper(a["gripper_closedness_action"][:, 0])
    traj["action"] = tf.concat(
        [a["world_vector"], a["rotation_delta"], gripper[:, None]], axis=1
    )
    return traj


def taco_play_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    obs = traj["observation"]
    obs["state_eef"] = obs["robot_obs"][:, :6]
    obs["state_gripper"] = obs["robot_obs"][:, 7:8]
    a = traj["action"]["rel_actions_world"]
    gripper = tf.clip_by_value(a[:, -1:], 0, 1)
    traj["action"] = tf.concat([a[:, :6], gripper], axis=1)
    return traj


def jaco_play_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    obs = traj["observation"]
    obs["state_eef"] = obs["end_effector_cartesian_pos"][:, :6]
    obs["state_gripper"] = obs["end_effector_cartesian_pos"][:, -1:]
    a = traj["action"]
    gripper = _tf_invert_gripper(
        tf.cast(a["gripper_closedness_action"] > 0, tf.float32)
    )
    traj["action"] = tf.concat(
        [a["world_vector"], tf.zeros_like(a["world_vector"]), gripper],
        axis=1,
    )
    return traj


def berkeley_autolab_ur5_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    a = traj["action"]
    gripper = _tf_invert_gripper(
        tf.cast(a["gripper_closedness_action"][:, None] > 0, tf.float32)
    )
    traj["action"] = tf.concat(
        [a["world_vector"], a["rotation_delta"], gripper], axis=1
    )
    return traj


def roboturk_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    a = traj["action"]
    gripper = _tf_invert_gripper(
        tf.clip_by_value(a["gripper_closedness_action"], 0, 1)
    )
    traj["action"] = tf.concat(
        [a["world_vector"], a["rotation_delta"], gripper], axis=1
    )
    return traj


def viola_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    a = traj["action"]
    gripper = _tf_invert_gripper(
        tf.clip_by_value(a["gripper_closedness_action"][:, None], 0, 1)
    )
    traj["action"] = tf.concat(
        [a["world_vector"], a["rotation_delta"], gripper], axis=1
    )
    return traj


def toto_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    a = traj["action"]
    gripper = tf.cast(a["open_gripper"][:, None], tf.float32)
    traj["action"] = tf.concat(
        [a["world_vector"], a["rotation_delta"], gripper], axis=1
    )
    return traj


def stanford_hydra_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    traj["action"] = tf.concat(
        [traj["action"][:, :6],
         _tf_invert_gripper(traj["action"][:, -1:])], axis=1
    )
    obs = traj["observation"]
    obs["eef_state"] = tf.concat(
        [obs["state"][:, :3], obs["state"][:, 7:10]], axis=1
    )
    obs["gripper_state"] = obs["state"][:, -3:-2]
    return traj


def austin_buds_dataset_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    traj["action"] = tf.concat(
        [traj["action"][:, :6],
         _tf_invert_gripper(tf.clip_by_value(traj["action"][:, -1:], 0, 1))],
        axis=1,
    )
    traj["observation"]["state"] = traj["observation"]["state"][:, :8]
    return traj


def identity_transform(traj: Dict[str, Any]) -> Dict[str, Any]:
    """Datasets already in the standard format (e.g. ALOHA regenerations)."""
    return traj


OXE_STANDARDIZATION_TRANSFORMS = {
    "libero_spatial_no_noops": libero_dataset_transform,
    "libero_object_no_noops": libero_dataset_transform,
    "libero_goal_no_noops": libero_dataset_transform,
    "libero_10_no_noops": libero_dataset_transform,
    "libero_4_task_suites_no_noops": libero_dataset_transform,
    "calvin_abc": calvin_dataset_transform,
    "calvin": calvin_dataset_transform,
    "bridge_orig": bridge_orig_dataset_transform,
    "fractal20220817_data": rt1_dataset_transform,
    "kuka": kuka_dataset_transform,
    "taco_play": taco_play_dataset_transform,
    "jaco_play": jaco_play_dataset_transform,
    "berkeley_autolab_ur5": berkeley_autolab_ur5_dataset_transform,
    "roboturk": roboturk_dataset_transform,
    "viola": viola_dataset_transform,
    "toto": toto_dataset_transform,
    "stanford_hydra_dataset_converted_externally_to_rlds": stanford_hydra_dataset_transform,
    "austin_buds_dataset_converted_externally_to_rlds": austin_buds_dataset_transform,
    "aloha1_fold_shorts_20_demos": identity_transform,
}
