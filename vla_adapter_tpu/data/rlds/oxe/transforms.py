"""Per-dataset standardization transforms — full catalog.

Each transform maps a raw TFDS trajectory into the pre-restructure schema
(action (T, 7) with RLDS gripper convention 0 = close / 1 = open, plus the
proprio keys named by the registry's ``state_obs_keys``). Semantics match
the reference registry (rlds/oxe/transforms.py) per dataset; shared
mechanics are factored into combinators rather than repeated per function.

Quaternion/Euler math is plain tf (the reference pulls in
tensorflow_graphics, absent here) — see :func:`quat_to_euler`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import tensorflow as tf

Traj = Dict[str, Any]


# --------------------------------------------------------------------------
# math + gripper helpers
# --------------------------------------------------------------------------


def quat_to_euler(quat: tf.Tensor) -> tf.Tensor:
    """(x, y, z, w) quaternion -> (roll, pitch, yaw); matches
    tensorflow_graphics euler.from_quaternion conventions."""
    x, y, z, w = tf.unstack(quat, axis=-1)
    roll = tf.atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = tf.asin(tf.clip_by_value(2 * (w * y - z * x), -1.0, 1.0))
    yaw = tf.atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return tf.stack([roll, pitch, yaw], axis=-1)


def invert_gripper(actions: tf.Tensor) -> tf.Tensor:
    return 1.0 - actions


def binarize_gripper(actions: tf.Tensor) -> tf.Tensor:
    """Backwards-scan binarization (reference data_utils.py:100-127; see
    data/normalization.py for the numpy twin + parity test)."""
    open_mask = actions > 0.95
    closed_mask = actions < 0.05
    in_between = tf.logical_not(tf.logical_or(open_mask, closed_mask))
    is_open_float = tf.cast(open_mask, tf.float32)

    def scan_fn(carry, i):
        return tf.cond(in_between[i], lambda: tf.cast(carry, tf.float32),
                       lambda: is_open_float[i])

    return tf.scan(scan_fn, tf.range(tf.shape(actions)[0]), actions[-1],
                   reverse=True)


def rel2abs_gripper(actions: tf.Tensor) -> tf.Tensor:
    """Relative open/close commands -> absolute 0/1 state (reference
    data_utils.py:130-151)."""
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


# --------------------------------------------------------------------------
# combinators
# --------------------------------------------------------------------------


def _lang_from_obs(traj: Traj) -> Traj:
    traj["language_instruction"] = traj["observation"][
        "natural_language_instruction"
    ]
    return traj


def _rt1_style(lang_from_obs: bool = True,
               extra: Optional[Callable[[Traj], Traj]] = None):
    """action dict {world_vector, rotation_delta, gripper_closedness_action}
    with rel2abs gripper (fractal/kuka/jaco/nyu_door family)."""

    def fn(traj: Traj) -> Traj:
        a = traj["action"]
        grip = a["gripper_closedness_action"]
        if grip.shape.ndims == 2:
            grip = grip[:, 0]
        gripper = rel2abs_gripper(grip)
        traj["action"] = tf.concat(
            (a["world_vector"], a["rotation_delta"], gripper[:, None]), axis=-1
        )
        if lang_from_obs:
            _lang_from_obs(traj)
        if extra is not None:
            traj = extra(traj)
        return traj

    return fn


def _eef_invert_clip_gripper(state_slice: Optional[Callable[[Traj], None]] = None):
    """action (T, >=7): keep 6 EEF dims, invert(clip(gripper)) (austin_*/
    viola-style tail); optional in-place proprio extraction."""

    def fn(traj: Traj) -> Traj:
        traj["action"] = tf.concat(
            (traj["action"][:, :6],
             invert_gripper(tf.clip_by_value(traj["action"][:, -1:], 0, 1))),
            axis=-1,
        )
        if state_slice is not None:
            state_slice(traj)
        return traj

    return fn


def _drop_last_action_dim(state_fn: Optional[Callable[[Traj], None]] = None):
    def fn(traj: Traj) -> Traj:
        traj["action"] = traj["action"][..., :-1]
        if state_fn is not None:
            state_fn(traj)
        return traj

    return fn


def _eef_state_tail(traj: Traj) -> None:
    traj["observation"]["eef_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]


# --------------------------------------------------------------------------
# dataset transforms
# --------------------------------------------------------------------------


def bridge_oxe_dataset_transform(traj: Traj) -> Traj:
    """OXE-mixture Bridge V2: drop the all-zero first step, dict action,
    cast open_gripper; then state-delta relabel."""
    for key in list(traj.keys()):
        if key == "traj_metadata":
            continue
        if key in ("observation", "action"):
            for k2 in traj[key]:
                traj[key][k2] = traj[key][k2][1:]
        else:
            traj[key] = traj[key][1:]
    a = traj["action"]
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"],
         tf.cast(a["open_gripper"][:, None], tf.float32)), axis=-1,
    )
    _lang_from_obs(traj)
    return _relabel_bridge(traj)


def bridge_orig_dataset_transform(traj: Traj) -> Traj:
    """Official Bridge V2: drop first step, binarize gripper, relabel."""
    for key in list(traj.keys()):
        if key == "traj_metadata":
            continue
        if key == "observation":
            for k2 in traj[key]:
                traj[key][k2] = traj[key][k2][1:]
        else:
            traj[key] = traj[key][1:]
    traj["action"] = tf.concat(
        (traj["action"][:, :6],
         binarize_gripper(traj["action"][:, -1])[:, None]), axis=1,
    )
    return _relabel_bridge(traj)


def _relabel_bridge(traj: Traj) -> Traj:
    """Relabel to reached-state deltas, drop the final step (reference
    data_utils.py relabel_bridge_actions)."""
    movement = (traj["observation"]["state"][1:, :6]
                - traj["observation"]["state"][:-1, :6])
    truncated = tf.nest.map_structure(lambda x: x[:-1], traj)
    truncated["action"] = tf.concat(
        [movement, traj["action"][:-1, -1:]], axis=1
    )
    truncated["observation"]["EEF_state"] = truncated["observation"]["state"][:, :6]
    truncated["observation"]["gripper_state"] = truncated["observation"]["state"][:, -1:]
    return truncated


def ppgm_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6],
         binarize_gripper(traj["action"][:, -1])[:, None]), axis=1,
    )
    traj["observation"]["EEF_state"] = traj["observation"]["cartesian_position"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["gripper_position"][:, -1:]
    return traj


rt1_dataset_transform = _rt1_style()


def kuka_dataset_transform(traj: Traj) -> Traj:
    traj = _rt1_style(lang_from_obs=False)(traj)
    # ZLIB-compressed proprio blobs -> dense tensors
    eef = tf.io.decode_raw(
        tf.io.decode_compressed(
            traj["observation"]["clip_function_input/base_pose_tool_reached"],
            compression_type="ZLIB"),
        tf.float32,
    )
    traj["observation"]["clip_function_input/base_pose_tool_reached"] = (
        tf.reshape(eef, (-1, 7))
    )
    grip = tf.io.decode_raw(
        tf.io.decode_compressed(traj["observation"]["gripper_closed"],
                                compression_type="ZLIB"),
        tf.float32,
    )
    traj["observation"]["gripper_closed"] = tf.reshape(grip, (-1, 1))
    return _lang_from_obs(traj)


def taco_play_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["state_eef"] = obs["robot_obs"][:, :6]
    obs["state_gripper"] = obs["robot_obs"][:, 7:8]
    a = traj["action"]["rel_actions_world"]
    traj["action"] = tf.concat(
        (a[:, :6], tf.clip_by_value(a[:, -1:], 0, 1)), axis=-1
    )
    return _lang_from_obs(traj)


def jaco_play_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["state_eef"] = obs["end_effector_cartesian_pos"][:, :6]
    obs["state_gripper"] = obs["end_effector_cartesian_pos"][:, -1:]
    a = traj["action"]
    gripper = rel2abs_gripper(a["gripper_closedness_action"][:, 0])
    traj["action"] = tf.concat(
        (a["world_vector"], tf.zeros_like(a["world_vector"]),
         gripper[:, None]), axis=-1,
    )
    return _lang_from_obs(traj)


def berkeley_cable_routing_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"],
         tf.zeros_like(a["world_vector"][:, :1])), axis=-1,
    )
    return _lang_from_obs(traj)


def roboturk_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    gripper = invert_gripper(
        tf.clip_by_value(a["gripper_closedness_action"], 0, 1)
    )
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"], gripper), axis=-1
    )
    return _lang_from_obs(traj)


nyu_door_opening_dataset_transform = _rt1_style()


def viola_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    gripper = invert_gripper(
        tf.clip_by_value(a["gripper_closedness_action"][:, None], 0, 1)
    )
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"], gripper), axis=-1
    )
    return _lang_from_obs(traj)


def berkeley_autolab_ur5_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["state"] = obs["robot_state"][:, 6:14]
    obs["depth"] = obs.pop("image_with_depth")
    a = traj["action"]
    gripper = rel2abs_gripper(a["gripper_closedness_action"])
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"], gripper[:, None]), axis=-1
    )
    return _lang_from_obs(traj)


def toto_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"],
         tf.cast(a["open_gripper"][:, None], tf.float32)), axis=-1,
    )
    return _lang_from_obs(traj)


def language_table_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"], tf.zeros_like(traj["action"]),
         tf.zeros_like(traj["action"]),
         tf.ones_like(traj["action"][:, :1])), axis=-1,
    )
    # instruction is a padded unicode-codepoint tensor
    encoded = tf.strings.unicode_encode(
        traj["observation"]["instruction"], output_encoding="UTF-8"
    )
    traj["language_instruction"] = tf.strings.split(
        encoded, "\x00"
    )[:, :1].to_tensor()[:, 0]
    return traj


def pusht_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    traj["action"] = tf.concat(
        (a["world_vector"], a["rotation_delta"],
         a["gripper_closedness_action"][:, None]), axis=-1,
    )
    return _lang_from_obs(traj)


def stanford_kuka_multimodal_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["depth_image"] = traj["observation"]["depth_image"][..., 0]
    traj["action"] = tf.concat(
        (traj["action"][:, :3], tf.zeros_like(traj["action"][:, :3]),
         traj["action"][:, -1:]), axis=-1,
    )
    return traj


def nyu_rot_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["observation"]["state"][..., :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][..., -1:]
    traj["action"] = traj["action"][..., :7]
    return traj


def stanford_hydra_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6], invert_gripper(traj["action"][:, -1:])),
        axis=-1,
    )
    obs = traj["observation"]
    obs["eef_state"] = tf.concat(
        (obs["state"][:, :3], obs["state"][:, 7:10]), axis=-1
    )
    obs["gripper_state"] = obs["state"][:, -3:-2]
    return traj


def _austin_state8(traj: Traj) -> None:
    traj["observation"]["state"] = traj["observation"]["state"][:, :8]


austin_buds_dataset_transform = _eef_invert_clip_gripper(_austin_state8)


def nyu_franka_play_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["depth"] = tf.cast(obs["depth"][..., 0], tf.float32)
    obs["depth_additional_view"] = tf.cast(
        obs["depth_additional_view"][..., 0], tf.float32
    )
    obs["eef_state"] = obs["state"][:, -6:]
    traj["action"] = tf.concat(
        (traj["action"][:, -8:-2],
         tf.clip_by_value(traj["action"][:, -2:-1], 0, 1)), axis=-1,
    )
    return traj


def maniskill_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["gripper_state"] = traj["observation"]["state"][..., 7:8]
    return traj


def furniture_bench_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["state"] = tf.concat(
        (obs["state"][:, :7], obs["state"][:, -1:]), axis=-1
    )
    traj["action"] = tf.concat(
        (traj["action"][:, :3], quat_to_euler(traj["action"][:, 3:7]),
         invert_gripper(tf.clip_by_value(traj["action"][:, -1:], 0, 1))),
        axis=-1,
    )
    return traj


def cmu_franka_exploration_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = traj["action"][..., :-1]
    return traj


def ucsd_kitchen_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["joint_state"] = traj["observation"]["state"][:, :7]
    traj["action"] = traj["action"][..., :-1]
    return traj


def ucsd_pick_place_dataset_transform(traj: Traj) -> Traj:
    _eef_state_tail(traj)
    traj["action"] = tf.concat(
        (traj["action"][:, :3], tf.zeros_like(traj["action"][:, :3]),
         traj["action"][:, -1:]), axis=-1,
    )
    return traj


austin_sailor_dataset_transform = _eef_invert_clip_gripper()
austin_sirius_dataset_transform = _eef_invert_clip_gripper()


def bc_z_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    traj["action"] = tf.concat(
        (a["future/xyz_residual"][:, :3],
         a["future/axis_angle_residual"][:, :3],
         invert_gripper(tf.cast(a["future/target_close"][:, :1], tf.float32))),
        axis=-1,
    )
    return _lang_from_obs(traj)


def _pr2_style(traj: Traj) -> Traj:
    _eef_state_tail(traj)
    traj["action"] = traj["action"][..., :-1]
    return traj


tokyo_pr2_opening_fridge_dataset_transform = _pr2_style
tokyo_pr2_tabletop_manipulation_dataset_transform = _pr2_style


def utokyo_xarm_pick_place_dataset_transform(traj: Traj) -> Traj:
    return traj


def utokyo_xarm_bimanual_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = traj["action"][..., -7:]
    return traj


def robo_net_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["eef_state"] = tf.concat(
        (obs["state"][:, :4], tf.zeros_like(obs["state"][:, :2])), axis=-1
    )
    obs["gripper_state"] = obs["state"][:, -1:]
    traj["action"] = tf.concat(
        (traj["action"][:, :4], tf.zeros_like(traj["action"][:, :2]),
         traj["action"][:, -1:]), axis=-1,
    )
    return traj


def identity_transform(traj: Traj) -> Traj:
    return traj


berkeley_mvp_dataset_transform = identity_transform
berkeley_rpt_dataset_transform = identity_transform


def kaist_nonprehensible_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["state"] = traj["observation"]["state"][:, -7:]
    traj["action"] = tf.concat(
        (traj["action"][:, :6], tf.zeros_like(traj["action"][:, :1])),
        axis=-1,
    )
    return traj


def stanford_mask_vit_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["eef_state"] = tf.concat(
        (obs["end_effector_pose"][:, :4],
         tf.zeros_like(obs["end_effector_pose"][:, :2])), axis=-1,
    )
    obs["gripper_state"] = obs["end_effector_pose"][:, -1:]
    traj["action"] = tf.concat(
        (traj["action"][:, :4], tf.zeros_like(traj["action"][:, :2]),
         traj["action"][:, -1:]), axis=-1,
    )
    return traj


def tokyo_lsmo_dataset_transform(traj: Traj) -> Traj:
    _eef_state_tail(traj)
    return traj


dlr_sara_pour_dataset_transform = identity_transform


def dlr_sara_grid_clamp_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["state"] = traj["observation"]["state"][:, :6]
    return traj


def dlr_edan_shared_control_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6], invert_gripper(traj["action"][:, -1:])),
        axis=-1,
    )
    return traj


def asu_table_top_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["eef_state"] = traj["ground_truth_states"]["EE"]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -1:]
    return traj


def robocook_dataset_transform(traj: Traj) -> Traj:
    _eef_state_tail(traj)
    return traj


def imperial_wristcam_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = traj["action"][..., :-1]
    return traj


def iamlab_pick_insert_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["joint_state"] = obs["state"][:, :7]
    obs["gripper_state"] = obs["state"][:, 7:8]
    traj["action"] = tf.concat(
        (traj["action"][:, :3], quat_to_euler(traj["action"][:, 3:7]),
         traj["action"][:, 7:8]), axis=-1,
    )
    return traj


def uiuc_d3field_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"], tf.zeros_like(traj["action"]),
         tf.zeros_like(traj["action"][:, :1])), axis=-1,
    )
    return traj


utaustin_mutex_dataset_transform = _eef_invert_clip_gripper(_austin_state8)


def berkeley_fanuc_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["joint_state"] = obs["state"][:, :6]
    obs["gripper_state"] = obs["state"][:, 6:7]
    traj["action"] = tf.concat(
        (traj["action"], invert_gripper(obs["gripper_state"])), axis=-1
    )
    return traj


def cmu_playing_with_food_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :3], quat_to_euler(traj["action"][:, 3:7]),
         traj["action"][:, -1:]), axis=-1,
    )
    return traj


def playfusion_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :3], traj["action"][:, -4:]), axis=-1
    )
    return traj


def cmu_stretch_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["eef_state"] = tf.concat(
        (obs["state"][:, :3], tf.zeros_like(obs["state"][:, :3])), axis=-1
    )
    obs["gripper_state"] = obs["state"][:, -1:]
    traj["action"] = traj["action"][..., :-1]
    return traj


def gnm_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["state"] = tf.concat(
        (obs["position"], tf.zeros_like(obs["state"][:, :3]), obs["yaw"]),
        axis=-1,
    )
    traj["action"] = tf.concat(
        (traj["action"], tf.zeros_like(traj["action"]),
         tf.zeros_like(traj["action"]),
         tf.zeros_like(traj["action"][:, :1])), axis=-1,
    )
    return traj


def fmb_dataset_transform(traj: Traj) -> Traj:
    obs = traj["observation"]
    obs["proprio"] = tf.concat(
        (obs["eef_pose"], obs["state_gripper_pose"][..., None]), axis=-1
    )
    return traj


def dobbe_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["proprio"] = traj["observation"]["state"]
    return traj


def roboset_dataset_transform(traj: Traj) -> Traj:
    traj["observation"]["proprio"] = traj["observation"]["state"]
    gripper = invert_gripper(tf.clip_by_value(traj["action"][:, -1:], 0, 1))
    traj["action"] = tf.concat((traj["action"][:, :7], gripper), axis=-1)
    return traj


def rh20t_dataset_transform(traj: Traj) -> Traj:
    a = traj["action"]
    traj["action"] = tf.concat(
        (a["tcp_base"], tf.cast(a["gripper"][:, None], tf.float32)), axis=-1
    )
    obs = traj["observation"]
    obs["proprio"] = tf.concat(
        (obs["tcp_base"], obs["gripper_width"][..., None]), axis=-1
    )
    return traj


def droid_baseact_transform(traj: Traj) -> Traj:
    """DROID with base-frame velocity actions + random exterior-cam swap."""
    a = traj["action_dict"]
    traj["action"] = tf.concat(
        (a["cartesian_velocity"][:, :3], a["cartesian_velocity"][:, 3:6],
         1 - a["gripper_position"]), axis=-1,
    )
    obs = traj["observation"]
    swap = tf.random.uniform(shape=[]) > 0.5
    img1, img2 = obs["exterior_image_1_left"], obs["exterior_image_2_left"]
    obs["exterior_image_1_left"] = tf.cond(swap, lambda: img1, lambda: img2)
    obs["exterior_image_2_left"] = tf.cond(swap, lambda: img2, lambda: img1)
    obs["proprio"] = tf.concat(
        (obs["cartesian_position"], obs["gripper_position"]), axis=-1
    )
    return traj


def droid_finetuning_transform(traj: Traj) -> Traj:
    a = traj["action_dict"]
    traj["action"] = tf.concat(
        (a["cartesian_velocity"][:, :3], a["cartesian_velocity"][:, 3:6],
         1 - a["gripper_position"]), axis=-1,
    )
    obs = traj["observation"]
    obs["proprio"] = tf.concat(
        (obs["cartesian_position"], obs["gripper_position"]), axis=-1
    )
    return traj


def tdroid_dataset_transform(traj: Traj) -> Traj:
    traj["action"] = tf.concat(
        (traj["action"][:, :6],
         binarize_gripper(traj["action"][:, -1])[:, None]), axis=1,
    )
    traj["observation"]["EEF_state"] = traj["observation"]["cartesian_position"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["gripper_position"][:, -1:]
    return traj


def libero_dataset_transform(traj: Traj) -> Traj:
    """LIBERO: gripper -1(open)..1(close) -> clip [0,1], flip -> 1=open."""
    gripper = invert_gripper(tf.clip_by_value(traj["action"][:, -1:], 0, 1))
    traj["action"] = tf.concat([traj["action"][:, :6], gripper], axis=1)
    traj["observation"]["EEF_state"] = traj["observation"]["state"][:, :6]
    traj["observation"]["gripper_state"] = traj["observation"]["state"][:, -2:]
    return traj


def calvin_dataset_transform(traj: Traj) -> Traj:
    """CALVIN: gripper clip [0,1] (already 1=open); gripper_state =
    [state[6], state[-1]]."""
    gripper = tf.clip_by_value(traj["action"][:, -1:], 0, 1)
    traj["action"] = tf.concat([traj["action"][:, :6], gripper], axis=1)
    obs = traj["observation"]
    obs["EEF_state"] = obs["state"][:, :6]
    obs["gripper_state"] = tf.concat(
        (obs["state"][:, 6:7], obs["state"][:, -1:]), axis=1
    )
    return traj


aloha_dataset_transform = identity_transform


OXE_STANDARDIZATION_TRANSFORMS = {
    "bridge_oxe": bridge_oxe_dataset_transform,
    "bridge_orig": bridge_orig_dataset_transform,
    "bridge_dataset": bridge_orig_dataset_transform,
    "ppgm": ppgm_dataset_transform,
    "ppgm_static": ppgm_dataset_transform,
    "ppgm_wrist": ppgm_dataset_transform,
    "fractal20220817_data": rt1_dataset_transform,
    "kuka": kuka_dataset_transform,
    "taco_play": taco_play_dataset_transform,
    "jaco_play": jaco_play_dataset_transform,
    "berkeley_cable_routing": berkeley_cable_routing_dataset_transform,
    "roboturk": roboturk_dataset_transform,
    "nyu_door_opening_surprising_effectiveness": nyu_door_opening_dataset_transform,
    "viola": viola_dataset_transform,
    "berkeley_autolab_ur5": berkeley_autolab_ur5_dataset_transform,
    "toto": toto_dataset_transform,
    "language_table": language_table_dataset_transform,
    "columbia_cairlab_pusht_real": pusht_dataset_transform,
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": stanford_kuka_multimodal_dataset_transform,
    "nyu_rot_dataset_converted_externally_to_rlds": nyu_rot_dataset_transform,
    "stanford_hydra_dataset_converted_externally_to_rlds": stanford_hydra_dataset_transform,
    "austin_buds_dataset_converted_externally_to_rlds": austin_buds_dataset_transform,
    "nyu_franka_play_dataset_converted_externally_to_rlds": nyu_franka_play_dataset_transform,
    "maniskill_dataset_converted_externally_to_rlds": maniskill_dataset_transform,
    "furniture_bench_dataset_converted_externally_to_rlds": furniture_bench_dataset_transform,
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": cmu_franka_exploration_dataset_transform,
    "ucsd_kitchen_dataset_converted_externally_to_rlds": ucsd_kitchen_dataset_transform,
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": ucsd_pick_place_dataset_transform,
    "austin_sailor_dataset_converted_externally_to_rlds": austin_sailor_dataset_transform,
    "austin_sirius_dataset_converted_externally_to_rlds": austin_sirius_dataset_transform,
    "bc_z": bc_z_dataset_transform,
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": tokyo_pr2_opening_fridge_dataset_transform,
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": tokyo_pr2_tabletop_manipulation_dataset_transform,
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": utokyo_xarm_pick_place_dataset_transform,
    "utokyo_xarm_bimanual_converted_externally_to_rlds": utokyo_xarm_bimanual_dataset_transform,
    "robo_net": robo_net_dataset_transform,
    "berkeley_mvp_converted_externally_to_rlds": berkeley_mvp_dataset_transform,
    "berkeley_rpt_converted_externally_to_rlds": berkeley_rpt_dataset_transform,
    "kaist_nonprehensile_converted_externally_to_rlds": kaist_nonprehensible_dataset_transform,
    "stanford_mask_vit_converted_externally_to_rlds": stanford_mask_vit_dataset_transform,
    "tokyo_u_lsmo_converted_externally_to_rlds": tokyo_lsmo_dataset_transform,
    "dlr_sara_pour_converted_externally_to_rlds": dlr_sara_pour_dataset_transform,
    "dlr_sara_grid_clamp_converted_externally_to_rlds": dlr_sara_grid_clamp_dataset_transform,
    "dlr_edan_shared_control_converted_externally_to_rlds": dlr_edan_shared_control_dataset_transform,
    "asu_table_top_converted_externally_to_rlds": asu_table_top_dataset_transform,
    "stanford_robocook_converted_externally_to_rlds": robocook_dataset_transform,
    "imperialcollege_sawyer_wrist_cam": imperial_wristcam_dataset_transform,
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": iamlab_pick_insert_dataset_transform,
    "uiuc_d3field": uiuc_d3field_dataset_transform,
    "utaustin_mutex": utaustin_mutex_dataset_transform,
    "berkeley_fanuc_manipulation": berkeley_fanuc_dataset_transform,
    "cmu_playing_with_food": cmu_playing_with_food_dataset_transform,
    "cmu_play_fusion": playfusion_dataset_transform,
    "cmu_stretch": cmu_stretch_dataset_transform,
    "berkeley_gnm_recon": gnm_dataset_transform,
    "berkeley_gnm_cory_hall": gnm_dataset_transform,
    "berkeley_gnm_sac_son": gnm_dataset_transform,
    "droid": droid_baseact_transform,
    "fmb_dataset": fmb_dataset_transform,
    "dobbe": dobbe_dataset_transform,
    "roboset": roboset_dataset_transform,
    "rh20t": rh20t_dataset_transform,
    "tdroid_carrot_in_bowl": tdroid_dataset_transform,
    "tdroid_pour_corn_in_pot": tdroid_dataset_transform,
    "tdroid_flip_pot_upright": tdroid_dataset_transform,
    "tdroid_move_object_onto_plate": tdroid_dataset_transform,
    "tdroid_knock_object_over": tdroid_dataset_transform,
    "tdroid_cover_object_with_towel": tdroid_dataset_transform,
    "droid_wipe": droid_finetuning_transform,
    "libero_spatial_no_noops": libero_dataset_transform,
    "libero_object_no_noops": libero_dataset_transform,
    "libero_goal_no_noops": libero_dataset_transform,
    "libero_10_no_noops": libero_dataset_transform,
    "libero_4_task_suites_no_noops": libero_dataset_transform,
    "calvin": calvin_dataset_transform,
    "calvin_abc": calvin_dataset_transform,
    "calvin_abc_rlds": calvin_dataset_transform,
    "aloha1_fold_shorts_20_demos": aloha_dataset_transform,
    "aloha1_fold_shirt_30_demos": aloha_dataset_transform,
    "aloha1_scoop_X_into_bowl_45_demos": aloha_dataset_transform,
    "aloha1_put_X_into_pot_300_demos": aloha_dataset_transform,
}
