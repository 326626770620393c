"""Open-X Embodiment dataset registry.

Per-dataset config: camera-view key mapping, proprio keys, state/action
encodings (reference rlds/oxe/configs.py:54-723 — 75 datasets). This
registry ships the robot-platform-relevant subset (everything the
VLA-Adapter recipes actually train on: the 4 LIBERO no-noops suites +
combined, CALVIN ABC / full, Bridge, RT-1/fractal, ALOHA fine-tuning
entries) plus representative OXE-magic-soup members; widening to the full
75 is mechanical (same schema, one dict per dataset).
"""

from __future__ import annotations

from enum import IntEnum


class StateEncoding(IntEnum):
    NONE = -1
    POS_EULER = 1       # EEF XYZ (3) + RPY (3) + <PAD> + gripper open/close
    POS_QUAT = 2        # EEF XYZ (3) + quaternion (4) + gripper
    JOINT = 3           # joint angles (7, <PAD> if fewer) + gripper
    JOINT_BIMANUAL = 4  # 2 x [joint angles (6) + gripper]


class ActionEncoding(IntEnum):
    EEF_POS = 1             # delta XYZ (3) + RPY (3) + gripper
    JOINT_POS = 2           # joint deltas (7) + gripper
    JOINT_POS_BIMANUAL = 3  # 2 x [joint deltas (6) + gripper]
    EEF_R6 = 4              # delta XYZ (3) + R6 (6) + gripper


def _libero_cfg():
    return {
        "image_obs_keys": {"primary": "image", "secondary": None,
                           "wrist": "wrist_image"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["EEF_state", "gripper_state"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    }


def _calvin_cfg():
    return {
        "image_obs_keys": {"primary": "rgb_static", "secondary": None,
                           "wrist": "rgb_gripper"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["EEF_state", "gripper_state"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    }


OXE_DATASET_CONFIGS = {
    # --- LIBERO (regenerated, no-noops) ---
    "libero_spatial_no_noops": _libero_cfg(),
    "libero_object_no_noops": _libero_cfg(),
    "libero_goal_no_noops": _libero_cfg(),
    "libero_10_no_noops": _libero_cfg(),
    "libero_4_task_suites_no_noops": _libero_cfg(),
    # --- CALVIN ---
    "calvin_abc": _calvin_cfg(),
    "calvin": _calvin_cfg(),
    # --- Bridge ---
    "bridge_orig": {
        "image_obs_keys": {"primary": "image_0", "secondary": "image_1",
                           "wrist": None},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["EEF_state", None, "gripper_state"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    # --- RT-1 ---
    "fractal20220817_data": {
        "image_obs_keys": {"primary": "image", "secondary": None, "wrist": None},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["base_pose_tool_reached", "gripper_closed"],
        "state_encoding": StateEncoding.POS_QUAT,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    # --- representative OXE magic-soup members ---
    "kuka": {
        "image_obs_keys": {"primary": "image", "secondary": None, "wrist": None},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": [None],
        "state_encoding": StateEncoding.NONE,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "taco_play": {
        "image_obs_keys": {"primary": "rgb_static", "secondary": None,
                           "wrist": "rgb_gripper"},
        "depth_obs_keys": {"primary": "depth_static", "secondary": None,
                           "wrist": "depth_gripper"},
        "state_obs_keys": ["state_eef", None, "state_gripper"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "jaco_play": {
        "image_obs_keys": {"primary": "image", "secondary": None,
                           "wrist": "image_wrist"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["state_eef", None, "state_gripper"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "berkeley_autolab_ur5": {
        "image_obs_keys": {"primary": "image", "secondary": None,
                           "wrist": "hand_image"},
        "depth_obs_keys": {"primary": "depth", "secondary": None, "wrist": None},
        "state_obs_keys": ["state"],
        "state_encoding": StateEncoding.POS_QUAT,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "roboturk": {
        "image_obs_keys": {"primary": "front_rgb", "secondary": None,
                           "wrist": None},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": [None],
        "state_encoding": StateEncoding.NONE,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "viola": {
        "image_obs_keys": {"primary": "agentview_rgb", "secondary": None,
                           "wrist": "eye_in_hand_rgb"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["joint_states", "gripper_states"],
        "state_encoding": StateEncoding.JOINT,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "toto": {
        "image_obs_keys": {"primary": "image", "secondary": None, "wrist": None},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["state"],
        "state_encoding": StateEncoding.JOINT,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "stanford_hydra_dataset_converted_externally_to_rlds": {
        "image_obs_keys": {"primary": "image", "secondary": None,
                           "wrist": "wrist_image"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["eef_state", None, "gripper_state"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    "austin_buds_dataset_converted_externally_to_rlds": {
        "image_obs_keys": {"primary": "image", "secondary": None,
                           "wrist": "wrist_image"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["state"],
        "state_encoding": StateEncoding.POS_EULER,
        "action_encoding": ActionEncoding.EEF_POS,
    },
    # --- ALOHA fine-tuning (bimanual) ---
    "aloha1_fold_shorts_20_demos": {
        "image_obs_keys": {"primary": "image", "secondary": None,
                           "left_wrist": "left_wrist_image",
                           "right_wrist": "right_wrist_image"},
        "depth_obs_keys": {"primary": None, "secondary": None, "wrist": None},
        "state_obs_keys": ["state"],
        "state_encoding": StateEncoding.JOINT_BIMANUAL,
        "action_encoding": ActionEncoding.JOINT_POS_BIMANUAL,
    },
}
