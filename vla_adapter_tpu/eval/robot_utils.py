"""Robot-side utilities shared by the eval harnesses.

Behavior-parity with reference experiments/robot/robot_utils.py and
libero_utils.py (gripper conventions, quaternion conversion, policy-input
resize), numpy-native.
"""

from __future__ import annotations

import math
import os
import random

import numpy as np

from vla_adapter_tpu.data.image_processing import prepare_image


def set_seed_everywhere(seed: int) -> None:
    """Seed numpy/python (+torch when present) — reference robot_utils.py:38-51."""
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def normalize_gripper_action(action: np.ndarray, binarize: bool = True) -> np.ndarray:
    """[0,1] gripper (last dim) -> [-1,1], optionally binarized by sign
    (reference robot_utils.py:152-180)."""
    out = np.array(action, np.float64)
    out[..., -1] = 2.0 * (out[..., -1] - 0.0) / (1.0 - 0.0) - 1.0
    if binarize:
        out[..., -1] = np.sign(out[..., -1])
    return out


def invert_gripper_action(action: np.ndarray) -> np.ndarray:
    """RLDS convention (0=close, 1=open) <-> env (-1=open, +1=close):
    flip the gripper sign (reference robot_utils.py:183-201)."""
    out = np.array(action, np.float64)
    out[..., -1] *= -1.0
    return out


def process_action(action: np.ndarray) -> np.ndarray:
    """The exact pre-env action pipeline (reference run_libero_eval.py:269-280):
    normalize + binarize gripper, then invert for the env convention."""
    return invert_gripper_action(normalize_gripper_action(action, binarize=True))


def quat2axisangle(quat: np.ndarray) -> np.ndarray:
    """(x, y, z, w) quaternion -> axis-angle (reference libero_utils.py:64-90,
    itself from robosuite)."""
    quat = np.array(quat, np.float64)
    quat[3] = np.clip(quat[3], -1.0, 1.0)
    den = np.sqrt(1.0 - quat[3] * quat[3])
    if math.isclose(den, 0.0):
        return np.zeros(3)
    return (quat[:3] * 2.0 * math.acos(quat[3])) / den


def resize_image_for_policy(img: np.ndarray, size: int) -> np.ndarray:
    """JPEG round-trip + lanczos3 resize (the training-parity path —
    reference openvla_utils.py:542-565)."""
    return prepare_image(img, size=size, center_crop_scale=None)


def rotate_180(img: np.ndarray) -> np.ndarray:
    """LIBERO cameras are mounted upside-down relative to the training data
    (reference libero_utils.py:33-45)."""
    return img[::-1, ::-1]
