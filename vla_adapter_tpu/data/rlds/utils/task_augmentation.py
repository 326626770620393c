"""Task augmentation (reference rlds/utils/task_augmentation.py).

Randomly drops either the goal images or the language instruction per
transition (only when both are present), padding out the dropped key and
its pad mask.
"""

from __future__ import annotations

from typing import Dict

import tensorflow as tf


def _to_padding(tensor: tf.Tensor) -> tf.Tensor:
    if tensor.dtype == tf.string:
        return tf.fill(tf.shape(tensor), "")
    return tf.zeros_like(tensor)


def delete_task_conditioning(traj: Dict, keep_image_prob: float) -> Dict:
    if "language_instruction" not in traj["task"]:
        return traj
    image_keys = {k for k in traj["task"]
                  if k.startswith("image_") or k.startswith("depth_")}
    if not image_keys:
        return traj

    traj_len = tf.shape(traj["action"])[0]
    keep_images = tf.random.uniform([traj_len]) < keep_image_prob
    keep_images |= ~traj["task"]["pad_mask_dict"]["language_instruction"]

    for key in image_keys | {"language_instruction"}:
        keep = keep_images if key in image_keys else ~keep_images
        traj["task"][key] = tf.where(
            keep, traj["task"][key], _to_padding(traj["task"][key])
        )
        traj["task"]["pad_mask_dict"][key] = tf.where(
            keep,
            traj["task"]["pad_mask_dict"][key],
            tf.zeros_like(traj["task"]["pad_mask_dict"][key]),
        )

    if "timestep" in traj["task"]:
        traj["task"]["timestep"] = tf.where(
            keep_images, traj["task"]["timestep"], traj_len - 1
        )
    return traj
