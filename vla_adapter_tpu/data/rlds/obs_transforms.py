"""Frame-level observation transforms (reference rlds/obs_transforms.py +
the dlimp image ops it delegates to, reimplemented on raw tf.image).

* :func:`decode_and_resize` — JPEG/PNG decode + lanczos3 antialiased resize
  back to uint8 (dlimp.transforms.resize_image semantics; this resize is
  the training-side half of the eval parity pipeline in
  data/image_processing.prepare_image).
* :func:`augment` — stateless-seeded augmentations applied per image key
  with per-key seed offsets (so primary/wrist get different crops), padding
  images skipped. Supported ops mirror the reference recipe
  (datasets.py:205-218): random_resized_crop / brightness / contrast /
  saturation / hue, applied in `augment_order`.
"""

from __future__ import annotations

from typing import Dict, Tuple, Union

import tensorflow as tf


def resize_image(image: tf.Tensor, size: Tuple[int, int]) -> tf.Tensor:
    """uint8 -> lanczos3(antialias) -> round/clip -> uint8."""
    resized = tf.image.resize(tf.cast(image, tf.float32), size,
                              method="lanczos3", antialias=True)
    return tf.cast(tf.clip_by_value(tf.round(resized), 0, 255), tf.uint8)


def decode_and_resize(
    obs: Dict,
    resize_size: Union[Tuple[int, int], Dict[str, Tuple[int, int]]],
) -> Dict:
    image_names = {k[len("image_"):] for k in obs if k.startswith("image_")}
    if isinstance(resize_size, tuple):
        resize_size = {n: resize_size for n in image_names}
    for name in image_names:
        image = obs[f"image_{name}"]
        if image.dtype == tf.string:
            image = tf.cond(
                tf.strings.length(image) == 0,
                lambda: tf.zeros((*resize_size.get(name, (1, 1)), 3), tf.uint8),
                lambda: tf.io.decode_image(image, expand_animations=False,
                                           dtype=tf.uint8),
            )
        if name in resize_size:
            image = resize_image(image, resize_size[name])
        obs[f"image_{name}"] = image
    return obs


def _augment_one(image: tf.Tensor, seed: tf.Tensor, **kwargs) -> tf.Tensor:
    """Apply the ops named in kwargs['augment_order'] with stateless seeds."""
    image = tf.cast(image, tf.float32) / 255.0
    shape = tf.shape(image)
    for i, op in enumerate(kwargs["augment_order"]):
        # stride the op index: per-image offsets are +1/+2 (augment() below)
        # and a bare +i would collide across (image, op) pairs with equal
        # sums (wrist crop == primary brightness seed, correlating draws
        # across cameras for the whole run)
        op_seed = tf.cast(seed, tf.int32) + 1000 * (i + 1)
        if op == "random_resized_crop":
            cfg = kwargs["random_resized_crop"]
            scale = tf.random.stateless_uniform(
                [], seed=op_seed, minval=cfg["scale"][0], maxval=cfg["scale"][1]
                if cfg["scale"][1] > cfg["scale"][0] else cfg["scale"][0] + 1e-9
            )
            ratio = tf.random.stateless_uniform(
                [], seed=op_seed + 100, minval=cfg["ratio"][0],
                maxval=cfg["ratio"][1]
                if cfg["ratio"][1] > cfg["ratio"][0] else cfg["ratio"][0] + 1e-9
            )
            h = tf.cast(shape[0], tf.float32)
            w = tf.cast(shape[1], tf.float32)
            ch = tf.minimum(tf.round(h * tf.sqrt(scale / ratio)), h)
            cw = tf.minimum(tf.round(w * tf.sqrt(scale * ratio)), w)
            y = tf.random.stateless_uniform(
                [], seed=op_seed + 200, minval=0.0,
                maxval=tf.maximum(h - ch, 1e-9))
            x = tf.random.stateless_uniform(
                [], seed=op_seed + 300, minval=0.0,
                maxval=tf.maximum(w - cw, 1e-9))
            crop = tf.image.crop_to_bounding_box(
                image, tf.cast(y, tf.int32), tf.cast(x, tf.int32),
                tf.cast(ch, tf.int32), tf.cast(cw, tf.int32))
            image = tf.image.resize(crop, (shape[0], shape[1]),
                                    method="lanczos3", antialias=True)
        elif op == "random_brightness":
            image = tf.image.stateless_random_brightness(
                image, kwargs["random_brightness"][0], op_seed)
        elif op == "random_contrast":
            lo, hi = kwargs["random_contrast"]
            image = tf.image.stateless_random_contrast(image, lo, hi, op_seed)
        elif op == "random_saturation":
            lo, hi = kwargs["random_saturation"]
            image = tf.image.stateless_random_saturation(image, lo, hi, op_seed)
        elif op == "random_hue":
            image = tf.image.stateless_random_hue(
                image, kwargs["random_hue"][0], op_seed)
        else:
            raise ValueError(f"unknown augmentation {op!r}")
    image = tf.clip_by_value(image, 0.0, 1.0)
    return tf.cast(tf.round(image * 255.0), tf.uint8)


def augment(obs: Dict, seed: tf.Tensor, augment_kwargs: Dict) -> Dict:
    image_names = sorted(
        k[len("image_"):] for k in obs if k.startswith("image_")
    )
    if "augment_order" in augment_kwargs:
        augment_kwargs = {n: augment_kwargs for n in image_names}
    for i, name in enumerate(image_names):
        if name not in augment_kwargs:
            continue
        kw = augment_kwargs[name]
        pad_ok = obs.get("pad_mask_dict", {}).get(f"image_{name}", tf.constant(True))
        obs[f"image_{name}"] = tf.cond(
            pad_ok,
            lambda: _augment_one(obs[f"image_{name}"], seed + i, **kw),
            lambda: obs[f"image_{name}"],
        )
    return obs
