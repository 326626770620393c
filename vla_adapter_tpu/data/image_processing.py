"""Host-side image preprocessing.

Two stages, matching the reference's deployment pipeline:

1. :func:`prepare_image` — the eval-time parity ops (reference
   openvla_utils.py:542-648): JPEG encode/decode round-trip + lanczos3
   resize to the training resolution, and optional center-crop at scale 0.9
   via crop-and-resize. Implemented with TF ops on host CPU when TF is
   available (bit-parity with the reference, which uses tf.image), with a
   PIL fallback.

2. :class:`ImageProcessor` — the deconstructed timm eval transform
   (reference processing_prismatic.py:32-172): per-tower resize strategy
   (resize-naive / letterbox / resize-crop), bicubic, per-tower
   normalization with the checkpoint's (bf16-quantized!) means/stds
   (preprocessor_config.json `tvf_normalize_params`), channel-stacked
   output (primary 3ch + fused 3ch).

Output layout is NHWC (TPU-native) — (H, W, 6) per image; models/vla.py
expects (B, num_images, H, W, 6).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import contextlib
import os
import threading

import numpy as np
from PIL import Image

# The exact normalization constants stored in released checkpoints
# (bf16-quantized ImageNet stats for DINOv2; 0.5s for SigLIP).
DINO_MEAN = (0.484375, 0.455078125, 0.40625)
DINO_STD = (0.228515625, 0.2236328125, 0.224609375)
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)


def _tf():
    try:
        import tensorflow as tf

        tf.config.set_visible_devices([], "GPU")
        return tf
    except Exception:  # pragma: no cover
        return None


def prepare_image(
    image: np.ndarray,
    size: int = 224,
    center_crop_scale: Optional[float] = None,
) -> np.ndarray:
    """Eval-time parity preprocessing: uint8 HWC -> uint8 (size, size, 3).

    JPEG round-trip + lanczos3 resize (+ optional center crop at `scale`
    then resize back), exactly as the reference serves observations to the
    model (openvla_utils.py:542-648).
    """
    tf = _tf()
    if tf is not None:
        t = tf.convert_to_tensor(image)
        if tuple(image.shape) != (size, size, 3):
            # the reference skips the JPEG round-trip + resize entirely when
            # the image already has the policy size (openvla_utils.py:722)
            t = tf.io.decode_jpeg(tf.io.encode_jpeg(t))
            t = tf.image.resize(t, (size, size), method="lanczos3",
                                antialias=True)
            t = tf.cast(tf.clip_by_value(tf.round(t), 0, 255), tf.uint8)
        if center_crop_scale is not None:
            # bit-parity with reference center_crop_image
            # (openvla_utils.py:568-648): crop in [0,1] float scale, boxes of
            # relative side sqrt(scale) — `scale` of the AREA — then a
            # saturating uint8 round-trip.
            f = tf.image.convert_image_dtype(t, tf.float32)  # /255
            # box coords in fp32 TF ops, matching the reference bit-for-bit
            r = tf.clip_by_value(
                tf.sqrt(tf.constant(center_crop_scale, tf.float32)), 0, 1
            )
            y0 = (1 - r) / 2
            boxes = tf.stack([y0, y0, y0 + r, y0 + r])[None]
            f = tf.image.crop_and_resize(f[None], boxes, [0], (size, size))[0]
            f = tf.clip_by_value(f, 0.0, 1.0)
            t = tf.image.convert_image_dtype(f, tf.uint8, saturate=True)
        return t.numpy()
    # PIL fallback (no JPEG round-trip; close but not bit-identical)
    if tuple(image.shape) != (size, size, 3):
        image = np.asarray(
            Image.fromarray(image).resize((size, size), Image.LANCZOS)
        )
    arr = image
    if center_crop_scale is not None:
        r = np.sqrt(center_crop_scale)
        h, w = arr.shape[:2]
        ch, cw = int(h * r), int(w * r)
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        img = Image.fromarray(arr[y0 : y0 + ch, x0 : x0 + cw]).resize(
            (size, size), Image.LANCZOS
        )
        arr = np.asarray(img)
    return arr


@dataclass
class TowerSpec:
    size: int = 224
    mean: Tuple[float, float, float] = DINO_MEAN
    std: Tuple[float, float, float] = DINO_STD
    interpolation: int = Image.BICUBIC


@dataclass
class ImageProcessor:
    """timm-eval-transform equivalent: PIL/uint8 -> (H, W, 3*n_towers) f32."""

    towers: Sequence[TowerSpec] = field(
        default_factory=lambda: (
            TowerSpec(mean=DINO_MEAN, std=DINO_STD),
            TowerSpec(mean=SIGLIP_MEAN, std=SIGLIP_STD),
        )
    )
    resize_strategy: str = "resize-naive"  # | letterbox | resize-crop
    letterbox_fill: Tuple[int, int, int] = (127, 127, 127)

    def _geom(self, img: Image.Image, spec: TowerSpec) -> Image.Image:
        s = spec.size
        if self.resize_strategy == "resize-naive":
            if img.size == (s, s):
                # verified value-identity: PIL's scale-1 bicubic/bilinear
                # kernel hits each input pixel exactly, so the resample
                # returns the input bytes — skip the ~10 ms/img filter pass
                # (serving-path hot spot; prepare_image already emits the
                # policy resolution)
                return img
            return img.resize((s, s), spec.interpolation)
        if self.resize_strategy == "letterbox":
            w, h = img.size
            m = max(w, h)
            canvas = Image.new("RGB", (m, m), self.letterbox_fill)
            canvas.paste(img, ((m - w) // 2, (m - h) // 2))
            return canvas.resize((s, s), spec.interpolation)
        if self.resize_strategy == "resize-crop":
            # timm default eval: resize shorter side to s/crop_pct then
            # center crop; the reference keeps timm's default transform,
            # which at crop_pct=1.0 degenerates to resize+crop at s.
            w, h = img.size
            scale = s / min(w, h)
            img = img.resize((round(w * scale), round(h * scale)),
                             spec.interpolation)
            w, h = img.size
            x0, y0 = (w - s) // 2, (h - s) // 2
            return img.crop((x0, y0, x0 + s, y0 + s))
        raise ValueError(f"unknown resize strategy {self.resize_strategy!r}")

    def __call__(self, image) -> np.ndarray:
        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        image = image.convert("RGB")
        chans: List[np.ndarray] = []
        for spec in self.towers:
            arr = np.asarray(self._geom(image, spec), np.float32) / 255.0
            arr = (arr - np.asarray(spec.mean, np.float32)) / np.asarray(
                spec.std, np.float32
            )
            chans.append(arr)
        return np.concatenate(chans, axis=-1)  # (H, W, 3*T)

    def geom_only(self, image) -> np.ndarray:
        """Geometric transform only: uint8 (H, W, 3*T) with normalization
        deferred (see :meth:`norm_constants`). Serving path: shipping uint8
        to the device and normalizing there halves host->device bytes; the
        math ((x/255 - mean)/std in fp32) is identical either side."""
        if isinstance(image, np.ndarray):
            image = Image.fromarray(image)
        image = image.convert("RGB")
        return np.concatenate(
            [np.asarray(self._geom(image, spec), np.uint8)
             for spec in self.towers], axis=-1)

    def norm_constants(self) -> Tuple[np.ndarray, np.ndarray]:
        """Channel-stacked (3*T,) fp32 mean/std matching geom_only output."""
        mean = np.concatenate(
            [np.asarray(s.mean, np.float32) for s in self.towers])
        std = np.concatenate(
            [np.asarray(s.std, np.float32) for s in self.towers])
        return mean, std


def pool_pixels(
    images: Sequence[np.ndarray],
    size: int,
    crop_scale: Optional[float],
    processor: "ImageProcessor",
    geom_only: bool,
) -> np.ndarray:
    """One request's full pixel pipeline, as a top-level function so a
    multiprocessing pool can run it OUTSIDE the serving process's GIL
    (serve/preprocess pool — the image pipeline is the per-request host
    hot spot and Python threads cannot parallelize it). The ImageProcessor
    travels by pickle so the pool path uses the exact same configuration
    (towers, resize strategy, letterbox fill) as the inline path."""
    prepped = [prepare_image(img, size=size, center_crop_scale=crop_scale)
               for img in images]
    f = processor.geom_only if geom_only else processor
    return np.stack([f(p) for p in prepped])


_SPAWN_ENV_LOCK = threading.Lock()


@contextlib.contextmanager
def spawn_without_accelerator():
    """Temporarily strip the env vars that make a fresh interpreter register
    an accelerator backend at startup (sitecustomize hooks keyed on them),
    so 'spawn' children boot in ~1 s instead of 20-60 s and never touch the
    device. The parent process is unaffected — its backend is already
    registered. Serialized under a lock: os.environ is process-global and
    two concurrent spawners must not interleave the pop/restore."""
    keys = ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
    with _SPAWN_ENV_LOCK:
        saved = {k: os.environ.pop(k) for k in keys if k in os.environ}
        try:
            yield
        finally:
            os.environ.update(saved)


def _pool_worker_init(barrier, started) -> None:
    """Eagerly pay the heavy imports at worker spawn, not first request
    (TF alone is tens of seconds on a busy host), then rendezvous so NO
    worker accepts tasks before EVERY worker is warm — without the barrier
    one fast worker drains the warm-up tasks and cold ones meet real
    traffic. A worker respawned by mp.Pool AFTER startup (original died to
    OOM/segfault mid-task) must NOT wait for a rendezvous nobody else will
    join: the parent sets ``started`` once the warm-up probe returns, so a
    respawn skips the barrier immediately (waiting for its 300 s timeout
    would stall every task already dispatched to that worker)."""
    _tf()
    if barrier is not None and not (started is not None and started.is_set()):
        try:
            barrier.wait(timeout=300)
        except threading.BrokenBarrierError:
            pass


class PixelPool:
    """Process pool for :func:`pool_pixels`.

    'spawn' children: clean interpreters with no inherited device handles
    (safe next to a live TPU client); construction BLOCKS until every
    worker finished its TF import (initializer barrier + one probe task),
    so the first real request is fast — create the pool at server startup,
    keep it for the server's lifetime."""

    def __init__(self, workers: int = 4, task_timeout_s: float = 120.0):
        import multiprocessing as mp

        self.task_timeout_s = task_timeout_s
        ctx = mp.get_context("spawn")
        barrier = ctx.Barrier(workers)
        started = ctx.Event()  # set after warm-up: respawns skip the barrier
        with spawn_without_accelerator():
            self._pool = ctx.Pool(
                workers, initializer=_pool_worker_init,
                initargs=(barrier, started))
        # probe: any task can only run once all initializers passed the
        # barrier, so one get() proves the whole pool is warm
        dummy = [np.zeros((8, 8, 3), np.uint8)]
        self._pool.apply_async(
            pool_pixels, (dummy, 8, None, ImageProcessor(
                towers=(TowerSpec(size=8),)), True)
        ).get(timeout=300)
        started.set()

    def run(self, images, size, crop_scale, processor, geom_only) -> np.ndarray:
        # bounded get(): a worker killed mid-task (OOM, segfault) loses its
        # ApplyResult forever; without a timeout the serving request thread
        # would be leaked permanently
        return self._pool.apply_async(
            pool_pixels, (list(images), size, crop_scale, processor, geom_only)
        ).get(timeout=self.task_timeout_s)

    def close(self) -> None:
        self._pool.terminate()
        self._pool.join()


def default_image_processor() -> ImageProcessor:
    return ImageProcessor()


def image_processor_for(vision_cfg) -> ImageProcessor:
    """Build a processor matching a FusedVisionConfig (tower count + size)."""
    towers = [TowerSpec(size=vision_cfg.primary.image_size,
                        mean=DINO_MEAN, std=DINO_STD)]
    if vision_cfg.fused is not None:
        towers.append(TowerSpec(size=vision_cfg.fused.image_size,
                                mean=SIGLIP_MEAN, std=SIGLIP_STD))
    return ImageProcessor(towers=tuple(towers))
