"""Inference: predict_action.

The latency-critical path (reference call stack SURVEY.md section 3.2):
host-side image parity preprocessing + prompt build, ONE fixed-shape jitted
forward (compiled once — the reference re-pads per prompt and is hard-coded
batch 1; we bucket to cfg.max_text_tokens and support any batch), then
host-side q01/q99 unnormalization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.data.image_processing import image_processor_for, prepare_image
from vla_adapter_tpu.data.normalization import normalize, unnormalize
from vla_adapter_tpu.data.transform import VLABatchTransform
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vla import VLAModel


@dataclass
class Predictor:
    """Stateless-jit action predictor.

    norm_stats: the checkpoint's per-dataset statistics dict
    (dataset_statistics.json / config norm_stats); unnorm_key selects the
    dataset (reference modeling_prismatic.py:977-992).
    """

    cfg: VLAConfig
    params: Dict[str, Any]
    tokenize: Callable[[str], List[int]]
    norm_stats: Dict[str, Dict]
    rt: Runtime = Runtime(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    center_crop: bool = True
    # Weight-only int8 serving (quantizes `params` at construction):
    # ~1.3x lower batch-1 latency on v5e; weight-only per-channel symmetric
    # quantization (validate task success rates before deploying).
    int8: bool = False
    # W8A8 serving (implies int8 weights): activations also quantized
    # per-token and matmuls run on the MXU's 2x-rate int8 path — the
    # batched-throughput lever. Check models/quantize.forward_error_report
    # (act_int8=True) and task success rates before deploying.
    act_int8: bool = False
    # W8A8 matmul backend: "xla", "pallas", "pallas_stacked", or "fused"
    # (ops/pallas_matmul.py / ops/pallas_fused_mlp.py — hand kernels for
    # the small-row batch-1 shapes; "pallas_stacked" keeps the scanned
    # stacks' int8 kernels unsliced in HBM via scalar-prefetch indexing; see
    # models/layers.Runtime.w8a8_impl for the measured dispatch guidance;
    # "fused" adds the whole-MLP kernel that keeps the wide intermediates
    # in VMEM).
    w8a8_impl: str = "xla"
    # Ship uint8 pixels and normalize on-device: halves host->device bytes
    # per request (the (B, n_img, H, W, 6) tensor travels as 1 byte/chan
    # instead of 2+), with bit-identical fp32 normalization math. Off only
    # for debugging the host twin.
    device_normalize: bool = True

    def __post_init__(self):
        if self.int8 or self.act_int8:
            import dataclasses as _dc

            from vla_adapter_tpu.models.quantize import quantize_params

            self.params = quantize_params(jax.device_get(self.params))
            self.rt = _dc.replace(self.rt, weights_int8=True,
                                  act_int8=self.act_int8,
                                  w8a8_impl=self.w8a8_impl)
        elif self.w8a8_impl != "xla" and not self.rt.act_int8:
            # w8a8_impl only selects the matmul backend of the act-int8
            # path; without it the flag would silently do nothing.
            raise ValueError(
                f"w8a8_impl={self.w8a8_impl!r} requires act_int8 serving — "
                "pass act_int8=True (float params) or an rt with "
                "act_int8=True (pre-quantized params)")
        # From here on, gate every quantization decision on the EFFECTIVE
        # runtime, not the constructor flags: callers with pre-quantized
        # params pass int8=act_int8=False and carry the mode in `rt`
        # (serve/loadtest.py does exactly this to skip a ~2 GB device
        # round-trip), and both construction styles must behave identically.
        self.int8 = bool(self.rt.weights_int8)
        self.act_int8 = bool(self.rt.act_int8)
        self.w8a8_impl = self.rt.w8a8_impl
        variables = {"params": self.params}
        self.model = VLAModel(self.cfg, self.rt)
        if self.rt.act_int8 and self.rt.stacked_serving:
            # The scanned stacks expect their int8 kernels in the broadcast
            # "qstack" collection (full (L, in, out) stacks, never scan-
            # sliced — models/layers.py). Discover which kernels those are
            # from the model's own variable structure (shape-only trace)
            # and split the quantized tree accordingly.
            from vla_adapter_tpu.models.quantize import split_qstack

            cfg, v = self.cfg, self.cfg.vision
            shapes = jax.eval_shape(
                lambda k: self.model.init(
                    k,
                    input_ids=jnp.zeros((1, cfg.max_text_tokens), jnp.int32),
                    prompt_len=jnp.full((1,), 8, jnp.int32),
                    text_valid=jnp.ones((1, cfg.max_text_tokens), jnp.int32),
                    pixel_values=jnp.zeros(
                        (1, v.num_images, v.primary.image_size,
                         v.primary.image_size, v.channels_per_image),
                        self.rt.dtype),
                    proprio=jnp.zeros(
                        (1, cfg.constants.proprio_dim), jnp.float32)
                    if cfg.use_proprio else None,
                ),
                jax.random.key(0),
            )
            if "qstack" in shapes:
                params, qstack = split_qstack(self.params, shapes["qstack"])
                variables = {"params": params, "qstack": qstack}
            # else: act_int8_min_dim gated every kernel off the stacked
            # path — the plain params tree is the whole model.
        self.image_processor = image_processor_for(self.cfg.vision)
        self.transform = VLABatchTransform(
            self.cfg, self.tokenize, action_tokenizer=None,  # not needed here
            image_processor=self.image_processor,
        )
        self._fwd = jax.jit(self._forward)
        self._params_device = jax.device_put(variables)
        mean, std = self.image_processor.norm_constants()
        self._pix_mean, self._pix_std = jnp.asarray(mean), jnp.asarray(std)
        self._pixel_pool = None

    def enable_preprocess_pool(self, workers: int = 4) -> None:
        """Route the per-request image pipeline through a process pool —
        for servers: N concurrent requests preprocess on N cores instead of
        timeslicing one GIL (serve/server.py wires this via
        ActionServer(preprocess_workers=N))."""
        from vla_adapter_tpu.data.image_processing import PixelPool

        self._pixel_pool = PixelPool(workers)

    def _forward(self, variables, ids, prompt_len, valid, pixels, proprio):
        if pixels.dtype == jnp.uint8:
            # device-side twin of ImageProcessor's normalization: fp32
            # (x/255 - mean)/std, then the runtime cast — bit-identical to
            # the host path, at half the transfer bytes.
            pixels = (pixels.astype(jnp.float32) / 255.0 - self._pix_mean)
            pixels = (pixels / self._pix_std).astype(self.rt.dtype)
        return self.model.apply(
            variables,
            input_ids=ids,
            prompt_len=prompt_len,
            text_valid=valid,
            pixel_values=pixels,
            proprio=proprio,
        )["actions"]

    def _resolve_unnorm_key(self, unnorm_key: Optional[str]) -> str:
        if unnorm_key is None:
            assert len(self.norm_stats) == 1, (
                f"multiple datasets in norm_stats; pass unnorm_key from "
                f"{sorted(self.norm_stats)}"
            )
            return next(iter(self.norm_stats))
        assert unnorm_key in self.norm_stats, (unnorm_key, sorted(self.norm_stats))
        return unnorm_key

    def predict_action(
        self,
        images: Sequence[np.ndarray],
        instruction: str,
        proprio: Optional[np.ndarray] = None,
        unnorm_key: Optional[str] = None,
    ) -> np.ndarray:
        """images: list of uint8 HWC (third-person first, then wrists).
        Returns unnormalized (num_actions_chunk, action_dim)."""
        return self.predict_action_batch(
            [images], [instruction],
            None if proprio is None else [proprio],
            unnorm_key,
        )[0]

    def preprocess(
        self,
        images: Sequence[np.ndarray],
        instruction: str,
        proprio: Optional[np.ndarray] = None,
        unnorm_key: Optional[str] = None,
    ) -> Dict[str, np.ndarray]:
        """Host-side work for ONE request: prompt ids + image pipeline +
        proprio normalization. Split out so a serving layer can run it on
        request threads in parallel and batch only the device forward
        (serve/batching.py) — preprocessing is the serving hot spot
        (~60-100 ms/request of TF/PIL work vs ~10 ms/row of TPU time)."""
        cfg = self.cfg
        key = self._resolve_unnorm_key(unnorm_key)
        ids, plen, valid = self.transform.inference_ids(instruction)
        crop = 0.9 if self.center_crop else None
        size = cfg.vision.primary.image_size
        if self._pixel_pool is not None:
            # run the image pipeline in a worker process — concurrent
            # requests then truly parallelize instead of GIL-sharing
            pixels = self._pixel_pool.run(
                images, size, crop, self.image_processor,
                self.device_normalize)
        else:
            proc = (self.image_processor.geom_only if self.device_normalize
                    else self.image_processor)
            prepped = [
                prepare_image(img, size=size, center_crop_scale=crop)
                for img in images
            ]
            pixels = np.stack([proc(p) for p in prepped])
        row = {
            "ids": np.asarray(ids, np.int32),
            "plen": np.int32(plen),
            "valid": np.asarray(valid, np.int32),
            "pixels": pixels.astype(
                np.uint8 if self.device_normalize else np.float32,
                copy=False),
        }
        if cfg.use_proprio and proprio is not None:
            row["proprio"] = normalize(
                np.asarray(proprio, np.float32),
                self.norm_stats[key]["proprio"],
                cfg.constants.normalization_type,
            )
        return row

    def predict_action_rows(
        self,
        rows: Sequence[Dict[str, np.ndarray]],
        unnorm_key: Optional[str] = None,
    ) -> np.ndarray:
        """Stack preprocessed rows (see :meth:`preprocess`), run ONE jitted
        forward, unnormalize."""
        consts = self.cfg.constants
        key = self._resolve_unnorm_key(unnorm_key)
        stats = self.norm_stats[key]
        pixels = np.stack([r["pixels"] for r in rows])
        proprio = None
        n_proprio = sum("proprio" in r for r in rows)
        if n_proprio and n_proprio != len(rows):
            # dropping proprio for rows that supplied it would be silently
            # wrong actions; mixed batches are a caller bug
            raise ValueError(
                f"{n_proprio}/{len(rows)} rows carry proprio — a batch must "
                "be all-proprio or none (serve/batching.py groups by this)")
        if n_proprio and self.cfg.use_proprio:
            proprio = np.stack([r["proprio"] for r in rows])
        actions = self._fwd(
            self._params_device,
            jnp.asarray(np.stack([r["ids"] for r in rows])),
            jnp.asarray(np.asarray([r["plen"] for r in rows], np.int32)),
            jnp.asarray(np.stack([r["valid"] for r in rows])),
            jnp.asarray(pixels) if self.device_normalize
            else jnp.asarray(pixels, self.rt.dtype),
            None if proprio is None else jnp.asarray(proprio),
        )
        actions = np.asarray(actions, np.float32)
        # one vectorized unnormalize: the affine bounds broadcast over
        # (B, chunk, dim) — a per-row Python loop would redo the stats
        # asarray conversions B times on the serving hot path
        return unnormalize(actions, stats["action"],
                           consts.normalization_type)

    def predict_action_batch(
        self,
        images_batch: Sequence[Sequence[np.ndarray]],
        instructions: Sequence[str],
        proprio_batch: Optional[Sequence[np.ndarray]] = None,
        unnorm_key: Optional[str] = None,
    ) -> np.ndarray:
        """Batched inference — a throughput lever the reference lacks
        (its predict_action asserts batch size 1)."""
        rows = [
            self.preprocess(
                images_batch[i], instructions[i],
                None if proprio_batch is None else proprio_batch[i],
                unnorm_key,
            )
            for i in range(len(instructions))
        ]
        return self.predict_action_rows(rows, unnorm_key)
