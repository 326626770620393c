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
    # W8A8 matmul backend: "auto" (default; batch-keyed dispatch — the
    # whole-MLP fused Pallas kernel at batch <= W8A8_FUSED_MAX_BATCH where
    # it measures fastest, XLA above; see models/layers.resolve_w8a8_impl
    # and BENCH_r03/r04), "xla", or "fused" (force one backend). Both
    # backends of "auto" share the same device weight buffers — the fused
    # layout's qstack collection is a re-grouping of references, not a
    # copy.
    w8a8_impl: str = "auto"
    # Ship uint8 pixels and normalize on-device: halves host->device bytes
    # per request (the (B, n_img, H, W, 6) tensor travels as 1 byte/chan
    # instead of 2+), with bit-identical fp32 normalization math. Off only
    # for debugging the host twin.
    device_normalize: bool = True

    def __post_init__(self):
        import dataclasses as _dc

        if self.int8 or self.act_int8:
            from vla_adapter_tpu.models.quantize import quantize_params_jax

            # device-side quantize: no host round-trip of the weight tree
            self.params = jax.jit(quantize_params_jax)(self.params)
            self.rt = _dc.replace(self.rt, weights_int8=True,
                                  act_int8=self.act_int8,
                                  w8a8_impl=self.w8a8_impl)
        elif self.w8a8_impl not in ("xla", "auto") and not self.rt.act_int8:
            # a concrete non-XLA backend only exists on the act-int8 path;
            # without it the flag would silently do nothing.
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
        if self.w8a8_impl == "auto" and not self.act_int8:
            # nothing to dispatch between on the float/weight-only paths —
            # "auto" degenerates to the single XLA backend
            self.w8a8_impl = "xla"
            self.rt = _dc.replace(self.rt, w8a8_impl="xla")
        self.image_processor = image_processor_for(self.cfg.vision)
        self.transform = VLABatchTransform(
            self.cfg, self.tokenize, action_tokenizer=None,  # not needed here
            image_processor=self.image_processor,
        )
        mean, std = self.image_processor.norm_constants()
        self._pix_mean, self._pix_std = jnp.asarray(mean), jnp.asarray(std)
        self._pixel_pool = None
        # Weights go to the device ONCE; every backend's variables tree is
        # a re-grouping of references to these buffers (split_qstack moves
        # leaves between dicts without copying), so "auto"'s two compiled
        # backends cost two executables but no extra weight HBM — except
        # lane-padded qstack storage (non-tile-aligned int8 MLP stacks get
        # fresh padded buffers; ~270 MB at flagship geometry for the two
        # so400m 4304-dim stacks).
        params_device = jax.device_put(self.params)
        if self.w8a8_impl == "auto":
            impls = ("fused", "xla")
        else:
            impls = (self.w8a8_impl,)
        self._backends = {i: self._make_backend(i, params_device)
                          for i in impls}
        # Legacy single-backend attributes point at the batch-1 choice —
        # the latency-critical robot-control case.
        self.model, self._params_device, self._fwd = self._backend_for_batch(1)

    def _make_backend(self, impl: str, params_device):
        """Build (model, device variables, jitted forward) for one concrete
        w8a8 backend, sharing `params_device`'s buffers."""
        import dataclasses as _dc

        rt = _dc.replace(self.rt, w8a8_impl=impl)
        model = VLAModel(self.cfg, rt)
        variables = {"params": params_device}
        if rt.act_int8 and rt.stacked_serving:
            # The scanned stacks expect their int8 MLP kernels in the
            # broadcast "qstack" collection (full (L, in, out) stacks,
            # never scan-sliced — models/layers.py). Discover which kernels
            # those are from the model's own variable structure (shape-only
            # trace) and split the quantized tree accordingly.
            from vla_adapter_tpu.models.quantize import split_qstack

            cfg, v = self.cfg, self.cfg.vision
            shapes = jax.eval_shape(
                lambda k: model.init(
                    k,
                    input_ids=jnp.zeros((1, cfg.max_text_tokens), jnp.int32),
                    prompt_len=jnp.full((1,), 8, jnp.int32),
                    text_valid=jnp.ones((1, cfg.max_text_tokens), jnp.int32),
                    pixel_values=jnp.zeros(
                        (1, v.num_images, v.primary.image_size,
                         v.primary.image_size, v.channels_per_image),
                        rt.dtype),
                    proprio=jnp.zeros(
                        (1, cfg.constants.proprio_dim), jnp.float32)
                    if cfg.use_proprio else None,
                ),
                jax.random.key(0),
            )
            if "qstack" in shapes:
                params, qstack = split_qstack(params_device,
                                              shapes["qstack"])
                variables = {"params": params, "qstack": qstack}
            # else: act_int8_min_dim gated every kernel off the stacked
            # path — the plain params tree is the whole model.

        def forward(variables, ids, prompt_len, valid, pixels, proprio):
            return self._forward(model, variables, ids, prompt_len, valid,
                                 pixels, proprio)

        return model, variables, jax.jit(forward)

    def _backend_for_batch(self, batch: int):
        """Pick the (model, variables, fwd) backend for a batch size —
        the w8a8 'auto' dispatch (models/layers.resolve_w8a8_impl)."""
        from vla_adapter_tpu.models.layers import resolve_w8a8_impl

        if len(self._backends) == 1:
            return next(iter(self._backends.values()))
        return self._backends[resolve_w8a8_impl("auto", batch)]

    def enable_preprocess_pool(self, workers: int = 4) -> None:
        """Route the per-request image pipeline through a process pool —
        for servers: N concurrent requests preprocess on N cores instead of
        timeslicing one GIL (serve/server.py wires this via
        ActionServer(preprocess_workers=N))."""
        from vla_adapter_tpu.data.image_processing import PixelPool

        self._pixel_pool = PixelPool(workers)

    def _forward(self, model, variables, ids, prompt_len, valid, pixels,
                 proprio):
        if pixels.dtype == jnp.uint8:
            # device-side twin of ImageProcessor's normalization: fp32
            # (x/255 - mean)/std, then the runtime cast — bit-identical to
            # the host path, at half the transfer bytes.
            pixels = (pixels.astype(jnp.float32) / 255.0 - self._pix_mean)
            pixels = (pixels / self._pix_std).astype(self.rt.dtype)
        return model.apply(
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
        _, variables, fwd = self._backend_for_batch(len(rows))
        actions = fwd(
            variables,
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
