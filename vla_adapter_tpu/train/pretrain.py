"""VLM pretraining (reference scripts/pretrain.py + strategies).

Stage-driven training of PrismaticVLM on chat data with a multimodal CE
objective: 'align' trains the projector only; 'finetune' unfreezes the
LLM; 'full-finetune' trains everything (train/stages.py).

    python -m vla_adapter_tpu.train.pretrain --stage align \
        --data_json llava_align.json --image_root images/ ...
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.core.config import OptimizerConfig, VLAConfig
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vlm import PrismaticVLM
from vla_adapter_tpu.train.partition import merge_trees
from vla_adapter_tpu.train.stages import split_by_stage
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    model: VLAConfig = VLAConfig(use_proprio=False)
    optim: OptimizerConfig = OptimizerConfig(learning_rate=1e-3)
    stage: str = "align"
    batch_size: int = 16
    data_json: str = ""
    image_root: str = ""
    tokenizer_dir: Optional[str] = None
    max_text_tokens: int = 512
    seed: int = 7
    # Pretrained backbone weights to start from (orbax params dir, e.g. a
    # weights.merge output, or an HF-layout checkpoint dir). The align
    # stage is meaningless from random towers — the projector would be
    # aligned to noise (reference scripts/pretrain.py loads pretrained
    # ViT+LLM unconditionally).
    init_from: Optional[str] = None
    out_dir: str = "runs/pretrain"


def make_pretrain_step(model: PrismaticVLM, tx):
    def loss_fn(trainable, frozen, batch):
        params = merge_trees(trainable, frozen)
        out = model.apply(
            {"params": params},
            input_ids=batch["input_ids"],
            text_valid=batch["text_valid"],
            pixel_values=batch.get("pixel_values"),
            labels=batch["labels"],
        )
        return out["loss"]

    def step(trainable, frozen, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, frozen, batch)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss}

    return step


def pretrain(
    cfg: PretrainConfig,
    data_iter: Iterator[Dict[str, np.ndarray]],
    max_steps: int,
    rt: Optional[Runtime] = None,
    init_params: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[str, Any], Dict[str, float]]:
    rt = rt or Runtime(dtype=jnp.bfloat16, param_dtype=jnp.float32)
    model = PrismaticVLM(cfg.model, rt)
    from vla_adapter_tpu.train.optim import make_optimizer

    # same warmup recipe as the finetune loop: warmup_fraction * max_steps
    tx = make_optimizer(cfg.optim)
    batch = jax.tree.map(jnp.asarray, next(data_iter))
    params = model.init(
        jax.random.key(cfg.seed),
        input_ids=batch["input_ids"],
        text_valid=batch["text_valid"],
        pixel_values=batch.get("pixel_values"),
        labels=batch["labels"],
    )["params"]
    if init_params is not None:
        # graft pretrained subtrees over the fresh init by top-level module
        # (vision_backbone / projector / language_model ...): extra source
        # keys (e.g. a VLA checkpoint's action head) are ignored, absent
        # ones stay at their init (the projector in the align stage)
        grafted = [k for k in params if k in init_params]
        params = {k: (init_params[k] if k in init_params else v)
                  for k, v in params.items()}
        log.info("initialized %s from pretrained weights", grafted)
    trainable, frozen = split_by_stage(params, cfg.stage)
    from vla_adapter_tpu.train.optim import mask_updates
    from vla_adapter_tpu.train.stages import stage_update_mask

    tx = mask_updates(tx, stage_update_mask(trainable, cfg.stage))
    log.info(
        "stage %s: %d trainable / %d frozen leaves", cfg.stage,
        len(jax.tree.leaves(trainable)), len(jax.tree.leaves(frozen)),
    )
    opt_state = tx.init(trainable)
    step = jax.jit(make_pretrain_step(model, tx))
    metrics = {}
    for i in range(max_steps):
        trainable, opt_state, metrics = step(trainable, frozen, opt_state, batch)
        if i + 1 < max_steps:
            batch = jax.tree.map(jnp.asarray, next(data_iter))
    return merge_trees(trainable, frozen), {
        k: float(v) for k, v in metrics.items()
    }


def main(argv=None) -> None:
    from vla_adapter_tpu.data.chat import AlignDataset, FinetuneDataset
    from vla_adapter_tpu.data.collator import collate
    from vla_adapter_tpu.data.image_processing import image_processor_for
    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer

    cfg = parse_config(PretrainConfig, argv)
    assert cfg.data_json, "--data_json required"
    tok = load_qwen_tokenizer(cfg.tokenizer_dir)
    ds_cls = AlignDataset if cfg.stage == "align" else FinetuneDataset
    ds = ds_cls(
        cfg.data_json,
        tokenize=lambda t: tok(t, add_special_tokens=True).input_ids,
        image_processor=image_processor_for(cfg.model.vision),
        image_root=cfg.image_root,
        max_text_tokens=cfg.max_text_tokens,
    )

    def batches():
        rng = np.random.default_rng(cfg.seed)
        while True:
            idx = rng.integers(0, len(ds), size=cfg.batch_size)
            yield collate([ds[int(i)] for i in idx])

    init_params = None
    if cfg.init_from:
        from pathlib import Path

        if (Path(cfg.init_from) / "config.json").exists():
            # HF-layout checkpoint dir (weights/export.py or reference) —
            # backbone only: pretraining has no action head
            from vla_adapter_tpu.weights.convert import vla_params_from_hf
            from vla_adapter_tpu.weights.load import (
                load_hf_backbone_state_dict,
            )

            init_params = vla_params_from_hf(
                load_hf_backbone_state_dict(cfg.init_from), cfg.model)
        else:  # orbax params dir (weights.merge / save_params output)
            from vla_adapter_tpu.train.checkpoints import load_params

            init_params = load_params(cfg.init_from)

    params, metrics = pretrain(cfg, batches(), max_steps=cfg.optim.max_steps,
                               init_params=init_params)

    from vla_adapter_tpu.train.checkpoints import save_params

    out = save_params(cfg.out_dir, params)
    log.info("pretrained params saved to %s (final metrics: %s)", out, metrics)


if __name__ == "__main__":
    main()
