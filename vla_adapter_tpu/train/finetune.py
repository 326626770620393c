"""Finetune CLI (reference vla-scripts/finetune.py entry point).

    python -m vla_adapter_tpu.train.finetune \
        --data.mixture libero_spatial_no_noops \
        --data.root_dir /data/rlds \
        --train.batch_size 16 --train.optim.learning_rate 5e-4

or by named recipe (reference --vla.type, prismatic/conf/vla.py):

    python -m vla_adapter_tpu.train.finetune \
        --experiment vla-adapter+libero-spatial --data.root_dir /data/rlds

With ``--data.use_dummy true`` the DummyDataset smoke path runs instead of
RLDS (the reference documents the same swap, finetune.py:937-946).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.core.config import TrainConfig
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    mixture: str = "libero_spatial_no_noops"
    root_dir: str = "datasets/rlds"
    use_dummy: bool = False
    image_aug: bool = True
    shuffle_buffer_size: int = 100_000
    tokenizer_dir: Optional[str] = None  # dir with vocab.json/merges.txt


@dataclasses.dataclass(frozen=True)
class FinetuneCLIConfig:
    train: TrainConfig = TrainConfig()
    data: DataConfig = DataConfig()
    resume: bool = False
    # Named recipe from core/experiments.py (reference --vla.type,
    # prismatic/conf/vla.py:20-319): seeds train+data from the registry
    # entry; explicit --train.* / --data.* flags still override it.
    experiment: Optional[str] = None


def config_from_experiment(vla_id: str) -> FinetuneCLIConfig:
    """Seed a CLI config from a registered experiment recipe."""
    from vla_adapter_tpu.core.experiments import get_experiment

    exp = get_experiment(vla_id)
    return FinetuneCLIConfig(
        train=exp.to_train_config(),
        data=DataConfig(mixture=exp.data_mix, image_aug=exp.image_aug,
                        shuffle_buffer_size=exp.shuffle_buffer_size),
        experiment=vla_id,
    )


def build_data_iter(cfg: FinetuneCLIConfig):
    """RLDS mixture -> batch iterator (+ statistics for checkpointing)."""
    from vla_adapter_tpu.data.action_tokenizer import ActionTokenizer
    from vla_adapter_tpu.data.image_processing import image_processor_for
    from vla_adapter_tpu.data.rlds.oxe.materialize import (
        get_oxe_dataset_kwargs_and_weights,
    )
    from vla_adapter_tpu.data.rlds_dataset import RLDSDataset
    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer
    from vla_adapter_tpu.data.transform import VLABatchTransform

    from vla_adapter_tpu.parallel.sharding import (
        per_process_seed,
        process_local_batch_size,
    )

    model_cfg = cfg.train.model
    # One pipeline per HOST with a host-distinct seed and the host-local
    # share of the global batch — the reference's per-rank RLDSDataset
    # contract (finetune.py:952-994); the loop assembles the global batch
    # via shard_batch_from_local.
    seed = per_process_seed(cfg.train.seed)
    tok = load_qwen_tokenizer(cfg.data.tokenizer_dir)
    transform = VLABatchTransform(
        model_cfg,
        tokenize=lambda t: tok(t, add_special_tokens=True).input_ids,
        action_tokenizer=ActionTokenizer(len(tok)),
        image_processor=image_processor_for(model_cfg.vision),
        seed=seed,
    )
    kwargs_list, weights = get_oxe_dataset_kwargs_and_weights(
        cfg.data.root_dir, cfg.data.mixture,
        load_camera_views=("primary", "wrist"),
    )
    accum = (cfg.train.grad_accumulation_steps
             if cfg.train.grad_accumulation_steps > 1 else None)
    ds = RLDSDataset(
        model_cfg, transform, kwargs_list, weights,
        batch_size=process_local_batch_size(cfg.train.batch_size),
        train=True,
        image_aug=cfg.data.image_aug,
        shuffle_buffer_size=cfg.data.shuffle_buffer_size,
        accum_steps=accum, seed=seed,
    )
    return iter(ds), ds.dataset_statistics


def main(argv=None) -> None:
    from vla_adapter_tpu.train.loop import finetune, get_run_id

    cfg = parse_config(FinetuneCLIConfig, argv)
    if cfg.experiment is not None:
        # re-parse on top of the recipe so explicit flags win (the first
        # parse only existed to discover --experiment)
        cfg = parse_config(FinetuneCLIConfig, argv,
                           base=config_from_experiment(cfg.experiment))
        from vla_adapter_tpu.core.experiments import get_experiment

        exp = get_experiment(cfg.experiment)
        if exp.expected_devices:
            import jax

            n = jax.device_count()
            if n != exp.expected_devices:
                # the reference hard-asserts world size (conf/vla.py
                # expected_world_size); TPU slice shapes legitimately
                # differ from the GPU counts the recipes were tuned on,
                # so warn instead of refusing to run
                log.warning(
                    "experiment %s was tuned for %d devices; running on %d",
                    cfg.experiment, exp.expected_devices, n)
    log.info("run id: %s", get_run_id(cfg.train))
    if cfg.data.use_dummy:
        data_iter, stats = None, None
    else:
        data_iter, stats = build_data_iter(cfg)
    finetune(cfg.train, data_iter=data_iter, dataset_statistics=stats,
             resume=cfg.resume)


if __name__ == "__main__":
    main()
