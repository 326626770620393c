"""LoRA merge CLI (reference vla-scripts/merge_lora_weights_and_save.py).

Loads a training checkpoint (train/checkpoints.py layout), folds the LoRA
adapters into the base weights, and writes a deployment param tree.

    python -m vla_adapter_tpu.weights.merge \
        --ckpt_dir runs/<run>/latest --out_dir runs/<run>/merged \
        --lora_scale 2.0
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class MergeConfig:
    ckpt_dir: str = ""
    out_dir: str = ""
    lora_scale: float = 2.0


def merge_checkpoint(ckpt_dir, out_dir, lora_scale: float) -> Path:
    import orbax.checkpoint as ocp

    from vla_adapter_tpu.models.lora import merge_lora
    from vla_adapter_tpu.train.checkpoints import save_params
    from vla_adapter_tpu.train.partition import merge_trees

    ck = ocp.PyTreeCheckpointer()
    trainable = ck.restore(Path(ckpt_dir) / "trainable")
    frozen = {}
    if (Path(ckpt_dir) / "frozen").exists():
        frozen = ck.restore(Path(ckpt_dir) / "frozen")
    params = merge_trees(trainable, frozen) if frozen else trainable
    merged = merge_lora(params, scale=lora_scale)
    out = save_params(out_dir, merged)
    stats = Path(ckpt_dir) / "dataset_statistics.json"
    if stats.exists():
        (out / "dataset_statistics.json").write_text(stats.read_text())
    return out


def main(argv=None) -> None:
    cfg = parse_config(MergeConfig, argv)
    assert cfg.ckpt_dir and cfg.out_dir, "--ckpt_dir and --out_dir required"
    out = merge_checkpoint(cfg.ckpt_dir, cfg.out_dir, cfg.lora_scale)
    log.info("merged params written to %s", out)


if __name__ == "__main__":
    main()
