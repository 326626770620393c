"""LIBERO eval CLI (reference experiments/robot/libero/run_libero_eval.py).

    python -m vla_adapter_tpu.eval.libero_eval \
        --ckpt_dir <dir> --eval.task_suite_name libero_object
"""

from __future__ import annotations

import dataclasses
import json

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.eval.libero import LiberoEvalConfig, eval_libero
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class LiberoCLIConfig:
    ckpt_dir: str = ""
    unnorm_key: str = ""  # default: "<task_suite_name>_no_noops"
    eval: LiberoEvalConfig = LiberoEvalConfig()


def main(argv=None) -> None:
    from vla_adapter_tpu.weights.load import load_vla

    cfg = parse_config(LiberoCLIConfig, argv)
    assert cfg.ckpt_dir, "--ckpt_dir is required"
    predictor = load_vla(cfg.ckpt_dir)
    unnorm_key = cfg.unnorm_key or f"{cfg.eval.task_suite_name}_no_noops"

    def policy(obs, task_description):
        return predictor.predict_action(
            [obs["full_image"], obs["wrist_image"]],
            task_description,
            proprio=obs["state"],
            unnorm_key=unnorm_key,
        )

    results = eval_libero(policy, cfg.eval)
    log.info("results: %s", json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
