"""CALVIN eval CLI (reference vla-scripts/evaluate_calvin.py).

Requires the host-side CALVIN stack (calvin_agent/calvin_env + hydra);
everything heavy is imported lazily inside main.

    python -m vla_adapter_tpu.eval.calvin_eval \
        --ckpt_dir <dir> --dataset_path <calvin_debug_dataset>
"""

from __future__ import annotations

import dataclasses
import json

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.eval.calvin import CalvinEvalConfig, eval_calvin
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class CalvinCLIConfig:
    ckpt_dir: str = ""
    dataset_path: str = ""
    eval: CalvinEvalConfig = CalvinEvalConfig()
    seed: int = 7


def build_calvin_assets(dataset_path: str, num_sequences: int):
    """Build (env, task_oracle, val_annotations, eval_sequences) from the
    CALVIN validation assets (reference evaluate_calvin.py:820-915)."""
    from calvin_agent.evaluation.multistep_sequences import get_sequences
    from calvin_agent.evaluation.utils import get_env_state_for_initial_condition
    import hydra
    from omegaconf import OmegaConf

    conf_dir = hydra.utils.to_absolute_path("calvin_models/conf")
    task_cfg = OmegaConf.load(
        f"{conf_dir}/callbacks/rollout/tasks/new_playtable_tasks.yaml"
    )
    task_oracle = hydra.utils.instantiate(task_cfg)
    val_annotations = OmegaConf.load(
        f"{conf_dir}/annotations/new_playtable_validation.yaml"
    )

    from vla_adapter_tpu.eval.calvin_env_wrapper import make_calvin_env

    env = make_calvin_env(dataset_path)
    raw_sequences = get_sequences(num_sequences)

    def to_state(initial):
        if not isinstance(initial, dict):
            return initial  # already a {'robot_obs','scene_obs'} state
        # reference evaluate_calvin.py:251: BOTH tuple elements matter —
        # robot_obs AND scene_obs (object/drawer/light state); dropping
        # scene_obs cannot reproduce the evaluation initial conditions
        robot_obs, scene_obs = get_env_state_for_initial_condition(initial)
        return {"robot_obs": robot_obs, "scene_obs": scene_obs}

    eval_sequences = [(to_state(initial), seq)
                      for initial, seq in raw_sequences]
    return env, task_oracle, val_annotations, eval_sequences


def main(argv=None) -> None:
    from vla_adapter_tpu.eval.robot_utils import set_seed_everywhere
    from vla_adapter_tpu.weights.load import load_vla

    cfg = parse_config(CalvinCLIConfig, argv)
    assert cfg.ckpt_dir and cfg.dataset_path
    set_seed_everywhere(cfg.seed)
    predictor = load_vla(cfg.ckpt_dir)
    assets = build_calvin_assets(cfg.dataset_path, cfg.eval.num_sequences)
    results = eval_calvin(predictor, assets, cfg.eval)
    log.info("CALVIN results: %s", json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
