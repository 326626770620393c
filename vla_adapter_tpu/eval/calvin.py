"""CALVIN ABC->D long-horizon evaluation harness.

Protocol parity with reference evaluate_calvin.py / vla_evaluation.py:
1000 five-instruction chains, per-subtask rollouts of up to 80 ensembling
cycles with the "hi3" temporal-ensemble controller, avg-successful-sequence
-length metric, and the CALVIN-specific observation/action conventions:
  * static (200px) + gripper (84px) cams, parity-resized to 224, 0.9
    center-cropped (vla_evaluation.py:248-270)
  * proprio = [robot_obs[:7], robot_obs[-1:]] normalized with the
    'calvin_abc_rlds' stats (vla_evaluation.py:290-296)
  * model gripper output flipped 1-a before the standard
    normalize+binarize+invert pipeline (vla_evaluation.py:311,
    evaluate_calvin.py process_action)
Multi-process sharding splits the 1000 chains across jax processes
(reference shards across accelerate processes, evaluate_calvin.py:877-914).
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from vla_adapter_tpu.eval.openloop import HI3_CYCLE_LEN, TemporalEnsembleController
from vla_adapter_tpu.eval.robot_utils import process_action

log = logging.getLogger(__name__)

NUM_SEQUENCES = 1000
EP_LEN = 80  # ensembling cycles per subtask rollout


@dataclasses.dataclass(frozen=True)
class CalvinEvalConfig:
    num_sequences: int = NUM_SEQUENCES
    ep_len: int = EP_LEN
    unnorm_key: str = "calvin_abc_rlds"
    image_size: int = 224
    # Enriched-language protocol (reference evaluate_calvin.py:134,211-213):
    # swap the standard new_playtable_validation.yaml annotations for the
    # GPT-paraphrased enrich_lang_annotations.json. The 4.50 Pro north-star
    # number (BASELINE.md) is defined under this mode.
    enrich_lang: bool = False
    enrich_lang_path: Optional[str] = None  # default: packaged asset


def load_enriched_annotations(path: Optional[str] = None) -> Dict[str, List[str]]:
    """The enriched CALVIN instruction table (reference ships it as
    vla-scripts/enrich_lang_annotations.json; same 34-task key set as the
    standard annotations, ~48 paraphrases per task). The selection rule is
    the reference's: instruction = annotations[subtask][0] — only the FIRST
    paraphrase is ever used (evaluate_calvin.py:346,398)."""
    import json

    if path is None:
        path = str(Path(__file__).parent / "assets" /
                   "enrich_lang_annotations.json")
    with open(path) as f:
        table = json.load(f)
    assert all(isinstance(v, list) and v for v in table.values()), (
        "malformed enriched-annotation table")
    return table


def count_success(results: Sequence[int]) -> List[float]:
    """Chain success rates at depth 1..5 (reference count_success)."""
    results = np.asarray(list(results))
    return [float((results >= i).mean()) for i in range(1, 6)]


def avg_seq_len(results: Sequence[int]) -> float:
    return float(np.mean(list(results)))


class CalvinPolicy:
    """Adapts infer.Predictor to CALVIN observations (the reference's
    DualSystemCalvinEvaluation.step, vla_evaluation.py:240-315)."""

    def __init__(self, predictor, cfg: CalvinEvalConfig):
        self.predictor = predictor
        self.cfg = cfg

    def __call__(self, obs, instruction: str) -> np.ndarray:
        static = obs["rgb_obs"]["rgb_static"]
        gripper = obs["rgb_obs"]["rgb_gripper"]
        proprio = np.concatenate(
            [obs["robot_obs"][:7], obs["robot_obs"][-1:]]
        )
        chunk = self.predictor.predict_action(
            [static, gripper], instruction, proprio=proprio,
            unnorm_key=self.cfg.unnorm_key,
        )
        chunk = np.array(chunk)
        chunk[:, -1] = 1.0 - chunk[:, -1]  # CALVIN gripper flip
        return chunk


def rollout_subtask(
    env, policy: Callable, task_oracle, subtask: str, instruction: str,
    cfg: CalvinEvalConfig,
) -> bool:
    """One subtask with hi3 temporal ensembling + per-step success check."""
    obs = env.get_obs()
    start_info = env.get_info()
    controller = TemporalEnsembleController(lambda o: policy(o, instruction))
    for _ in range(cfg.ep_len * HI3_CYCLE_LEN):
        action = controller.step(obs)
        action = process_action(action)
        obs, _, _, info = env.step(action.tolist())
        if task_oracle.get_task_info_for_set(start_info, info, {subtask}):
            return True
    return False


def evaluate_policy(policy: Callable, env, task_oracle, val_annotations,
                    eval_sequences, cfg: CalvinEvalConfig) -> List[int]:
    """Run chains; returns per-chain depth reached (0..5)."""
    results = []
    for seq_i, (initial_state, sequence) in enumerate(eval_sequences):
        env.reset(robot_obs=initial_state["robot_obs"],
                  scene_obs=initial_state["scene_obs"])
        depth = 0
        for subtask in sequence:
            instruction = val_annotations[subtask][0]
            if rollout_subtask(env, policy, task_oracle, subtask, instruction,
                               cfg):
                depth += 1
            else:
                break
        results.append(depth)
        log.info("chain %d: depth %d | running avg len %.3f",
                 seq_i, depth, avg_seq_len(results))
    return results


def eval_calvin(predictor, calvin_env_and_assets, cfg: CalvinEvalConfig
                ) -> Dict[str, float]:
    """Full CALVIN eval. `calvin_env_and_assets` = (env, task_oracle,
    val_annotations, eval_sequences) built by the host-side CALVIN stack
    (calvin_agent; heavy sim deps stay out of this package)."""
    import jax

    env, task_oracle, val_annotations, eval_sequences = calvin_env_and_assets
    if cfg.enrich_lang:
        # reference evaluate_calvin.py:211-215: enrichment REPLACES the
        # standard annotation table wholesale
        val_annotations = load_enriched_annotations(cfg.enrich_lang_path)
    # shard chains across processes (reference: accelerate split)
    pid, n = jax.process_index(), jax.process_count()
    shard = list(eval_sequences)[pid::n]
    policy = CalvinPolicy(predictor, cfg)
    results = evaluate_policy(policy, env, task_oracle, val_annotations,
                              shard, cfg)
    if n > 1:
        # gather every process's chain depths so each reports the GLOBAL
        # 1000-chain metric (reference gather_for_metrics,
        # evaluate_calvin.py:877-914). Shards may be ragged by one: pad
        # with -1 and drop pads after the allgather.
        import numpy as np
        from jax.experimental import multihost_utils

        width = (len(eval_sequences) + n - 1) // n
        padded = np.full((width,), -1, np.int32)
        padded[: len(results)] = results
        gathered = np.asarray(
            multihost_utils.process_allgather(padded)).reshape(-1)
        results = [int(d) for d in gathered if d >= 0]
    sr = count_success(results)
    return {
        "avg_seq_len": avg_seq_len(results),
        **{f"chain_sr_{i+1}": s for i, s in enumerate(sr)},
        "num_chains": len(results),
    }
