"""Bit-parity gate against the reference implementation.

SURVEY.md section 7.2 step 3: load a released checkpoint, run one forward on
a canned observation, and compare the (chunk, action_dim) action against a
recorded reference output. This tool makes that gate turnkey:

  # record (run once wherever the torch reference can execute):
  python -m vla_adapter_tpu.eval.parity_check --mode record \
      --ckpt_dir <dir> --obs <obs.pkl> --out golden_action.json

  # check (here, on TPU):
  python -m vla_adapter_tpu.eval.parity_check --mode check \
      --ckpt_dir <dir> --obs <obs.pkl> --golden golden_action.json

The observation file is either the reference's canned pickle
(experiments/robot/libero/sample_libero_spatial_observation.pkl — a dict
with full_image / wrist_image / state) or any .npz with the same keys.
"""

from __future__ import annotations

import dataclasses
import json
import pickle
from pathlib import Path
from typing import Dict

import numpy as np

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class ParityConfig:
    mode: str = "check"  # check | record
    ckpt_dir: str = ""
    obs: str = ""
    golden: str = "golden_action.json"
    out: str = "golden_action.json"
    instruction: str = ""
    unnorm_key: str = ""
    atol: float = 1e-2   # bf16 forward; tighten for fp32 runs


def load_observation(path: str) -> Dict[str, np.ndarray]:
    p = Path(path)
    if p.suffix == ".pkl":
        with p.open("rb") as f:
            obs = pickle.load(f)
    else:
        obs = dict(np.load(p, allow_pickle=True))
    return obs


def run_forward(cfg: ParityConfig) -> np.ndarray:
    from vla_adapter_tpu.weights.load import load_vla

    predictor = load_vla(cfg.ckpt_dir)
    obs = load_observation(cfg.obs)
    images = [np.asarray(obs["full_image"], np.uint8)]
    if "wrist_image" in obs:
        images.append(np.asarray(obs["wrist_image"], np.uint8))
    instruction = cfg.instruction or str(
        obs.get("instruction", "do the task")
    )
    return predictor.predict_action(
        images, instruction,
        proprio=obs.get("state"),
        unnorm_key=cfg.unnorm_key or None,
    )


def main(argv=None) -> None:
    cfg = parse_config(ParityConfig, argv)
    assert cfg.ckpt_dir and cfg.obs
    action = run_forward(cfg)
    if cfg.mode == "record":
        Path(cfg.out).write_text(json.dumps({
            "action": action.tolist(),
            "instruction": cfg.instruction,
            "unnorm_key": cfg.unnorm_key,
        }, indent=2))
        log.info("recorded golden action to %s", cfg.out)
        return
    golden = np.asarray(json.loads(Path(cfg.golden).read_text())["action"])
    diff = np.abs(action - golden)
    ok = bool((diff <= cfg.atol).all())
    print(json.dumps({
        "parity": "PASS" if ok else "FAIL",
        "max_abs_diff": float(diff.max()),
        "atol": cfg.atol,
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
