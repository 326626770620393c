"""Checkpoint smoke verifier (reference vla-scripts/extern/verify_openvla.py
and scripts/extern/verify_prismatic.py).

Loads a checkpoint, runs predict_action on a fixed (or random) observation,
prints the action chunk and timing — the quick "did the export work" check.

    python -m vla_adapter_tpu.eval.verify_smoke --ckpt_dir <dir> \
        --instruction "pick up the remote"
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class VerifyConfig:
    ckpt_dir: str = ""
    instruction: str = "pick up the object"
    unnorm_key: str = ""
    iters: int = 5
    seed: int = 0


def main(argv=None) -> None:
    from vla_adapter_tpu.weights.load import load_vla

    cfg = parse_config(VerifyConfig, argv)
    assert cfg.ckpt_dir, "--ckpt_dir is required"
    predictor = load_vla(cfg.ckpt_dir)
    rng = np.random.default_rng(cfg.seed)
    size = predictor.cfg.vision.primary.image_size
    images = [
        rng.integers(0, 255, size=(256, 256, 3), dtype=np.uint8)
        for _ in range(predictor.cfg.vision.num_images)
    ]
    proprio = rng.normal(size=predictor.cfg.constants.proprio_dim)
    kw = dict(unnorm_key=cfg.unnorm_key or None)

    action = predictor.predict_action(images, cfg.instruction,
                                      proprio=proprio, **kw)
    log.info("action chunk:\n%s", np.array_str(action, precision=4))
    times = []
    for i in range(cfg.iters):
        p = rng.normal(size=predictor.cfg.constants.proprio_dim)
        t0 = time.perf_counter()
        predictor.predict_action(images, cfg.instruction, proprio=p, **kw)
        times.append(time.perf_counter() - t0)
    log.info("latency over %d calls: median %.1f ms (min %.1f)",
             cfg.iters, 1e3 * float(np.median(times)), 1e3 * min(times))


if __name__ == "__main__":
    main()
