"""Deploy CLI (reference vla-scripts/deploy.py).

    python -m vla_adapter_tpu.serve.deploy --ckpt_dir runs/... --port 8777
"""

from __future__ import annotations

import dataclasses

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)


@dataclasses.dataclass(frozen=True)
class DeployConfig:
    ckpt_dir: str = ""
    host: str = "0.0.0.0"
    port: int = 8777
    center_crop: bool = True
    # Coalesce concurrent /act requests into batched TPU forwards
    # (serve/batching.py); max_wait_ms bounds the added latency.
    dynamic_batch: bool = True
    max_batch: int = 16
    max_wait_ms: float = 4.0
    # Image-pipeline process pool size: concurrent requests preprocess on
    # N cores instead of timeslicing the GIL (~2x measured end-to-end /act
    # throughput at 16 clients). 0 = inline on request threads.
    preprocess_workers: int = 4


def main(argv=None) -> None:
    from vla_adapter_tpu.serve.server import ActionServer
    from vla_adapter_tpu.weights.load import load_vla

    cfg = parse_config(DeployConfig, argv)
    assert cfg.ckpt_dir, "--ckpt_dir is required"
    predictor = load_vla(cfg.ckpt_dir, center_crop=cfg.center_crop)
    log.info("model loaded from %s; serving /act on %s:%d",
             cfg.ckpt_dir, cfg.host, cfg.port)
    ActionServer(
        predictor, host=cfg.host, port=cfg.port,
        dynamic_batch=cfg.dynamic_batch, max_batch=cfg.max_batch,
        max_wait_ms=cfg.max_wait_ms,
        preprocess_workers=cfg.preprocess_workers,
    ).serve_forever()


if __name__ == "__main__":
    main()
