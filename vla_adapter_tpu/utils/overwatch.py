"""Process-aware logging ("overwatch", reference prismatic/overwatch/).

INFO on process 0, ERROR elsewhere (reference overwatch.py:47-92 does this
per accelerate rank); plus jax-native rank/world helpers and the
`local_zero_first` context the data loaders use.
"""

from __future__ import annotations

import contextlib
import logging
import sys
from typing import Optional

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s :: %(message)s"


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover
        return 0


def process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:  # pragma: no cover
        return 1


def is_main_process() -> bool:
    return process_index() == 0


def initialize_overwatch(name: str, level: Optional[int] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.propagate = False
    if level is None:
        level = logging.INFO if is_main_process() else logging.ERROR
    logger.setLevel(level)
    return logger


@contextlib.contextmanager
def local_zero_first():
    """Run process 0 through the body before the rest (used for cache
    population); multi-host sync via a global barrier."""
    import jax

    if process_count() == 1:
        yield
        return
    from jax.experimental import multihost_utils

    if is_main_process():
        yield
        multihost_utils.sync_global_devices("local_zero_first")
    else:
        multihost_utils.sync_global_devices("local_zero_first")
        yield
