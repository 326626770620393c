"""Batch collation.

The reference right-pads dynamic-length sequences per batch
(util/data_utils.py:96-175). Our transform already emits fixed-shape
examples (XLA compiles once), so collation is a stack + optional
microbatch fold for gradient accumulation.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

_ARRAY_KEYS = (
    "input_ids", "prompt_len", "text_valid", "labels", "pixel_values",
    "actions", "proprio",
)


def collate(examples: Sequence[Dict], accum_steps: Optional[int] = None
            ) -> Dict[str, np.ndarray]:
    batch = {}
    for k in _ARRAY_KEYS:
        if k in examples[0]:
            batch[k] = np.stack([np.asarray(e[k]) for e in examples])
    if "dataset_name" in examples[0]:
        batch["dataset_name"] = [e["dataset_name"] for e in examples]
    if accum_steps and accum_steps > 1:
        b = len(examples)
        assert b % accum_steps == 0, (b, accum_steps)
        for k, v in batch.items():
            if isinstance(v, np.ndarray):
                batch[k] = v.reshape((accum_steps, b // accum_steps) + v.shape[1:])
    return batch
