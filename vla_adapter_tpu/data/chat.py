"""Chat-style VLM pretraining datasets (reference prismatic/preprocessing/
datasets/datasets.py — AlignDataset / FinetuneDataset over LLaVA-style
JSON).

Record schema (LLaVA v1.5 data):
  {"image": "rel/path.jpg"?, "conversations":
     [{"from": "human", "value": "<image>\\n..."}, {"from": "gpt", ...}]}

* :class:`AlignDataset` — projector alignment: the prompt collapses to
  "{caption}<eos>" with loss on the caption only (reference :44-104).
* :class:`FinetuneDataset` — full chat: prompt built by the family's
  PromptBuilder; loss on gpt turns only (reference :106-190).
Both emit fixed-shape (input_ids, labels, text_valid, pixel_values?).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

from vla_adapter_tpu.core.constants import IGNORE_INDEX
from vla_adapter_tpu.data.image_processing import ImageProcessor
from vla_adapter_tpu.data.prompting import PROMPT_BUILDERS


class _ChatDatasetBase:
    def __init__(
        self,
        records: List[Dict] | str | Path,
        tokenize: Callable[[str], List[int]],
        image_processor: Optional[ImageProcessor],
        image_root: Optional[str] = None,
        max_text_tokens: int = 512,
        eos_token_id: int = 151643,
    ):
        if not isinstance(records, list):
            records = json.loads(Path(records).read_text())
        self.records = records
        self.tokenize = tokenize
        self.image_processor = image_processor
        self.image_root = Path(image_root) if image_root else None
        self.max_text_tokens = max_text_tokens
        self.eos_token_id = eos_token_id

    def __len__(self) -> int:
        return len(self.records)

    def _pixels(self, record) -> Optional[np.ndarray]:
        if "image" not in record or self.image_processor is None:
            return None
        from PIL import Image

        path = record["image"]
        if self.image_root is not None:
            path = self.image_root / path
        img = Image.open(path)
        return self.image_processor(img)[None]  # (1, H, W, C)

    def _pack(self, ids: List[int], labels: List[int]) -> Dict[str, np.ndarray]:
        t = self.max_text_tokens
        ids = ids[:t]
        labels = labels[:t]
        out_ids = np.zeros((t,), np.int32)
        out_lab = np.full((t,), IGNORE_INDEX, np.int32)
        valid = np.zeros((t,), np.int32)
        out_ids[: len(ids)] = ids
        out_lab[: len(labels)] = labels
        valid[: len(ids)] = 1
        return {"input_ids": out_ids, "labels": out_lab, "text_valid": valid}


class AlignDataset(_ChatDatasetBase):
    """Projector alignment: caption-only objective."""

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        record = self.records[i]
        caption = record["conversations"][-1]["value"].replace("<image>", "").strip()
        ids = list(self.tokenize(caption)) + [self.eos_token_id]
        labels = list(ids)
        # token 0 is the patch-splice anchor (the VLM inserts the image
        # after input position 0) and cannot be predicted image-aware —
        # the reference IGNOREs it (datasets.py:84-85 labels[0] =
        # IGNORE_INDEX); loss lands on the rest of caption+eos
        labels[0] = IGNORE_INDEX
        ex = self._pack(ids, labels)
        px = self._pixels(record)
        if px is not None:
            ex["pixel_values"] = px
        return ex


class FinetuneDataset(_ChatDatasetBase):
    """Multi-turn chat with loss on gpt turns only."""

    def __init__(self, *args, prompt_family: str = "qwen", **kwargs):
        super().__init__(*args, **kwargs)
        self.prompt_family = prompt_family

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        record = self.records[i]
        builder = PROMPT_BUILDERS[self.prompt_family]("openvla")
        ids: List[int] = []
        labels: List[int] = []
        for turn in record["conversations"]:
            role = "human" if turn["from"] == "human" else "gpt"
            before = builder.prompt
            builder.add_turn(role, turn["value"])
            segment = builder.prompt[len(before):]
            seg_ids = list(self.tokenize(segment))
            ids.extend(seg_ids)
            if role == "gpt":
                labels.extend(seg_ids)
            else:
                labels.extend([IGNORE_INDEX] * len(seg_ids))
        ex = self._pack(ids, labels)
        px = self._pixels(record)
        if px is not None:
            ex["pixel_values"] = px
        return ex
