"""Frame -> training-example transform (the RLDSBatchTransform equivalent).

Reference path (vla/datasets/datasets.py:29-143, minivlm branch): build a
Qwen chat prompt from the instruction, tokenize, strip the 3 trailing
tokens (' ', <|im_end|>, <|endoftext|>) left by the empty assistant turn,
append the flattened discretized action chunk padded/truncated to exactly
NUM_TOKENS ids (pad = sampling existing ids with replacement).

Our fixed-shape output adds `prompt_len` and pads `input_ids`/`text_valid`
to cfg.max_text_tokens (models/vla.py contract) instead of dynamic-length
tensors + a right-padding collator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List

import numpy as np

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.core.constants import IGNORE_INDEX, STOP_INDEX
from vla_adapter_tpu.data.action_tokenizer import ActionTokenizer
from vla_adapter_tpu.data.image_processing import ImageProcessor
from vla_adapter_tpu.data.prompting import QwenPromptBuilder


def build_vla_prompt(instruction: str) -> str:
    """The exact chat prompt used for every sample (datasets.py:66-77)."""
    b = QwenPromptBuilder("openvla")
    b.add_turn("human", f"What action should the robot take to {instruction.lower()}?")
    b.add_turn("gpt", "")
    return b.get_prompt()


def encode_prompt(tokenize: Callable[[str], List[int]], instruction: str) -> List[int]:
    """Prompt ids with the trailing [' ', <|im_end|>, EOS] triple stripped
    (datasets.py:78-81)."""
    ids = list(tokenize(build_vla_prompt(instruction)))
    if len(ids) >= 3:
        del ids[-3:]
    return ids


def pad_action_ids(
    flat_ids: List[int], num_tokens: int, rng: np.random.Generator
) -> List[int]:
    """Pad/truncate the flattened action-token ids to exactly num_tokens;
    padding samples existing ids with replacement (datasets.py:81-87)."""
    if num_tokens < len(flat_ids):
        return flat_ids[:num_tokens]
    extra = rng.choice(np.asarray(flat_ids), size=num_tokens - len(flat_ids),
                       replace=True).tolist()
    return flat_ids + extra


@dataclass
class VLABatchTransform:
    """(frame dict) -> model-format example dict.

    frame schema (RLDS standard, reference datasets.py:41-52):
      observation/image_primary: (W?, H, W, 3) uint8 (window dim optional)
      observation/image_wrist*:  wrist cams (keys containing 'wrist')
      observation/proprio:       (P,) or (W?, P)
      task/language_instruction: str or bytes
      action:                    (chunk, action_dim) normalized
      dataset_name:              str
    """

    cfg: VLAConfig
    tokenize: Callable[[str], List[int]]
    action_tokenizer: ActionTokenizer
    image_processor: ImageProcessor = field(default_factory=ImageProcessor)
    use_wrist_image: bool = True
    # NOTE: no predict_stop_token knob — training never constructs a STOP
    # token in this path (the minivlm branch the recipe uses, reference
    # datasets.py:54-89), and inference always appends one (inference_ids,
    # matching modeling_prismatic.py:748-769). A config flag here would be
    # dead code pretending otherwise.
    seed: int = 0

    def __post_init__(self):
        self._rng = np.random.default_rng(self.seed)

    @staticmethod
    def _first(x):
        x = np.asarray(x)
        return x[0] if x.ndim >= 4 or (x.ndim == 2 and x.shape[0] == 1) else x

    def __call__(self, frame: Dict[str, Any]) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        consts = cfg.constants
        num_q = consts.num_action_query_tokens
        t_max = cfg.max_text_tokens

        lang = frame["task"]["language_instruction"]
        if isinstance(lang, bytes):
            lang = lang.decode()
        actions = np.asarray(frame["action"], np.float32)
        assert actions.shape == (consts.num_actions_chunk, consts.action_dim), (
            actions.shape
        )

        prompt_ids = encode_prompt(self.tokenize, lang)
        flat_action_ids = (
            self.action_tokenizer.encode_to_ids(actions).reshape(-1).tolist()
        )
        action_ids = pad_action_ids(flat_action_ids, num_q, self._rng)

        p = len(prompt_ids)
        # +1 keeps trainable prompts a subset of servable ones: inference
        # appends a STOP token after the query block (inference_ids), so a
        # prompt that only fits without it would train fine and then crash
        # at serving time
        assert p + num_q + 1 <= t_max, (p, num_q, t_max)
        input_ids = np.zeros((t_max,), np.int32)
        input_ids[:p] = prompt_ids
        input_ids[p : p + num_q] = action_ids
        valid = np.zeros((t_max,), np.int32)
        valid[: p + num_q] = 1

        # CE-objective labels (discrete path): IGNORE everywhere except the
        # final prompt token + action ids (datasets.py:124: last
        # NUM_TOKENS+1 positions keep labels).
        labels = np.full((t_max,), IGNORE_INDEX, np.int32)
        labels[p - 1 : p + num_q] = input_ids[p - 1 : p + num_q]

        obs = frame["observation"]
        images = [self.image_processor(self._first(obs["image_primary"]))]
        if self.use_wrist_image:
            for k in sorted(obs.keys()):
                if "wrist" in k:
                    images.append(self.image_processor(self._first(obs[k])))
        assert len(images) == cfg.vision.num_images, (
            len(images), cfg.vision.num_images
        )
        pixel_values = np.stack(images, axis=0)  # (n_img, H, W, 6)

        out = {
            "input_ids": input_ids,
            "prompt_len": np.int32(p),
            "text_valid": valid,
            "labels": labels,
            "pixel_values": pixel_values,
            "actions": actions,
            "dataset_name": frame.get("dataset_name", ""),
        }
        if cfg.use_proprio and "proprio" in obs:
            out["proprio"] = np.asarray(obs["proprio"], np.float32).reshape(-1)
        return out

    def inference_ids(self, instruction: str):
        """(input_ids, prompt_len, valid) for predict_action: prompt + 64
        placeholders + STOP (modeling_prismatic.py:748-769)."""
        cfg = self.cfg
        num_q = cfg.constants.num_action_query_tokens
        t_max = cfg.max_text_tokens
        prompt_ids = encode_prompt(self.tokenize, instruction)
        p = len(prompt_ids)
        assert p + num_q + 1 <= t_max, (p, num_q, t_max)
        input_ids = np.zeros((t_max,), np.int32)
        input_ids[:p] = prompt_ids
        input_ids[p : p + num_q] = 1  # placeholders (embeddings replaced)
        input_ids[p + num_q] = STOP_INDEX
        valid = np.zeros((t_max,), np.int32)
        valid[: p + num_q + 1] = 1
        return input_ids, np.int32(p), valid
