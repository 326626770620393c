"""Discrete action tokenizer.

Uniform 256-bin discretizer mapping continuous action dims to the *last*
256 token ids of the vocabulary (reference vla/action_tokenizer.py:22-104).
With ``use_extra`` (the Qwen2.5 VLA-Adapter configuration) "vocabulary" is
the extended tokenizer length including the 256 added ``<|extra_i|>``
tokens (reference qwen25.py:60-66).

Decoupled from HF: only needs the integer ``tokenizer_len``; decoding to
strings (OpenVLA legacy path) takes an optional decode callable.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


class ActionTokenizer:
    def __init__(
        self,
        tokenizer_len: int,
        n_bins: int = 256,
        min_action: float = -1.0,
        max_action: float = 1.0,
        decode_fn: Optional[Callable[[List[int]], str]] = None,
    ):
        self.tokenizer_len = int(tokenizer_len)
        self.n_bins = n_bins
        self.min_action, self.max_action = min_action, max_action
        self.bins = np.linspace(min_action, max_action, n_bins)
        self.bin_centers = (self.bins[:-1] + self.bins[1:]) / 2.0
        self.decode_fn = decode_fn
        # ids strictly greater than this are action tokens
        self.action_token_begin_idx = self.tokenizer_len - (n_bins + 1)

    def encode_to_ids(self, action: np.ndarray) -> np.ndarray:
        """Continuous -> token ids (same shape). Bin k (1-based from
        np.digitize) maps to id tokenizer_len - k, i.e. the last n_bins ids
        in reverse order."""
        a = np.clip(action, self.min_action, self.max_action)
        disc = np.digitize(a, self.bins)
        return (self.tokenizer_len - disc).astype(np.int64)

    def __call__(self, action: np.ndarray) -> np.ndarray:
        return self.encode_to_ids(action)

    def encode_to_text(self, action: np.ndarray) -> str:
        assert self.decode_fn is not None, "needs a tokenizer decode fn"
        return self.decode_fn(self.encode_to_ids(action).reshape(-1).tolist())

    def decode_token_ids_to_actions(self, ids: np.ndarray) -> np.ndarray:
        """Inverse map via bin centers (reference :76-97 incl. the clip that
        folds digitize's inclusive upper bin onto the last center)."""
        disc = self.tokenizer_len - np.asarray(ids)
        disc = np.clip(disc - 1, 0, self.bin_centers.shape[0] - 1)
        return self.bin_centers[disc]

    @property
    def vocab_size(self) -> int:
        return self.n_bins


def qwen_extended_tokenizer_len(base_len: int = 151665,
                                num_extra: int = 256) -> int:
    """len(tokenizer) after adding the <|extra_i|> tokens (reference
    qwen25.py:60-66): Qwen2.5 ships 151643 BPE + 22 added special tokens =
    151665; +256 extras = 151921."""
    return base_len + num_extra


class VQActionTokenizer(ActionTokenizer):
    """Residual-VQ action tokenizer (reference action_tokenizer.py:107-191).

    Encodes an action chunk through a pretrained VQ-VAE and maps codebook
    indices onto the tail of the vocabulary. The reference loads a torch
    `vqvae` model from disk; pass any object with `get_code(actions) ->
    (B, num_codes) indices` and `draw_code_forward(indices) -> (B, chunk,
    dim)`. Unused by every released config (`use_vq=False`); included for
    API completeness.
    """

    def __init__(self, tokenizer_len: int, vq_model, n_bins: int = 256,
                 **kwargs):
        super().__init__(tokenizer_len, n_bins=n_bins, **kwargs)
        self.vq = vq_model

    def encode_to_ids(self, action: np.ndarray) -> np.ndarray:
        codes = np.asarray(self.vq.get_code(action[None]))[0]
        return (self.tokenizer_len - 1 - codes).astype(np.int64)

    def decode_token_ids_to_actions(self, ids: np.ndarray) -> np.ndarray:
        codes = self.tokenizer_len - 1 - np.asarray(ids)
        return np.asarray(self.vq.draw_code_forward(codes[None]))[0]


ACTION_TOKENIZERS = {
    "uniform": ActionTokenizer,
    "vq": VQActionTokenizer,
}


def detokenize_bin_ids_jnp(token_ids, tokenizer_len: int, n_bins: int = 256):
    """jnp twin of decode_token_ids_to_actions — the ONE bin-center inverse
    used by both the discrete decode path (models/generate.py) and the
    token-objective train metrics (train/step.py), so the clamping
    arithmetic cannot drift between them and the numpy original above."""
    import jax.numpy as jnp

    bins = jnp.linspace(-1.0, 1.0, n_bins)
    centers = (bins[:-1] + bins[1:]) / 2.0
    disc = jnp.clip(tokenizer_len - token_ids - 1, 0, n_bins - 2)
    return centers[disc]
