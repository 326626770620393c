"""Tokenizer loading.

Loads the Qwen2 BPE tokenizer from a checkpoint/config directory
(vocab.json + merges.txt — the layout the reference ships in
pretrained_models/configs/) fully offline, and extends it with the 256
``<|extra_i|>`` action tokens exactly as the reference does
(qwen25.py:60-66: add_tokens then pad embeddings to a multiple of 64).

Everything downstream only needs `encode`/`decode` callables and the
integer ``len()`` — see data/action_tokenizer.py — so tests can substitute
a mock without transformers.
"""

from __future__ import annotations

NUM_EXTRA_TOKENS = 256


def load_qwen_tokenizer(config_dir: str, num_extra_tokens: int = NUM_EXTRA_TOKENS):
    """Returns an HF tokenizer extended with the extra action tokens."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(config_dir, local_files_only=True)
    if num_extra_tokens > 0:
        added = tok.add_tokens([f"<|extra_{i}|>" for i in range(num_extra_tokens)])
        assert added == num_extra_tokens, (added, num_extra_tokens)
    return tok


class MockTokenizer:
    """Deterministic stand-in with the real Qwen2.5 length arithmetic —
    for tests without tokenizer assets. Maps text to pseudo-ids by hashing
    words; decode is not invertible (never needed on the L1 path)."""

    def __init__(self, length: int = 151921, max_prompt_id: int = 400):
        # max_prompt_id bounds emitted ids so tiny test models (small vocab)
        # never see out-of-range ids (an OOV gather is garbage/NaN).
        self._len = length
        self._max_prompt_id = max_prompt_id

    def __len__(self) -> int:
        return self._len

    def __call__(self, text: str, add_special_tokens: bool = True):
        import hashlib

        ids = []
        for w in text.split(" "):
            h = int(hashlib.md5(w.encode()).hexdigest()[:6], 16)
            ids.append(3 + h % (self._max_prompt_id - 3))
        class R:  # mimic HF BatchEncoding.input_ids
            input_ids = ids
        return R

    def encode(self, text: str, add_special_tokens: bool = True):
        return self(text).input_ids

    def decode(self, ids):
        return " ".join(f"<{i}>" for i in ids)
