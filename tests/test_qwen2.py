"""Parity tests: our Qwen2 decoder vs HF transformers Qwen2ForCausalLM.

A tiny randomly-initialized HF Qwen2 (fp32, CPU) is the golden reference —
weight ingestion goes through weights/convert.py, so these tests cover both
the model math and the converter. Bidirectional mode is checked by passing
HF an explicit all-zeros 4D additive mask (what the OFT fork effectively
does to the whole sequence).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_adapter_tpu.core.config import Qwen2Config
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.qwen2 import Qwen2Model
from vla_adapter_tpu.weights.convert import qwen2_params_from_hf, state_dict_to_numpy

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = Qwen2Config(
    vocab_size=256,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    intermediate_size=128,
    head_dim=16,
    rope_theta=1e6,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    hf_cfg = HFQwen2Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        intermediate_size=TINY.intermediate_size,
        head_dim=TINY.head_dim,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=True,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    return model


@pytest.fixture(scope="module")
def jx_params(hf_model):
    sd = state_dict_to_numpy(hf_model.state_dict())
    return {"params": qwen2_params_from_hf(sd, TINY)}


def _hf_forward(hf_model, ids, attention_mask=None, bidirectional=False):
    with torch.no_grad():
        kwargs = dict(output_hidden_states=True)
        t_ids = torch.tensor(ids)
        if bidirectional:
            b, s = ids.shape
            # all-zeros additive 4D mask == fully bidirectional
            full = torch.zeros((b, 1, s, s), dtype=torch.float32)
            if attention_mask is not None:
                pad = torch.tensor(attention_mask, dtype=torch.bool)
                full = full.masked_fill(~pad[:, None, None, :], torch.finfo(torch.float32).min)
            kwargs["attention_mask"] = full
        elif attention_mask is not None:
            kwargs["attention_mask"] = torch.tensor(attention_mask)
        out = hf_model(t_ids, **kwargs)
    return out


@pytest.mark.parametrize("bidirectional", [False, True])
def test_qwen2_matches_hf(hf_model, jx_params, bidirectional):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 11))

    hf_out = _hf_forward(hf_model, ids, bidirectional=bidirectional)

    model = Qwen2Model(TINY, FP32_RUNTIME)
    out = model.apply(
        jx_params,
        input_ids=jnp.asarray(ids),
        causal=not bidirectional,
        output_hidden_states=True,
        compute_logits=True,
    )

    hf_hs = np.stack([h.numpy() for h in hf_out.hidden_states], axis=1)
    got_hs = np.asarray(out["hidden_states"])
    assert got_hs.shape == hf_hs.shape  # (B, L+1, S, D)
    np.testing.assert_allclose(got_hs, hf_hs, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), hf_out.logits.numpy(), atol=5e-4, rtol=2e-3
    )


def test_qwen2_padding_mask(hf_model, jx_params):
    """Right-padded batch must match HF given the same attention mask."""
    rng = np.random.default_rng(2)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[0, 9:] = 0  # row 0 has 3 pad tokens

    hf_out = _hf_forward(hf_model, ids, attention_mask=mask, bidirectional=True)

    model = Qwen2Model(TINY, FP32_RUNTIME)
    out = model.apply(
        jx_params,
        input_ids=jnp.asarray(ids),
        valid=jnp.asarray(mask),
        causal=False,
        output_hidden_states=True,
    )
    hf_hs = np.stack([h.numpy() for h in hf_out.hidden_states], axis=1)
    got_hs = np.asarray(out["hidden_states"])
    # compare only valid positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(
        got_hs[:, :, :9][valid[:, None, :9].repeat(TINY.num_layers + 1, 1)],
        hf_hs[:, :, :9][valid[:, None, :9].repeat(TINY.num_layers + 1, 1)],
        atol=2e-4,
        rtol=2e-3,
    )


def test_qwen2_inputs_embeds(hf_model, jx_params):
    """inputs_embeds path (used by the multimodal forward) matches ids path."""
    rng = np.random.default_rng(3)
    ids = rng.integers(0, TINY.vocab_size, size=(1, 7))
    model = Qwen2Model(TINY, FP32_RUNTIME)
    out_ids = model.apply(jx_params, input_ids=jnp.asarray(ids), causal=False)
    embeds = jnp.take(
        jx_params["params"]["embed"]["embedding"], jnp.asarray(ids), axis=0
    )
    out_emb = model.apply(jx_params, inputs_embeds=embeds, causal=False)
    np.testing.assert_allclose(
        np.asarray(out_ids["last_hidden_state"]),
        np.asarray(out_emb["last_hidden_state"]),
        atol=1e-6,
    )
