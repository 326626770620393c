"""Parity: our Phi-2 decoder vs HF transformers PhiForCausalLM.

Same method as tests/test_qwen2.py — a tiny randomly-initialized HF Phi
(fp32, CPU) is the golden oracle; weight ingestion goes through
weights/convert.phi_params_from_hf, so these tests cover both the model
math (parallel blocks, partial rotary, LayerNorm biases, untied lm_head)
and the converter. Closes the reference LLM family previously documented
as unsupported (reference: prismatic/models/backbones/llm/phi.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vla_adapter_tpu.core.config import PhiConfig
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.phi import PhiModel
from vla_adapter_tpu.weights.convert import phi_params_from_hf, state_dict_to_numpy

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = PhiConfig(
    vocab_size=256,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    head_dim=16,
    partial_rotary_factor=0.5,
    rope_theta=1e4,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import PhiConfig as HFPhiConfig
    from transformers import PhiForCausalLM

    hf_cfg = HFPhiConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        partial_rotary_factor=TINY.partial_rotary_factor,
        rope_theta=TINY.rope_theta,
        layer_norm_eps=TINY.layer_norm_eps,
        qk_layernorm=False,
        attention_dropout=0.0,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        hidden_act="gelu_new",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return PhiForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def jx_params(hf_model):
    sd = state_dict_to_numpy(hf_model.state_dict())
    return {"params": phi_params_from_hf(sd, TINY)}


def test_phi_matches_hf(hf_model, jx_params):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 13))
    with torch.no_grad():
        hf_out = hf_model(torch.tensor(ids), output_hidden_states=True)

    out = PhiModel(TINY, FP32_RUNTIME).apply(
        jx_params,
        input_ids=jnp.asarray(ids),
        causal=True,
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


def test_phi_padding_mask(hf_model, jx_params):
    rng = np.random.default_rng(2)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[1, 7:] = 0
    with torch.no_grad():
        hf_out = hf_model(
            torch.tensor(ids), attention_mask=torch.tensor(mask),
            output_hidden_states=True,
        )
    out = PhiModel(TINY, FP32_RUNTIME).apply(
        jx_params,
        input_ids=jnp.asarray(ids),
        valid=jnp.asarray(mask),
        causal=True,
        output_hidden_states=True,
    )
    got = np.asarray(out["last_hidden_state"])[:, :7]
    want = hf_out.hidden_states[-1].numpy()[:, :7]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_phi_in_vlm():
    """PrismaticVLM hosts the Phi family through the llm dispatch (a
    phi-2-backed Prismatic VLM is a reference zoo member)."""
    import dataclasses
    import jax

    from tests.test_train_step import TINY_CFG
    from vla_adapter_tpu.models.vlm import PrismaticVLM

    cfg = dataclasses.replace(TINY_CFG, llm=TINY)
    model = PrismaticVLM(cfg, FP32_RUNTIME)
    rng = np.random.default_rng(3)
    b, t = 2, 12
    ids = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(b, t)))
    valid = jnp.ones((b, t), jnp.int32)
    v = cfg.vision
    pixels = jnp.asarray(rng.normal(
        size=(b, v.num_images, v.primary.image_size, v.primary.image_size,
              v.channels_per_image)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(b, t)))
    params = model.init(jax.random.key(0), input_ids=ids, text_valid=valid,
                        pixel_values=pixels, labels=labels)
    out = model.apply(params, input_ids=ids, text_valid=valid,
                      pixel_values=pixels, labels=labels)
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (b, t, TINY.vocab_size)


def test_phi_registry():
    from vla_adapter_tpu.models.registry import LLM_PROMPT_FAMILY, get_llm_backbone

    cfg = get_llm_backbone("phi-2-3b")
    assert isinstance(cfg, PhiConfig)
    assert cfg.rotary_dim == 32 and cfg.num_kv_heads == cfg.num_heads
    assert LLM_PROMPT_FAMILY["phi-2-3b"] == "phi"


def test_phi_backed_vla_forward_and_config_export(tmp_path):
    """A PhiConfig in VLAConfig.llm runs through the full VLA model (family
    dispatch in models/vla.py) and write_config_json handles the phi
    text_config fields."""
    import dataclasses
    import json

    import jax

    from tests.test_train_step import TINY_CFG
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel
    from vla_adapter_tpu.weights.export import write_config_json

    cfg = dataclasses.replace(TINY_CFG, llm=TINY)
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model = VLAModel(cfg, rt)
    b = 2
    out = model.init_with_output(
        jax.random.key(0),
        input_ids=jnp.zeros((b, cfg.max_text_tokens), jnp.int32),
        prompt_len=jnp.full((b,), 5, jnp.int32),
        text_valid=jnp.ones((b, cfg.max_text_tokens), jnp.int32),
        pixel_values=jnp.zeros((b, 2, 28, 28, 3), jnp.float32),
        proprio=jnp.zeros((b, 8), jnp.float32),
    )[0]
    actions = out["actions"]
    assert actions.shape == (b, cfg.constants.num_actions_chunk,
                             cfg.constants.action_dim)
    assert np.isfinite(np.asarray(actions)).all()

    write_config_json(cfg, tmp_path)
    doc = json.loads((tmp_path / "config.json").read_text())
    assert doc["text_config"]["model_type"] == "phi"
    assert doc["text_config"]["partial_rotary_factor"] == TINY.partial_rotary_factor

    # lossless round-trip of the phi-backed config
    from vla_adapter_tpu.weights.load import vla_config_from_checkpoint
    assert vla_config_from_checkpoint(tmp_path) == cfg
