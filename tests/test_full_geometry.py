"""FULL-FLAGSHIP-GEOMETRY goldens vs the installed torch oracles (slow).

Every other golden runs at tiny geometry; sound method, but tiny shapes
cannot catch full-size layout/precision bugs (a wrong vocab-resize pad, a
so400m tap-index error, a GQA fold that only breaks at 14/2 heads). These
tests random-init the EXACT flagship configs — Qwen2.5-0.5B (hidden 896,
24 layers, 14/2 GQA, 151936-vocab tied embeddings, theta 1e6; reference
pretrained_models/configs/config.json text_config) and the dual ViT towers
(DINOv2-L/14-reg4 24L/1024 + SigLIP-so400m/14 27L/1152, L-2 feature tap;
reference modeling_prismatic.py:140-144) — push identical weights through
weights/convert.py into our models, and assert fp32 CPU parity against HF
Qwen2ForCausalLM / the timm-semantics torch oracle.

Run tier: `pytest -m slow tests/test_full_geometry.py` (~0.5B-param fp32
forwards on CPU; minutes, not seconds).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vla_adapter_tpu.core.config import (
    DINOV2_VIT_L_224,
    QWEN25_0_5B,
    SIGLIP_SO400M_224,
)
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.qwen2 import Qwen2Model
from vla_adapter_tpu.models.vit import VisionTransformer
from vla_adapter_tpu.weights.convert import (
    qwen2_params_from_hf,
    state_dict_to_numpy,
    vit_params_from_timm,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow

SEQ = 96  # long enough to exercise RoPE at theta 1e6; short enough for CPU


def test_qwen2_flagship_geometry_matches_hf():
    """All 25 hidden states + tied-embedding logits at the real 0.5B size."""
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM

    cfg = QWEN25_0_5B
    hf_cfg = HFQwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        intermediate_size=cfg.intermediate_size,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=True,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()

    rng = np.random.default_rng(0)
    # spread ids across the full 151936 vocab, incl. the action-token tail
    # (ACTION_TOKEN_BEGIN_IDX=151386) where a bad pad-to-64 resize would bite
    ids = np.concatenate(
        [rng.integers(0, cfg.vocab_size, size=(1, SEQ - 8)),
         rng.integers(151386, cfg.vocab_size, size=(1, 8))], axis=1)

    with torch.no_grad():
        # fully-bidirectional additive mask — the OFT-fork mode the VLA uses
        full = torch.zeros((1, 1, SEQ, SEQ), dtype=torch.float32)
        hf_out = hf(torch.tensor(ids), attention_mask=full,
                    output_hidden_states=True)

    params = {"params": qwen2_params_from_hf(
        state_dict_to_numpy(hf.state_dict()), cfg)}
    out = Qwen2Model(cfg, FP32_RUNTIME).apply(
        params,
        input_ids=jnp.asarray(ids),
        causal=False,
        output_hidden_states=True,
        compute_logits=True,
    )

    hf_hs = np.stack([h.numpy() for h in hf_out.hidden_states], axis=1)
    got_hs = np.asarray(out["hidden_states"])
    assert got_hs.shape == hf_hs.shape == (1, cfg.num_layers + 1, SEQ,
                                           cfg.hidden_size)
    np.testing.assert_allclose(got_hs, hf_hs, atol=2e-3, rtol=2e-3)
    # tied-logits path over the full 151936 vocab at the last position
    np.testing.assert_allclose(
        np.asarray(out["logits"][:, -1]), hf_out.logits[:, -1].numpy(),
        atol=5e-3, rtol=2e-3)


@pytest.mark.parametrize("cfg", [DINOV2_VIT_L_224, SIGLIP_SO400M_224],
                         ids=lambda c: c.name)
def test_vit_flagship_geometry_matches_timm_semantics(cfg):
    """Full-size tower forward through the L-2 tap vs the torch oracle
    (timm 0.9.x semantics; reference taps get_intermediate_layers(n=
    len(blocks)-2), modeling_prismatic.py:140-144)."""
    from tests.golden_utils import make_timm_state_dict, timm_forward

    sd_t = make_timm_state_dict(cfg, seed=0)
    # make_timm_state_dict's std-0.1 block weights have per-branch gain
    # ~0.1*sqrt(E) >> 1; without LayerScale (so400m) 27 layers compound
    # activations to ~1e2, swamping an fp32 parity check with magnitude
    # noise. Rescale to roughly fan-in init so activations stay O(1) —
    # the regime trained weights live in.
    for k, v in sd_t.items():
        if k.endswith(("attn.qkv.weight", "attn.proj.weight",
                       "mlp.fc1.weight", "mlp.fc2.weight")):
            v.mul_(1.0 / (0.1 * v.shape[-1] ** 0.5))
    images = torch.randn(1, 3, cfg.image_size, cfg.image_size,
                         generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        golden = timm_forward(sd_t, cfg, images).numpy()

    params = vit_params_from_timm({k: v.numpy() for k, v in sd_t.items()}, cfg)
    got = VisionTransformer(cfg, FP32_RUNTIME).apply(
        {"params": params},
        jnp.asarray(images.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got)
    assert got.shape == golden.shape == (1, cfg.num_patches, cfg.hidden_size)
    np.testing.assert_allclose(got, golden, atol=2e-3, rtol=2e-3)
