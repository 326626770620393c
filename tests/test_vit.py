"""Parity tests for models/vit.py + the timm-layout converter.

The golden is a small torch implementation of timm 0.9.x VisionTransformer
semantics (patch conv -> pos embed (no_embed_class variants) -> pre-norm
blocks with optional LayerScale -> tap at block `feature_layer`, no final
norm, prefix stripped). Weights are random, stored in timm naming, and flow
through weights/convert.py — covering both the model math and the converter
(transposes, qkv splitting, conv layout).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from vla_adapter_tpu.core.config import ViTConfig
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.vit import VisionTransformer
from vla_adapter_tpu.weights.convert import vit_params_from_timm

torch = pytest.importorskip("torch")
from tests.golden_utils import make_timm_state_dict, timm_forward  # noqa: E402

DINO_TINY = ViTConfig(
    name="dino-tiny", image_size=28, patch_size=14, hidden_size=32,
    num_layers=4, num_heads=4, mlp_dim=64, use_cls_token=True,
    num_register_tokens=2, pos_embed_patches_only=True,
    layer_scale_init=1e-5, mlp_activation="gelu",
)
SIGLIP_TINY = ViTConfig(
    name="siglip-tiny", image_size=28, patch_size=14, hidden_size=32,
    num_layers=5, num_heads=4, mlp_dim=48, use_cls_token=False,
    num_register_tokens=0, pos_embed_patches_only=False,
    layer_scale_init=None, mlp_activation="gelu_tanh",
)


@pytest.mark.parametrize("cfg", [DINO_TINY, SIGLIP_TINY], ids=lambda c: c.name)
def test_vit_matches_timm_semantics(cfg):
    sd_t = make_timm_state_dict(cfg, seed=0)
    images = torch.randn(2, 3, cfg.image_size, cfg.image_size,
                         generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        golden = timm_forward(sd_t, cfg, images).numpy()

    sd_np = {k: v.numpy() for k, v in sd_t.items()}
    params = vit_params_from_timm(sd_np, cfg)
    model = VisionTransformer(cfg, FP32_RUNTIME)
    got = model.apply(
        {"params": params}, jnp.asarray(images.numpy().transpose(0, 2, 3, 1))
    )
    assert got.shape == golden.shape == (2, cfg.num_patches, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-5, rtol=1e-4)
