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
# CLIP-style: pre_norm (timm norm_pre after pos embed) + QuickGELU + eps 1e-5
CLIP_TINY = ViTConfig(
    name="clip-tiny", image_size=32, patch_size=16, hidden_size=32,
    num_layers=4, num_heads=4, mlp_dim=64, use_cls_token=True,
    num_register_tokens=0, pos_embed_patches_only=False, pre_norm=True,
    layer_scale_init=None, mlp_activation="quick_gelu", layernorm_eps=1e-5,
)


@pytest.mark.parametrize("cfg", [DINO_TINY, SIGLIP_TINY, CLIP_TINY],
                         ids=lambda c: c.name)
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


def test_registry_covers_reference_ids_and_image_sequences():
    """Every reference vision id (materialize.py:29-50) resolves; multi-frame
    input (image_sequence_len equivalent) multiplies the patch count."""
    import jax

    from vla_adapter_tpu.models.registry import (
        VISION_BACKBONES,
        get_vision_backbone,
        with_num_images,
    )
    from vla_adapter_tpu.models.vla import FusedVisionBackbone
    from vla_adapter_tpu.core.config import VLAConfig

    reference_ids = [
        "clip-vit-l", "siglip-vit-so400m", "dinov2-vit-l", "in1k-vit-l",
        "dinosiglip-vit-so-224px", "clip-vit-b", "clip-vit-l-336px",
        "siglip-vit-b16-224px", "siglip-vit-b16-256px", "siglip-vit-b16-384px",
        "siglip-vit-so400m-384px", "dinoclip-vit-l-336px",
        "dinosiglip-vit-so-384px",
    ]
    for rid in reference_ids:
        cfg = get_vision_backbone(rid)
        assert cfg.primary.num_patches > 0, rid
    assert set(reference_ids) <= set(VISION_BACKBONES)

    # image-sequence: 3 frames through a tiny single tower -> 3x patches
    tiny = with_num_images(
        __import__("dataclasses").replace(
            VISION_BACKBONES["dinov2-vit-l"],
            primary=DINO_TINY,
        ), 3)
    vcfg = VLAConfig(vision=tiny)
    model = FusedVisionBackbone(vcfg, FP32_RUNTIME)
    pix = jnp.zeros((2, 3, 28, 28, 3), jnp.float32)
    params = model.init(__import__("jax").random.key(0), pix)
    out = model.apply(params, pix)
    assert out.shape == (2, 3 * DINO_TINY.num_patches, DINO_TINY.hidden_size)
    assert vcfg.num_patches == 3 * DINO_TINY.num_patches
