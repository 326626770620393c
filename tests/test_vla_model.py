"""End-to-end VLA model parity.

Golden: an independent torch pipeline assembled from verified pieces —
HF Qwen2 (bidirectional 4D mask), the timm-semantics ViT golden
(tests/golden_utils.py), torch projector linears, and the *reference*
action-head module loaded from /root/reference. Weights are packed into an
HF-layout state dict and ingested through weights/convert.py
vla_params_from_hf — so this covers the production checkpoint path, the
multimodal splice, the action-query replacement, and the off-by-one
extraction quirks, end to end.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vla_adapter_tpu.core.config import (
    ActionHeadConfig,
    FusedVisionConfig,
    Qwen2Config,
    ViTConfig,
    VLAConfig,
)
from vla_adapter_tpu.core.constants import NormalizationType, PlatformConstants
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.vla import VLAModel
from vla_adapter_tpu.weights.convert import (
    action_head_params_from_torch,
    mlp_projector_params_from_torch,
    state_dict_to_numpy,
    vla_params_from_hf,
)

torch = pytest.importorskip("torch")
from tests.golden_utils import make_timm_state_dict, timm_forward  # noqa: E402
from tests.test_action_head import REFERENCE, ref_modules  # noqa: E402,F401

# --- tiny geometry -----------------------------------------------------------
PRIMARY = ViTConfig(
    name="p", image_size=28, patch_size=14, hidden_size=32, num_layers=4,
    num_heads=4, mlp_dim=64, use_cls_token=True, num_register_tokens=2,
    pos_embed_patches_only=True, layer_scale_init=1e-5,
)
FUSED = ViTConfig(
    name="f", image_size=28, patch_size=14, hidden_size=48, num_layers=5,
    num_heads=4, mlp_dim=96, use_cls_token=False, num_register_tokens=0,
    pos_embed_patches_only=False, layer_scale_init=None,
    mlp_activation="gelu_tanh",
)
LLM = Qwen2Config(vocab_size=512, hidden_size=64, num_layers=4, num_heads=4,
                  num_kv_heads=2, intermediate_size=128, head_dim=16)
CONSTS = PlatformConstants(
    name="test", num_actions_chunk=8, action_dim=7, proprio_dim=8,
    normalization_type=NormalizationType.BOUNDS_Q99,
    num_action_query_tokens=16,
)
CFG = VLAConfig(
    platform="libero",
    custom_constants=CONSTS,
    vision=FusedVisionConfig(primary=PRIMARY, fused=FUSED, num_images=2),
    llm=LLM,
    head=ActionHeadConfig(num_blocks=4, hidden_dim=64, use_pro_version=True),
    max_text_tokens=32,
)

NUM_PATCHES = CFG.num_patches  # 2 images * 4 patches
NUM_Q = 16
B = 2


@pytest.fixture(scope="module")
def torch_world(ref_modules):  # noqa: F811
    """Build every torch-side module + the packed HF state dict."""
    from transformers import Qwen2Config as HFC
    from transformers import Qwen2ForCausalLM

    ah_mod, pj_mod = ref_modules
    torch.manual_seed(0)
    g = torch.Generator().manual_seed(7)

    hf_llm = Qwen2ForCausalLM(HFC(
        vocab_size=LLM.vocab_size, hidden_size=LLM.hidden_size,
        num_hidden_layers=LLM.num_layers, num_attention_heads=LLM.num_heads,
        num_key_value_heads=LLM.num_kv_heads,
        intermediate_size=LLM.intermediate_size, head_dim=LLM.head_dim,
        rope_theta=LLM.rope_theta, rms_norm_eps=LLM.rms_norm_eps,
        tie_word_embeddings=True, attention_dropout=0.0,
        attn_implementation="eager",
    )).eval()

    dino_sd = make_timm_state_dict(PRIMARY, seed=1)
    siglip_sd = make_timm_state_dict(FUSED, seed=2)

    vdim = PRIMARY.hidden_size + FUSED.hidden_size  # 80
    proj = {
        "fc1.weight": torch.randn(4 * vdim, vdim, generator=g) * 0.05,
        "fc1.bias": torch.randn(4 * vdim, generator=g) * 0.02,
        "fc2.weight": torch.randn(LLM.hidden_size, 4 * vdim, generator=g) * 0.05,
        "fc2.bias": torch.randn(LLM.hidden_size, generator=g) * 0.02,
        "fc3.weight": torch.randn(LLM.hidden_size, LLM.hidden_size, generator=g) * 0.05,
        "fc3.bias": torch.randn(LLM.hidden_size, generator=g) * 0.02,
    }
    action_queries = torch.randn(NUM_Q, LLM.hidden_size, generator=g) * 0.02

    head = ah_mod.MLPResNet(
        num_blocks=4, input_dim=7 * LLM.hidden_size, hidden_dim=LLM.hidden_size,
        output_dim=7, use_pro_version=True,
    ).eval()
    pproj = pj_mod.ProprioProjector(llm_dim=LLM.hidden_size, proprio_dim=8).eval()

    # Packed HF-layout state dict for our ingestion path.
    sd = {}
    for k, v in hf_llm.state_dict().items():
        sd["language_model." + k] = v
    for k, v in dino_sd.items():
        sd["vision_backbone.featurizer." + k] = v
    for k, v in siglip_sd.items():
        sd["vision_backbone.fused_featurizer." + k] = v
    for k, v in proj.items():
        sd["projector." + k] = v
    sd["action_queries.weight"] = action_queries
    return dict(hf_llm=hf_llm, dino_sd=dino_sd, siglip_sd=siglip_sd, proj=proj,
                action_queries=action_queries, head=head, pproj=pproj, sd=sd)


def _golden_forward(tw, ids, prompt_len, valid, pixels, proprio):
    """Torch pipeline mirroring reference semantics."""
    hf = tw["hf_llm"]
    t_ids = torch.tensor(ids)
    with torch.no_grad():
        emb = hf.model.embed_tokens(t_ids)  # (B, T, D)
        # replace action block with queries (reference :418-454)
        for i in range(B):
            p = int(prompt_len[i])
            emb[i, p : p + NUM_Q] = tw["action_queries"]

        # vision: per image, per tower (reference loops; we replicate)
        patch_list = []
        for i in range(pixels.shape[1]):  # num_images
            img = torch.tensor(pixels[:, i]).permute(0, 3, 1, 2)  # NCHW (B,6,H,W)
            d = timm_forward(tw["dino_sd"], PRIMARY, img[:, 0:3])
            s = timm_forward(tw["siglip_sd"], FUSED, img[:, 3:6])
            patch_list.append(torch.cat([d, s], dim=2))
        patches = torch.cat(patch_list, dim=1)  # (B, 8, 80)
        pr = tw["proj"]
        x = torch.nn.functional.linear(patches, pr["fc1.weight"], pr["fc1.bias"])
        x = torch.nn.functional.gelu(x)
        x = torch.nn.functional.linear(x, pr["fc2.weight"], pr["fc2.bias"])
        x = torch.nn.functional.gelu(x)
        projected = torch.nn.functional.linear(x, pr["fc3.weight"], pr["fc3.bias"])

        mm = torch.cat([emb[:, :1], projected, emb[:, 1:]], dim=1)
        t_valid = torch.tensor(
            np.concatenate(
                [valid[:, :1], np.ones((B, NUM_PATCHES), valid.dtype), valid[:, 1:]],
                axis=1,
            )
        ).bool()
        s_mm = mm.shape[1]
        mask4d = torch.zeros((B, 1, s_mm, s_mm))
        mask4d = mask4d.masked_fill(
            ~t_valid[:, None, None, :], torch.finfo(torch.float32).min
        )
        out = hf.model(
            inputs_embeds=mm, attention_mask=mask4d, output_hidden_states=True
        )
        hs = torch.stack(out.hidden_states, dim=1)  # (B, L+1, S, D)

        task = hs[:, :, :NUM_PATCHES]
        acts = []
        for i in range(B):
            start = NUM_PATCHES + int(prompt_len[i]) - 1  # the off-by-one
            acts.append(hs[i : i + 1, :, start : start + NUM_Q])
        action_states = torch.cat(acts, dim=0)
        head_in = torch.cat([task, action_states], dim=2)

        pf = tw["pproj"](torch.tensor(proprio)).unsqueeze(1)
        latents = torch.zeros(B, 8, 7 * LLM.hidden_size)
        golden = tw["head"](
            latents,
            h_a=action_states.float(),
            p=pf,
            h_t=task.float(),
        )
    return golden.numpy(), head_in.numpy()


def test_vla_end_to_end_matches_composed_golden(torch_world):
    tw = torch_world
    rng = np.random.default_rng(0)

    prompt_len = np.array([7, 5], np.int32)
    ids = np.zeros((B, CFG.max_text_tokens), np.int64)
    valid = np.zeros((B, CFG.max_text_tokens), np.int32)
    for i in range(B):
        p = prompt_len[i]
        ids[i, :p] = rng.integers(1, 400, size=p)
        ids[i, p : p + NUM_Q] = 1  # placeholder ids (embeddings get replaced)
        ids[i, p + NUM_Q] = 2      # STOP (inference layout)
        valid[i, : p + NUM_Q + 1] = 1

    pixels = rng.normal(size=(B, 2, 28, 28, 6)).astype(np.float32)
    # bf16 round-trip so the reference's internal proprio bf16 cast
    # (action_heads.py:53) is a no-op on both sides.
    proprio = (
        rng.normal(size=(B, 8)).astype(np.float32).astype(np.dtype("float32"))
    )
    proprio = np.asarray(jnp.asarray(proprio, jnp.bfloat16), np.float32)

    golden_actions, golden_head_in = _golden_forward(
        tw, ids, prompt_len, valid, pixels, proprio
    )

    sd_np = state_dict_to_numpy(tw["sd"])
    params = vla_params_from_hf(sd_np, CFG)
    params["action_head"] = action_head_params_from_torch(
        state_dict_to_numpy(tw["head"].state_dict()), 4, True, prefix=""
    )
    params["proprio_projector"] = mlp_projector_params_from_torch(
        state_dict_to_numpy(tw["pproj"].state_dict())
    )

    model = VLAModel(CFG, FP32_RUNTIME)
    out = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        prompt_len=jnp.asarray(prompt_len),
        text_valid=jnp.asarray(valid),
        pixel_values=jnp.asarray(pixels),
        proprio=jnp.asarray(proprio),
        train=False,
        return_hidden_states=True,
    )

    np.testing.assert_allclose(
        np.asarray(out["hidden_states"]), golden_head_in, atol=5e-4, rtol=5e-3
    )
    assert out["actions"].shape == (B, 8, 7)
    np.testing.assert_allclose(
        np.asarray(out["actions"]), golden_actions, atol=1e-3, rtol=5e-3
    )


def test_vla_param_count_matches_init(torch_world):
    """Converted tree must be structurally identical to a fresh init."""
    tw = torch_world
    sd_np = state_dict_to_numpy(tw["sd"])
    params = vla_params_from_hf(sd_np, CFG)
    params["action_head"] = action_head_params_from_torch(
        state_dict_to_numpy(tw["head"].state_dict()), 4, True, prefix=""
    )
    params["proprio_projector"] = mlp_projector_params_from_torch(
        state_dict_to_numpy(tw["pproj"].state_dict())
    )

    model = VLAModel(CFG, FP32_RUNTIME)
    ref = model.init(
        jax.random.key(0),
        input_ids=jnp.zeros((1, CFG.max_text_tokens), jnp.int32),
        prompt_len=jnp.array([5], jnp.int32),
        text_valid=jnp.ones((1, CFG.max_text_tokens), jnp.int32),
        pixel_values=jnp.zeros((1, 2, 28, 28, 6), jnp.float32),
        proprio=jnp.zeros((1, 8), jnp.float32),
    )["params"]

    ref_paths = set(jax.tree_util.tree_leaves_with_path(ref, is_leaf=None) and
                    [jax.tree_util.keystr(p) for p, _ in
                     jax.tree_util.tree_flatten_with_path(ref)[0]])
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    assert ref_paths == got_paths
    for (p1, a), (p2, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(ref)[0], key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert np.asarray(a).shape == np.asarray(b).shape, (
            jax.tree_util.keystr(p1), np.asarray(a).shape, np.asarray(b).shape
        )


def test_compute_actions_false_logits_match():
    """Token-objective fast path: skipping the head + computing logits only
    at text positions must give bit-identical logits to the full path (the
    tied lm head is a row-independent matmul)."""
    import dataclasses

    import jax
    import numpy as np

    from tests.test_train_step import TINY_CFG
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    cfg = dataclasses.replace(TINY_CFG)
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model = VLAModel(cfg, rt)
    b = 2
    kwargs = dict(
        input_ids=jnp.zeros((b, cfg.max_text_tokens), jnp.int32),
        prompt_len=jnp.full((b,), 5, jnp.int32),
        text_valid=jnp.ones((b, cfg.max_text_tokens), jnp.int32),
        pixel_values=jnp.asarray(
            np.random.default_rng(0).normal(size=(b, 2, 28, 28, 3)),
            jnp.float32),
        proprio=jnp.zeros((b, 8), jnp.float32),
    )
    params = model.init(jax.random.key(0), **kwargs)["params"]
    full = model.apply({"params": params}, **kwargs, compute_logits=True)
    fast = model.apply({"params": params}, **kwargs, compute_logits=True,
                       compute_actions=False)
    assert "actions" not in fast
    np.testing.assert_array_equal(np.asarray(full["logits"]),
                                  np.asarray(fast["logits"]))
