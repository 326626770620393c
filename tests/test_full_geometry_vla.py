"""FLAGSHIP-GEOMETRY assembled-VLA golden (slow).

tests/test_vla_model.py proves the full assembly (action-query splice,
multimodal concat, off-by-one extraction, 24-block head) at tiny geometry,
and tests/test_full_geometry.py proves each component at flagship geometry
— but an assembly-level bug that only manifests at the real dims (a GQA
fold wrong only at 14/2 x 64-dim heads, a head-block indexing error that
needs all 25 hidden-state layers, a 6272-dim reshape transposed) would slip
both. This test closes that gap: the EXACT flagship config — Qwen2.5-0.5B
(896 hidden, 24 layers, 14/2 GQA, 151936-vocab tied), DINOv2-L/14-reg4 +
SigLIP-so400m/14 @224px (512 patches, 2176 fused dim), fused projector
2176->8704->896->896, 64 action queries, 24-block Pro head with 6272-dim
latents — against an independent torch pipeline assembled from HF
Qwen2ForCausalLM, the timm-semantics oracle, torch projector linears, and
the reference repo's own action-head module, asserting (8, 7) action
parity end to end.

Matches: reference modeling_prismatic.py:525-686,892-972 (multimodal
forward + predict_action) and prismatic/models/action_heads.py:287-410
(MLPResNetBlock_Pro), at the geometry of
pretrained_models/configs/config.json.

Run tier: `pytest -m slow tests/test_full_geometry_vla.py` (~1.2B params
of fp32 CPU forwards on both sides; minutes).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.models.layers import FP32_RUNTIME
from vla_adapter_tpu.models.vla import VLAModel
from vla_adapter_tpu.weights.convert import (
    action_head_params_from_torch,
    mlp_projector_params_from_torch,
    state_dict_to_numpy,
    vla_params_from_hf,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.golden_utils import make_timm_state_dict, timm_forward  # noqa: E402
from tests.test_action_head import ref_modules  # noqa: E402,F401

pytestmark = pytest.mark.slow

CFG = VLAConfig()  # the flagship, verbatim
LLM = CFG.llm
PRIMARY = CFG.vision.primary
FUSED = CFG.vision.fused
NUM_PATCHES = CFG.num_patches            # 512 = 2 images x 256
NUM_Q = CFG.num_action_query_tokens      # 64
B = 1  # fp32 CPU at 1.2B params — one row keeps this in minutes


def _rescale_vit(sd):
    """make_timm_state_dict's std-0.1 block weights compound activations to
    ~1e2 over 24-27 layers; rescale to ~fan-in init so the parity check
    runs in the O(1)-activation regime trained weights live in (same fix
    as tests/test_full_geometry.py)."""
    for k, v in sd.items():
        if k.endswith(("attn.qkv.weight", "attn.proj.weight",
                       "mlp.fc1.weight", "mlp.fc2.weight")):
            v.mul_(1.0 / (0.1 * v.shape[-1] ** 0.5))
    return sd


@pytest.fixture(scope="module")
def torch_world(ref_modules):  # noqa: F811
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

    dino_sd = _rescale_vit(make_timm_state_dict(PRIMARY, seed=1))
    siglip_sd = _rescale_vit(make_timm_state_dict(FUSED, seed=2))

    vdim = PRIMARY.hidden_size + FUSED.hidden_size  # 2176
    d_llm = LLM.hidden_size

    def lin(out_d, in_d):
        # ~fan-in scale keeps projector outputs O(1) at 2176/8704 widths
        return torch.randn(out_d, in_d, generator=g) / in_d ** 0.5

    proj = {
        "fc1.weight": lin(4 * vdim, vdim),
        "fc1.bias": torch.randn(4 * vdim, generator=g) * 0.02,
        "fc2.weight": lin(d_llm, 4 * vdim),
        "fc2.bias": torch.randn(d_llm, generator=g) * 0.02,
        "fc3.weight": lin(d_llm, d_llm),
        "fc3.bias": torch.randn(d_llm, generator=g) * 0.02,
    }
    action_queries = torch.randn(NUM_Q, d_llm, generator=g) * 0.02

    head = ah_mod.MLPResNet(
        num_blocks=CFG.head.num_blocks,
        input_dim=CFG.constants.action_dim * d_llm,  # 6272
        hidden_dim=CFG.head.hidden_dim, output_dim=CFG.constants.action_dim,
        use_pro_version=CFG.head.use_pro_version,
    ).eval()
    pproj = pj_mod.ProprioProjector(
        llm_dim=d_llm, proprio_dim=CFG.constants.proprio_dim).eval()

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
    return dict(hf_llm=hf_llm, dino_sd=dino_sd, siglip_sd=siglip_sd,
                proj=proj, action_queries=action_queries, head=head,
                pproj=pproj, sd=sd)


def _golden_forward(tw, ids, prompt_len, valid, pixels, proprio):
    """Torch pipeline mirroring the reference semantics at flagship dims
    (same structure as tests/test_vla_model.py's tiny-geometry golden)."""
    hf = tw["hf_llm"]
    t_ids = torch.tensor(ids)
    with torch.no_grad():
        emb = hf.model.embed_tokens(t_ids)
        for i in range(B):
            p = int(prompt_len[i])
            emb[i, p: p + NUM_Q] = tw["action_queries"]

        patch_list = []
        for i in range(pixels.shape[1]):
            img = torch.tensor(pixels[:, i]).permute(0, 3, 1, 2)
            d = timm_forward(tw["dino_sd"], PRIMARY, img[:, 0:3])
            s = timm_forward(tw["siglip_sd"], FUSED, img[:, 3:6])
            patch_list.append(torch.cat([d, s], dim=2))
        patches = torch.cat(patch_list, dim=1)  # (B, 512, 2176)
        pr = tw["proj"]
        x = torch.nn.functional.linear(patches, pr["fc1.weight"], pr["fc1.bias"])
        x = torch.nn.functional.gelu(x)
        x = torch.nn.functional.linear(x, pr["fc2.weight"], pr["fc2.bias"])
        x = torch.nn.functional.gelu(x)
        projected = torch.nn.functional.linear(x, pr["fc3.weight"], pr["fc3.bias"])

        mm = torch.cat([emb[:, :1], projected, emb[:, 1:]], dim=1)
        t_valid = torch.tensor(np.concatenate(
            [valid[:, :1], np.ones((B, NUM_PATCHES), valid.dtype),
             valid[:, 1:]], axis=1)).bool()
        s_mm = mm.shape[1]
        mask4d = torch.zeros((B, 1, s_mm, s_mm))
        mask4d = mask4d.masked_fill(
            ~t_valid[:, None, None, :], torch.finfo(torch.float32).min)
        out = hf.model(inputs_embeds=mm, attention_mask=mask4d,
                       output_hidden_states=True)
        hs = torch.stack(out.hidden_states, dim=1)  # (B, 25, S, 896)

        task = hs[:, :, :NUM_PATCHES]
        acts = []
        for i in range(B):
            start = NUM_PATCHES + int(prompt_len[i]) - 1  # the off-by-one
            acts.append(hs[i: i + 1, :, start: start + NUM_Q])
        action_states = torch.cat(acts, dim=0)

        pf = tw["pproj"](torch.tensor(proprio)).unsqueeze(1)
        latents = torch.zeros(
            B, CFG.constants.num_actions_chunk,
            CFG.constants.action_dim * LLM.hidden_size)
        golden = tw["head"](latents, h_a=action_states.float(), p=pf,
                            h_t=task.float())
    return golden.numpy()


def test_flagship_vla_end_to_end_matches_composed_golden(torch_world):
    tw = torch_world
    rng = np.random.default_rng(0)

    # a realistic prompt length, ids spread across the full vocab incl. the
    # action-token tail where a bad pad-to-64 resize would bite
    prompt_len = np.array([24] * B, np.int32)
    ids = np.zeros((B, CFG.max_text_tokens), np.int64)
    valid = np.zeros((B, CFG.max_text_tokens), np.int32)
    for i in range(B):
        p = prompt_len[i]
        ids[i, : p - 4] = rng.integers(1, LLM.vocab_size, size=p - 4)
        ids[i, p - 4: p] = rng.integers(151386, LLM.vocab_size, size=4)
        ids[i, p: p + NUM_Q] = 1   # placeholders (embeddings get replaced)
        ids[i, p + NUM_Q] = 2      # STOP (inference layout)
        valid[i, : p + NUM_Q + 1] = 1

    pixels = rng.normal(size=(
        B, CFG.vision.num_images, PRIMARY.image_size, PRIMARY.image_size,
        CFG.vision.channels_per_image)).astype(np.float32)
    proprio = rng.normal(size=(B, CFG.constants.proprio_dim)).astype(np.float32)
    # bf16 round-trip so the reference's internal proprio bf16 cast
    # (action_heads.py:53) is a no-op on both sides
    proprio = np.asarray(jnp.asarray(proprio, jnp.bfloat16), np.float32)

    golden_actions = _golden_forward(tw, ids, prompt_len, valid, pixels,
                                     proprio)

    sd_np = state_dict_to_numpy(tw["sd"])
    params = vla_params_from_hf(sd_np, CFG)
    params["action_head"] = action_head_params_from_torch(
        state_dict_to_numpy(tw["head"].state_dict()), CFG.head.num_blocks,
        CFG.head.use_pro_version, prefix="")
    params["proprio_projector"] = mlp_projector_params_from_torch(
        state_dict_to_numpy(tw["pproj"].state_dict()))

    model = VLAModel(CFG, FP32_RUNTIME)
    out = model.apply(
        {"params": params},
        input_ids=jnp.asarray(ids),
        prompt_len=jnp.asarray(prompt_len),
        text_valid=jnp.asarray(valid),
        pixel_values=jnp.asarray(pixels),
        proprio=jnp.asarray(proprio),
        train=False,
    )

    actions = np.asarray(out["actions"])
    assert actions.shape == golden_actions.shape == (
        B, CFG.constants.num_actions_chunk, CFG.constants.action_dim)
    # fp32 CPU, 24+24+27 layers of depth on each side: component goldens
    # pass at 2e-3; the assembly compounds through the head's 24 blocks
    np.testing.assert_allclose(actions, golden_actions, atol=5e-3, rtol=5e-3)
