"""Tests against the reference's *real* shipped assets.

Two asset classes exist in /root/reference (everything else — trained
weights, simulators — is absent in this environment, see PARITY.md):
  * the released Qwen2.5 tokenizer files (pretrained_models/configs/), and
  * the canned LIBERO observation
    (experiments/robot/libero/sample_libero_spatial_observation.pkl).

Covered here:
  * bit-parity of the host-side image pipeline against the reference's own
    resize_image_for_policy / center_crop_image functions (imported from
    /root/reference with heavy deps stubbed) — openvla_utils.py:542-648;
  * the exact minivlm prompt string (openvla_utils.py:783);
  * an end-to-end Predictor run on the canned observation with the REAL
    Qwen tokenizer (full 151936-id space, no MockTokenizer anywhere);
  * the parity_check CLI in a CI-runnable round-trip mode: export a
    checkpoint dir, record a golden action, re-load and check.
"""

import importlib.util
import json
import pathlib
import pickle
import sys
import types

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")
TOK_DIR = REFERENCE / "pretrained_models/configs"
OBS_PKL = REFERENCE / "experiments/robot/libero/sample_libero_spatial_observation.pkl"

pytestmark = pytest.mark.skipif(
    not (TOK_DIR.is_dir() and OBS_PKL.exists()), reason="no reference assets"
)


@pytest.fixture(scope="module")
def canned_obs():
    with OBS_PKL.open("rb") as f:
        obs = pickle.load(f)
    assert obs["full_image"].shape == (224, 224, 3)
    assert obs["full_image"].dtype == np.uint8
    assert obs["state"].shape == (8,)
    return obs


@pytest.fixture(scope="module")
def ref_openvla_utils():
    """Import the reference's eval utils with its heavy deps stubbed out
    (we only exercise the pure-TF preprocessing functions)."""
    jn = types.ModuleType("json_numpy")
    jn.patch = lambda: None
    sys.modules.setdefault("json_numpy", jn)

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    class _Any:
        def __init__(self, *a, **k):
            pass

    for name, attrs in {
        "prismatic": {},
        "prismatic.extern": {},
        "prismatic.extern.hf": {},
        "prismatic.extern.hf.configuration_prismatic": {"OpenVLAConfig": _Any},
        "prismatic.extern.hf.modeling_prismatic": {
            "OpenVLAForActionPrediction": _Any},
        "prismatic.extern.hf.processing_prismatic": {
            "PrismaticImageProcessor": _Any, "PrismaticProcessor": _Any},
        "prismatic.models": {},
        "prismatic.models.action_heads": {"L1RegressionActionHead": _Any},
        "prismatic.models.film_vit_wrapper": {
            "FiLMedPrismaticVisionBackbone": _Any},
        "prismatic.models.projectors": {
            "NoisyActionProjector": _Any, "ProprioProjector": _Any},
        "prismatic.vla": {},
        "prismatic.vla.constants": {
            "ACTION_DIM": 7, "ACTION_PROPRIO_NORMALIZATION_TYPE": "bounds_q99"},
        "prismatic.vla.datasets": {},
        "prismatic.vla.datasets.rlds": {},
        "prismatic.vla.datasets.rlds.utils": {},
        "prismatic.vla.datasets.rlds.utils.data_utils": {
            "NormalizationType": _Any},
    }.items():
        stub(name, **attrs)

    path = REFERENCE / "experiments/robot/openvla_utils.py"
    spec = importlib.util.spec_from_file_location("ref_openvla_utils", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Image-pipeline bit-parity (reference openvla_utils.py:542-648)
# ---------------------------------------------------------------------------


def test_resize_bit_parity_vs_reference(ref_openvla_utils):
    pytest.importorskip("tensorflow")
    from vla_adapter_tpu.data.image_processing import prepare_image

    img = np.random.default_rng(0).integers(
        0, 256, size=(256, 312, 3), dtype=np.uint8
    )
    theirs = ref_openvla_utils.resize_image_for_policy(img, 224)
    ours = prepare_image(img, size=224, center_crop_scale=None)
    np.testing.assert_array_equal(ours, theirs)


def test_center_crop_bit_parity_vs_reference(ref_openvla_utils, canned_obs):
    pytest.importorskip("tensorflow")
    from vla_adapter_tpu.data.image_processing import prepare_image

    for key in ("full_image", "wrist_image"):
        img = canned_obs[key]
        # reference path for an already-224px obs: center_crop_image only
        # (resize skipped — openvla_utils.py:722)
        theirs = np.asarray(ref_openvla_utils.center_crop_image(img))
        ours = prepare_image(img, size=224, center_crop_scale=0.9)
        np.testing.assert_array_equal(ours, theirs, err_msg=key)


def test_full_prepare_pipeline_bit_parity(ref_openvla_utils):
    """Non-224 input: JPEG round-trip + lanczos3 resize + center crop."""
    pytest.importorskip("tensorflow")
    from vla_adapter_tpu.data.image_processing import prepare_image

    img = np.random.default_rng(1).integers(
        0, 256, size=(256, 256, 3), dtype=np.uint8
    )
    resized = ref_openvla_utils.resize_image_for_policy(img, 224)
    theirs = np.asarray(ref_openvla_utils.center_crop_image(resized))
    ours = prepare_image(img, size=224, center_crop_scale=0.9)
    np.testing.assert_array_equal(ours, theirs)


def test_minivlm_prompt_matches_reference_string(canned_obs):
    """Our prompt, with the training-path tail triple stripped, must
    tokenize to exactly the reference's bare inference f-string
    (openvla_utils.py:783) — that is what the model actually consumes."""
    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer
    from vla_adapter_tpu.data.transform import build_vla_prompt, encode_prompt

    task = canned_obs["task_description"]
    ref_prompt = (
        "<|im_start|>system\nYou are Qwen, created by Alibaba Cloud. You "
        "are a helpful assistant.<|im_end|>\n<|im_start|>user\nWhat action "
        f"should the robot take to {task.lower()}?<|im_end|>\n"
        "<|im_start|>assistant\n"
    )
    # string level: ours is the ref prompt + the empty-gpt-turn tail that
    # encode_prompt strips as the last 3 token ids (datasets.py:78-81)
    assert build_vla_prompt(task).startswith(ref_prompt)

    tok = load_qwen_tokenizer(str(TOK_DIR))
    ours = encode_prompt(
        lambda t: tok(t, add_special_tokens=True).input_ids, task
    )
    theirs = tok(ref_prompt, add_special_tokens=True).input_ids
    assert ours == theirs


# ---------------------------------------------------------------------------
# E2E: real tokenizer + canned observation through the Predictor
# ---------------------------------------------------------------------------


TINY_REAL_VOCAB_CFG = None


def _tiny_real_vocab_cfg():
    """Tiny geometry but the REAL 151936-id vocabulary and 64 action
    queries, so genuine Qwen token ids flow end-to-end."""
    global TINY_REAL_VOCAB_CFG
    if TINY_REAL_VOCAB_CFG is None:
        from vla_adapter_tpu.core.config import (
            ActionHeadConfig,
            FusedVisionConfig,
            Qwen2Config,
            ViTConfig,
            VLAConfig,
        )

        TINY_REAL_VOCAB_CFG = VLAConfig(
            platform="libero",
            vision=FusedVisionConfig(
                primary=ViTConfig(
                    name="p", image_size=28, patch_size=14, hidden_size=32,
                    num_layers=2, num_heads=4, mlp_dim=64, use_cls_token=True,
                    num_register_tokens=2, pos_embed_patches_only=True,
                    layer_scale_init=1e-5),
                fused=ViTConfig(
                    name="f", image_size=28, patch_size=14, hidden_size=48,
                    num_layers=2, num_heads=4, mlp_dim=96, use_cls_token=False,
                    pos_embed_patches_only=False, mlp_activation="gelu_tanh"),
                num_images=2,
            ),
            llm=Qwen2Config(vocab_size=151936, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, intermediate_size=128,
                            head_dim=16),
            head=ActionHeadConfig(num_blocks=2, hidden_dim=64,
                                  use_pro_version=True),
            max_text_tokens=128,
        )
    return TINY_REAL_VOCAB_CFG


@pytest.fixture(scope="module")
def real_tok_predictor(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from vla_adapter_tpu.data.normalization import dataset_statistics
    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer
    from vla_adapter_tpu.infer.predict import Predictor
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel

    cfg = _tiny_real_vocab_cfg()
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")
    model = VLAModel(cfg, rt)
    params = model.init(
        jax.random.key(0),
        input_ids=jnp.zeros((1, cfg.max_text_tokens), jnp.int32),
        prompt_len=jnp.array([5], jnp.int32),
        text_valid=jnp.ones((1, cfg.max_text_tokens), jnp.int32),
        pixel_values=jnp.zeros((1, 2, 28, 28, 6), jnp.float32),
        proprio=jnp.zeros((1, 8), jnp.float32),
    )["params"]

    rng = np.random.default_rng(0)
    stats = {"libero_spatial_no_noops": dataset_statistics(
        rng.uniform(-1, 1, size=(500, 7)),
        proprio=rng.normal(size=(500, 8)),
        action_mask=[True] * 6 + [False],
    )}
    tok = load_qwen_tokenizer(str(TOK_DIR))
    return Predictor(
        cfg=cfg,
        params=params,
        tokenize=lambda t: tok(t, add_special_tokens=True).input_ids,
        norm_stats=stats,
        rt=rt,
        center_crop=True,
    )


def test_canned_obs_e2e_predict(real_tok_predictor, canned_obs):
    """Full host pipeline (real tokenizer, real 224px obs, JPEG/crop parity
    path, proprio normalization) + model forward + unnormalization."""
    a = real_tok_predictor.predict_action(
        [canned_obs["full_image"], canned_obs["wrist_image"]],
        canned_obs["task_description"],
        proprio=canned_obs["state"],
        unnorm_key="libero_spatial_no_noops",
    )
    assert a.shape == (8, 7)
    assert np.isfinite(a).all()
    # deterministic: identical inputs -> identical actions
    b = real_tok_predictor.predict_action(
        [canned_obs["full_image"], canned_obs["wrist_image"]],
        canned_obs["task_description"],
        proprio=canned_obs["state"],
        unnorm_key="libero_spatial_no_noops",
    )
    np.testing.assert_array_equal(a, b)


def test_real_prompt_ids_disjoint_from_action_ids(real_tok_predictor,
                                                  canned_obs):
    """Prompt ids (incl. ChatML specials 151644/151645, which legitimately
    exceed ACTION_TOKEN_BEGIN_IDX=151386 — they only appear where labels are
    IGNOREd) must never collide with the 256 <|extra_i|> action-token ids,
    which occupy exactly [151665, 151920] (ref qwen25.py:60-66)."""
    from vla_adapter_tpu.data.action_tokenizer import ActionTokenizer
    from vla_adapter_tpu.data.transform import encode_prompt

    tok_len = 151921
    at = ActionTokenizer(tok_len)
    action_ids = at.encode_to_ids(np.linspace(-1, 1, 512))
    assert action_ids.min() >= 151665 and action_ids.max() <= 151920

    ids = encode_prompt(real_tok_predictor.tokenize,
                        canned_obs["task_description"])
    assert 10 < len(ids) < 64
    assert max(ids) < 151665  # below the first <|extra_0|> id


# ---------------------------------------------------------------------------
# parity_check CLI round-trip (the CI-runnable mode)
# ---------------------------------------------------------------------------


def test_parity_check_roundtrip(tmp_path, canned_obs, real_tok_predictor):
    """Export a checkpoint dir, record a golden action on the canned obs via
    the parity_check CLI, then re-load the export and check against the
    golden. Exercises the exact code path a real released checkpoint would
    take (load_vla -> Predictor -> predict_action -> tolerance gate)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import shutil

    from vla_adapter_tpu.eval import parity_check
    from vla_adapter_tpu.weights.export import export_checkpoint_dir

    pred = real_tok_predictor
    ckpt = export_checkpoint_dir(
        pred.params, pred.cfg, tmp_path / "ckpt",
        norm_stats=json.loads(json.dumps(
            pred.norm_stats, default=lambda o: np.asarray(o).tolist())),
    )
    for f in ("vocab.json", "merges.txt", "tokenizer_config.json",
              "special_tokens_map.json", "added_tokens.json"):
        if (TOK_DIR / f).exists():
            shutil.copy(TOK_DIR / f, ckpt / f)

    golden = tmp_path / "golden_action.json"
    instruction = canned_obs["task_description"]
    parity_check.main([
        "--mode", "record", "--ckpt_dir", str(ckpt), "--obs", str(OBS_PKL),
        "--out", str(golden), "--instruction", instruction,
    ])
    assert golden.exists()

    parity_check.main([
        "--mode", "check", "--ckpt_dir", str(ckpt), "--obs", str(OBS_PKL),
        "--golden", str(golden), "--instruction", instruction,
        "--atol", "1e-2",
    ])
