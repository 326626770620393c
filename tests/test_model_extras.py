"""FiLM, token objective, registry, prompt-builder parity, decode paths."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_step import TINY_CFG, _setup
from vla_adapter_tpu.data.prompting import (
    Llama2ChatPromptBuilder,
    MistralInstructPromptBuilder,
    PhiPromptBuilder,
    VicunaPromptBuilder,
)
from vla_adapter_tpu.models.generate import (
    discrete_actions_from_logits,
    greedy_generate,
)
from vla_adapter_tpu.models.registry import (
    LLM_BACKBONES,
    VISION_BACKBONES,
    get_llm_backbone,
    get_vision_backbone,
)

REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# Prompt-builder parity vs every reference prompter
# ---------------------------------------------------------------------------


def _load_ref_prompter(fname, cls_name):
    import importlib.util
    import pathlib

    if not pathlib.Path(REFERENCE).is_dir():
        pytest.skip("no reference checkout")
    base_path = (REFERENCE +
                 "/prismatic/models/backbones/llm/prompting/base_prompter.py")
    spec = importlib.util.spec_from_file_location("ref_base2", base_path)
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    for p in ("prismatic", "prismatic.models", "prismatic.models.backbones",
              "prismatic.models.backbones.llm",
              "prismatic.models.backbones.llm.prompting"):
        sys.modules.setdefault(p, types.ModuleType(p))
    sys.modules["prismatic.models.backbones.llm.prompting.base_prompter"] = base
    path = REFERENCE + "/prismatic/models/backbones/llm/prompting/" + fname
    spec = importlib.util.spec_from_file_location("ref_" + fname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, cls_name)


CONVOS = [
    [("human", "What action should the robot take to stack the blocks?"),
     ("gpt", "")],
    [("human", "hello <image> there"), ("gpt", "hi"), ("human", "go on"),
     ("gpt", "")],
    [("human", "just a question")],
]


@pytest.mark.parametrize("fname,cls_name,ours_cls", [
    ("llama2_chat_prompter.py", "LLaMa2ChatPromptBuilder", Llama2ChatPromptBuilder),
    ("vicuna_v15_prompter.py", "VicunaV15ChatPromptBuilder", VicunaPromptBuilder),
    ("mistral_instruct_prompter.py", "MistralInstructPromptBuilder",
     MistralInstructPromptBuilder),
    ("phi_prompter.py", "PhiPromptBuilder", PhiPromptBuilder),
])
def test_prompt_builders_match_reference(fname, cls_name, ours_cls):
    ref_cls = _load_ref_prompter(fname, cls_name)
    for convo in CONVOS:
        theirs, ours = ref_cls("openvla"), ours_cls("openvla")
        for role, msg in convo:
            theirs.add_turn(role, msg)
            ours.add_turn(role, msg)
        assert ours.get_prompt() == theirs.get_prompt(), (fname, convo)


# ---------------------------------------------------------------------------
# FiLM
# ---------------------------------------------------------------------------


def test_film_conditioning_changes_features():
    import dataclasses

    from vla_adapter_tpu.models.layers import FP32_RUNTIME
    from vla_adapter_tpu.models.vit import VisionTransformer

    base = dataclasses.replace(TINY_CFG.vision.primary, film_llm_dim=16)
    model = VisionTransformer(base, FP32_RUNTIME)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 28, 28, 3)), jnp.float32)
    lang_a = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    lang_b = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    params = model.init(jax.random.key(0), imgs, lang_a)
    # params include film projections
    flat = {jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    assert any("film_scale" in p for p in flat)
    # zero-init FiLM: identity modulation at step 0 (reference
    # film_vit_wrapper semantics) — language must NOT change features yet
    out_a = model.apply(params, imgs, lang_a)
    out_b = model.apply(params, imgs, lang_b)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    # ...but nonzero FiLM kernels DO modulate by the language embedding
    perturbed = jax.tree_util.tree_map_with_path(
        lambda p, v: (np.full(v.shape, 0.05, v.dtype)
                      if "film_scale" in jax.tree_util.keystr(p)
                      and "kernel" in jax.tree_util.keystr(p) else v),
        params,
    )
    out_a2 = model.apply(perturbed, imgs, lang_a)
    out_b2 = model.apply(perturbed, imgs, lang_b)
    assert np.abs(np.asarray(out_a2) - np.asarray(out_b2)).max() > 1e-6


# ---------------------------------------------------------------------------
# Token (CE) objective
# ---------------------------------------------------------------------------


def test_token_objective_train_step():
    import dataclasses

    import optax

    from vla_adapter_tpu.core.config import OptimizerConfig, TrainConfig
    from vla_adapter_tpu.data.dummy import make_dummy_batch
    from vla_adapter_tpu.models.layers import Runtime
    from vla_adapter_tpu.models.vla import VLAModel
    from vla_adapter_tpu.train.optim import make_optimizer
    from vla_adapter_tpu.train.step import init_train_state, make_train_step

    # tiny vocab model; generate labels within vocab but above a fake
    # ACTION_TOKEN_BEGIN threshold is impossible (151386 >> 512), so the
    # action-token metrics are zero-count -> just check loss finiteness
    # and that CE decreases.
    cfg = TINY_CFG
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
                 lora_rank=2, lora_scale=2.0)
    model = VLAModel(cfg, rt)
    tcfg = TrainConfig(model=cfg, objective="token",
                       optim=OptimizerConfig(learning_rate=1e-3, max_steps=50,
                                             num_steps_before_decay=100))
    tx = make_optimizer(tcfg.optim, warmup_steps=0)
    rng = np.random.default_rng(0)
    batch = make_dummy_batch(cfg, 2, rng)
    # labels: predict the action-block ids
    labels = np.full_like(batch["input_ids"], -100)
    for i in range(2):
        p = batch["prompt_len"][i]
        labels[i, p - 1 : p + 16] = batch["input_ids"][i, p - 1 : p + 16]
    batch["labels"] = labels
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_train_state(model, tx, batch, jax.random.key(0),
                             lora_enabled=True)
    step = jax.jit(make_train_step(model, tx, tcfg))
    losses = []
    for i in range(6):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
        assert "curr_action_accuracy" in m
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def test_registry_lookup():
    v = get_vision_backbone("dinosiglip-vit-so-224px")
    assert v.embed_dim == 2176 and v.num_patches_per_image == 256
    v384 = get_vision_backbone("dinosiglip-vit-so-384px")
    assert v384.primary.num_patches == (384 // 14) ** 2
    q = get_llm_backbone("qwen25-0_5b-extra")
    assert q.hidden_size == 896 and q.num_kv_heads == 2
    with pytest.raises(KeyError):
        get_vision_backbone("nope")
    p = get_llm_backbone("phi-2-3b")  # round 2: phi is a real backbone now
    assert p.hidden_size == 2560 and p.partial_rotary_factor == 0.4
    # all registered vision configs are internally consistent
    for name, cfg in VISION_BACKBONES.items():
        assert cfg.primary.hidden_size % cfg.primary.num_heads == 0, name
    for name, cfg in LLM_BACKBONES.items():
        kv = getattr(cfg, "num_kv_heads", cfg.num_heads)  # phi is MHA
        assert cfg.num_heads % kv == 0, name


# ---------------------------------------------------------------------------
# Decode paths
# ---------------------------------------------------------------------------


def test_discrete_actions_from_logits():
    tokenizer_len = 512
    b, t, v = 2, 40, 512
    prompt_len = np.array([5, 9], np.int32)
    rng = np.random.default_rng(0)
    # build logits whose argmax encodes known bins
    want_bins = rng.integers(1, 256, size=(b, 14))  # 2 actions x 7 dims
    logits = np.full((b, t, v), -10.0, np.float32)
    for i in range(b):
        for j in range(14):
            logits[i, prompt_len[i] - 1 + j, tokenizer_len - want_bins[i, j]] = 10.0
    acts = discrete_actions_from_logits(
        jnp.asarray(logits), jnp.asarray(prompt_len),
        num_actions_chunk=2, action_dim=7, tokenizer_len=tokenizer_len,
    )
    bins = np.linspace(-1, 1, 256)
    centers = (bins[:-1] + bins[1:]) / 2
    expect = centers[np.clip(want_bins - 1, 0, 254)].reshape(b, 2, 7)
    np.testing.assert_allclose(np.asarray(acts), expect, atol=1e-6)


def test_greedy_generate_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFC
    from transformers import Qwen2ForCausalLM

    from tests.test_qwen2 import TINY
    from vla_adapter_tpu.models.layers import FP32_RUNTIME
    from vla_adapter_tpu.models.qwen2 import Qwen2Model
    from vla_adapter_tpu.weights.convert import (
        qwen2_params_from_hf,
        state_dict_to_numpy,
    )

    hf_cfg = HFC(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers, num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        intermediate_size=TINY.intermediate_size, head_dim=TINY.head_dim,
        rope_theta=TINY.rope_theta, rms_norm_eps=TINY.rms_norm_eps,
        tie_word_embeddings=True, attention_dropout=0.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    params = {"params": qwen2_params_from_hf(
        state_dict_to_numpy(hf.state_dict()), TINY)}

    prompt = np.random.default_rng(3).integers(0, 256, size=(1, 6))
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor(prompt), max_new_tokens=8, do_sample=False,
            use_cache=True, pad_token_id=0,
        ).numpy()

    model = Qwen2Model(TINY, FP32_RUNTIME)
    buf = np.zeros((1, 6 + 8), np.int32)
    buf[:, :6] = prompt
    got = greedy_generate(
        model, params["params"], jnp.asarray(buf),
        jnp.array([6], jnp.int32), max_new_tokens=8,
    )
    np.testing.assert_array_equal(np.asarray(got)[0], hf_out[0])

    # KV-cached decode must produce the identical sequence
    from vla_adapter_tpu.models.generate import greedy_generate_cached

    got_cached = greedy_generate_cached(
        model, params["params"], jnp.asarray(buf), prompt_len=6,
        max_new_tokens=8,
    )
    np.testing.assert_array_equal(np.asarray(got_cached)[0], hf_out[0])


def test_model_zoo_resolves_every_reference_model():
    """All 51 reference MODEL_REGISTRY ids (prismatic/models/registry.py)
    resolve to structural configs and build a VLAConfig (round 2: that
    includes phi-2, which has a real decoder in models/phi.py)."""
    import pytest as _pytest

    from vla_adapter_tpu.models.zoo import (
        MODEL_ZOO,
        available_models,
        build_vlm_config,
        get_zoo_entry,
    )

    # 51 MODEL_REGISTRY ids + dinosiglip-224px-resize-naive+7b, which
    # exists only in the reference's conf/models.py registry
    assert len(MODEL_ZOO) == 52
    for mid in available_models():
        entry = get_zoo_entry(mid)
        assert entry.model_id == mid
        cfg = build_vlm_config(entry)
        assert cfg.llm.hidden_size > 0 and cfg.vision.primary.num_patches > 0

    # name-alias lookup (reference GLOBAL_REGISTRY behavior)
    assert get_zoo_entry("Prism DINOSigLIP 13B").model_id == "prism-dinosiglip+13b"
    # the VLA-Adapter base VLM resolves to the flagship geometry
    base = build_vlm_config(get_zoo_entry("prism-qwen25-extra-dinosiglip-224px+0_5b"))
    assert base.llm.hidden_size == 896 and base.vision.embed_dim == 2176
