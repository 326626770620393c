"""Data-layer tests: prompting, action tokenizer, normalization, transform.

Where /root/reference is available, goldens are the actual reference
modules (prompt builder, tf gripper helpers, tf normalize) and the real
Qwen tokenizer assets — loaded at test time, never copied.
"""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

from vla_adapter_tpu.core.config import VLAConfig
from vla_adapter_tpu.core.constants import IGNORE_INDEX, NormalizationType
from vla_adapter_tpu.data.action_tokenizer import (
    ActionTokenizer,
    qwen_extended_tokenizer_len,
)
from vla_adapter_tpu.data.collator import collate
from vla_adapter_tpu.data.normalization import (
    binarize_gripper_actions,
    compute_statistics,
    dataset_statistics,
    invert_gripper_actions,
    load_dataset_statistics,
    normalize,
    rel2abs_gripper_actions,
    save_dataset_statistics,
    unnormalize,
)
from vla_adapter_tpu.data.prompting import QwenPromptBuilder
from vla_adapter_tpu.data.tokenization import MockTokenizer
from vla_adapter_tpu.data.transform import VLABatchTransform, build_vla_prompt

REFERENCE = "/root/reference"
HAS_REF = pathlib.Path(REFERENCE).is_dir()


def _load_ref(name, rel, stub_constants=False):
    if stub_constants:
        const = types.ModuleType("prismatic.vla.constants")
        const.NUM_ACTIONS_CHUNK, const.ACTION_DIM, const.PROPRIO_DIM = 8, 7, 8
        const.IGNORE_INDEX, const.ACTION_TOKEN_BEGIN_IDX = -100, 151386
        const.STOP_INDEX, const.NUM_TOKENS = 2, 64
        sys.modules.setdefault("prismatic", types.ModuleType("prismatic"))
        sys.modules.setdefault("prismatic.vla", types.ModuleType("prismatic.vla"))
        sys.modules["prismatic.vla.constants"] = const
        ow = types.ModuleType("prismatic.overwatch")

        class _Log:
            def __getattr__(self, _):
                return lambda *a, **k: None

        ow.initialize_overwatch = lambda *a, **k: _Log()
        ow_inner = types.ModuleType("prismatic.overwatch.overwatch")
        ow_inner.initialize_overwatch = ow.initialize_overwatch
        sys.modules["prismatic.overwatch"] = ow
        sys.modules["prismatic.overwatch.overwatch"] = ow_inner
    spec = importlib.util.spec_from_file_location(name, REFERENCE + rel)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Prompting
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not HAS_REF, reason="no reference checkout")
def test_qwen_prompt_matches_reference():
    base = _load_ref(
        "ref_base_prompter",
        "/prismatic/models/backbones/llm/prompting/base_prompter.py",
    )
    sys.modules["prismatic.models.backbones.llm.prompting.base_prompter"] = base
    pkg_chain = [
        "prismatic", "prismatic.models", "prismatic.models.backbones",
        "prismatic.models.backbones.llm",
        "prismatic.models.backbones.llm.prompting",
    ]
    for p in pkg_chain:
        sys.modules.setdefault(p, types.ModuleType(p))
    ref = _load_ref(
        "ref_qwen_prompter",
        "/prismatic/models/backbones/llm/prompting/qwen_prompter.py",
    )

    for msgs in (
        [("human", "What action should the robot take to pick up the cup?"),
         ("gpt", "")],
        [("human", "do x"), ("gpt", "ok"), ("human", "now y"), ("gpt", "")],
        [("human", "open <image> the drawer")],
    ):
        theirs = ref.QwenPromptBuilder("openvla")
        ours = QwenPromptBuilder("openvla")
        for role, msg in msgs:
            theirs.add_turn(role, msg)
            ours.add_turn(role, msg)
        assert ours.get_prompt() == theirs.get_prompt()


# ---------------------------------------------------------------------------
# Tokenizer + action tokenizer
# ---------------------------------------------------------------------------


TOK_DIR = REFERENCE + "/pretrained_models/configs"


@pytest.fixture(scope="module")
def qwen_tok():
    if not pathlib.Path(TOK_DIR).is_dir():
        pytest.skip("no tokenizer assets")
    from vla_adapter_tpu.data.tokenization import load_qwen_tokenizer

    return load_qwen_tokenizer(TOK_DIR)


def test_qwen_tokenizer_length_arithmetic(qwen_tok):
    assert len(qwen_tok) == qwen_extended_tokenizer_len() == 151921
    at = ActionTokenizer(len(qwen_tok))
    # all action token ids must exceed the mask threshold and fit the vocab
    ids = at.encode_to_ids(np.linspace(-1, 1, 50))
    assert ids.min() > 151386 and ids.max() < 151936
    assert at.action_token_begin_idx == 151921 - 257


def test_action_tokenizer_roundtrip():
    at = ActionTokenizer(151921)
    a = np.random.default_rng(0).uniform(-1, 1, size=(8, 7))
    ids = at.encode_to_ids(a)
    back = at.decode_token_ids_to_actions(ids)
    # uniform 256 bins over [-1,1] -> max error = bin width
    assert np.abs(back - a).max() <= 2.0 / 255


@pytest.mark.skipif(not HAS_REF, reason="no reference checkout")
def test_action_tokenizer_matches_reference(qwen_tok):
    ref = _load_ref("ref_action_tok", "/prismatic/vla/action_tokenizer.py",
                    stub_constants=True)
    theirs = ref.ActionTokenizer(qwen_tok, use_extra=True)
    ours = ActionTokenizer(len(qwen_tok))
    a = np.random.default_rng(1).uniform(-1.3, 1.3, size=(8, 7))
    their_ids = np.asarray(theirs(a, True))
    np.testing.assert_array_equal(ours.encode_to_ids(a), their_ids)
    np.testing.assert_allclose(
        ours.decode_token_ids_to_actions(their_ids),
        theirs.decode_token_ids_to_actions(their_ids),
    )


def test_prompt_encoding_strips_assistant_tail(qwen_tok):
    prompt = build_vla_prompt("pick up the cup")
    full = qwen_tok(prompt, add_special_tokens=True).input_ids
    from vla_adapter_tpu.data.transform import encode_prompt

    ids = encode_prompt(lambda t: qwen_tok(t, add_special_tokens=True).input_ids,
                        "pick up the cup")
    assert ids == full[:-3]
    # the stripped triple is [' ', <|im_end|>, <|endoftext|>]
    tail = qwen_tok.convert_ids_to_tokens(full[-3:])
    assert tail[-2:] == ["<|im_end|>", "<|endoftext|>"]


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def test_q99_normalize_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(1000, 7)) * np.array([1, 2, 3, 0.5, 1, 1, 0]) + 1
    acts[:, 6] = rng.integers(0, 2, size=1000)  # binary gripper
    stats = dataset_statistics(acts, proprio=rng.normal(size=(1000, 8)),
                               num_trajectories=10,
                               action_mask=[True] * 6 + [False])
    p = tmp_path / "dataset_statistics.json"
    save_dataset_statistics({"my_ds": stats}, p)
    loaded = load_dataset_statistics(p)["my_ds"]

    x = acts[:50]
    n = normalize(x, loaded["action"], NormalizationType.BOUNDS_Q99)
    assert n[:, :6].min() >= -1 and n[:, :6].max() <= 1
    np.testing.assert_array_equal(n[:, 6], x[:, 6])  # mask=False passthrough
    # roundtrip inside the quantile range
    inner = np.clip(x, np.asarray(loaded["action"]["q01"]),
                    np.asarray(loaded["action"]["q99"]))
    back = unnormalize(normalize(inner, loaded["action"],
                                 NormalizationType.BOUNDS_Q99),
                       loaded["action"], NormalizationType.BOUNDS_Q99)
    np.testing.assert_allclose(back[:, :6], inner[:, :6], atol=1e-4)


def test_degenerate_dims_map_to_zero():
    stats = {
        "min": [0.0, -1.0], "max": [0.0, 1.0],
        "q01": [0.0, -0.9], "q99": [0.0, 0.9],
        "mean": [0.0, 0.0], "std": [0.0, 1.0],
    }
    out = normalize(np.array([[0.5, 0.5]]), stats, NormalizationType.BOUNDS_Q99)
    assert out[0, 0] == 0.0  # min==max -> 0 even though input nonzero
    assert out[0, 1] != 0.0


@pytest.mark.skipif(not HAS_REF, reason="no reference checkout")
def test_gripper_helpers_match_reference_tf():
    tf = pytest.importorskip("tensorflow")

    # reference scan helpers, reimplemented check against tf originals
    # (load just the functions; data_utils imports dlimp which is absent, so
    # execute the relevant defs in an isolated namespace)
    src = pathlib.Path(
        REFERENCE + "/prismatic/vla/datasets/rlds/utils/data_utils.py"
    ).read_text()
    ns = {"tf": tf, "np": np}
    for fn_name in ("binarize_gripper_actions", "rel2abs_gripper_actions",
                    "invert_gripper_actions"):
        start = src.index(f"def {fn_name}")
        end = src.index("\ndef ", start + 1)
        exec(src[start:end], ns)  # noqa: S102 — test-only golden extraction

    rng = np.random.default_rng(0)
    cont = np.concatenate([
        np.ones(5), np.linspace(1, 0, 7), np.zeros(4), np.array([0.5, 0.4]),
        rng.uniform(0, 1, 6),
    ]).astype(np.float32)
    theirs = ns["binarize_gripper_actions"](tf.constant(cont)).numpy()
    np.testing.assert_allclose(binarize_gripper_actions(cont), theirs)

    rel = np.array([0, 0, 0.9, 0, 0, -0.8, 0, 0.5, 0, 0], np.float32)
    theirs = ns["rel2abs_gripper_actions"](tf.constant(rel)).numpy()
    np.testing.assert_allclose(rel2abs_gripper_actions(rel), theirs)

    rel_none = np.zeros(6, np.float32)
    theirs = ns["rel2abs_gripper_actions"](tf.constant(rel_none)).numpy()
    np.testing.assert_allclose(rel2abs_gripper_actions(rel_none), theirs)

    np.testing.assert_allclose(
        invert_gripper_actions(cont),
        ns["invert_gripper_actions"](tf.constant(cont)).numpy(),
    )


# ---------------------------------------------------------------------------
# Transform + collator
# ---------------------------------------------------------------------------


def _frame(cfg, rng):
    consts = cfg.constants
    return {
        "observation": {
            "image_primary": rng.integers(0, 255, size=(1, 64, 64, 3),
                                          dtype=np.uint8),
            "image_wrist": rng.integers(0, 255, size=(1, 64, 64, 3),
                                        dtype=np.uint8),
            "proprio": rng.normal(size=(1, consts.proprio_dim)).astype(np.float32),
        },
        "task": {"language_instruction": b"Pick Up The Cup"},
        "action": rng.uniform(-1, 1, size=(consts.num_actions_chunk,
                                           consts.action_dim)).astype(np.float32),
        "dataset_name": "dummy",
    }


def test_transform_and_collate():
    cfg = VLAConfig()
    tok = MockTokenizer()
    at = ActionTokenizer(len(tok))
    tr = VLABatchTransform(cfg, lambda t: tok(t).input_ids, at)
    rng = np.random.default_rng(0)
    exs = [tr(_frame(cfg, rng)) for _ in range(4)]

    e = exs[0]
    p = int(e["prompt_len"])
    assert e["input_ids"].shape == (cfg.max_text_tokens,)
    assert e["pixel_values"].shape == (2, 224, 224, 6)
    assert e["actions"].shape == (8, 7)
    assert e["proprio"].shape == (8,)
    # action ids occupy [p, p+64) and are action tokens
    assert (e["input_ids"][p : p + 64] > 151386).all()
    assert e["text_valid"][: p + 64].all() and not e["text_valid"][p + 64 :].any()
    # labels: IGNORE before p-1, values from p-1..p+64
    assert (e["labels"][: p - 1] == IGNORE_INDEX).all()
    assert (e["labels"][p - 1 : p + 64] == e["input_ids"][p - 1 : p + 64]).all()
    assert (e["labels"][p + 64 :] == IGNORE_INDEX).all()

    batch = collate(exs)
    assert batch["input_ids"].shape == (4, cfg.max_text_tokens)
    micro = collate(exs, accum_steps=2)
    assert micro["pixel_values"].shape == (2, 2, 2, 224, 224, 6)


def test_image_processor_strategies():
    """letterbox pads to square with gray fill; resize-crop center-crops;
    resize-naive squashes (the released configs' strategy)."""
    from PIL import Image

    from vla_adapter_tpu.data.image_processing import ImageProcessor, TowerSpec

    wide = np.zeros((40, 80, 3), np.uint8)
    wide[:, :, 0] = 200  # red-ish everywhere
    towers = (TowerSpec(size=32),)

    naive = ImageProcessor(towers, resize_strategy="resize-naive")(wide)
    assert naive.shape == (32, 32, 3)

    lb = ImageProcessor(towers, resize_strategy="letterbox")(wide)
    # top/bottom bands are letterbox fill (127 gray) after normalization
    fill_norm = (127 / 255 - 0.484375) / 0.228515625
    assert abs(float(lb[0, 16, 0]) - fill_norm) < 0.1
    # center row is image content, not fill
    assert abs(float(lb[16, 16, 0]) - fill_norm) > 0.5

    rc = ImageProcessor(towers, resize_strategy="resize-crop")(wide)
    assert rc.shape == (32, 32, 3)

    with pytest.raises(ValueError):
        ImageProcessor(towers, resize_strategy="bogus")(wide)


def test_profiling_steptimer_and_trace(tmp_path):
    from vla_adapter_tpu.utils.profiling import trace

    import jax
    import jax.numpy as jnp

    with trace(str(tmp_path), enabled=True):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert any(tmp_path.rglob("*.xplane.pb")), list(tmp_path.rglob("*"))


def test_inference_ids_layout():
    cfg = VLAConfig()
    tok = MockTokenizer()
    tr = VLABatchTransform(cfg, lambda t: tok(t).input_ids,
                           ActionTokenizer(len(tok)))
    ids, p, valid = tr.inference_ids("wipe the table")
    assert ids[p + 64] == 2  # STOP
    assert valid[: p + 65].all() and not valid[p + 65 :].any()
