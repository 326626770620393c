"""VLM pretraining path: stages, chat datasets, PrismaticVLM, smoke run."""

import dataclasses
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_train_step import TINY_CFG
from vla_adapter_tpu.core.config import OptimizerConfig
from vla_adapter_tpu.core.constants import IGNORE_INDEX
from vla_adapter_tpu.data.chat import AlignDataset, FinetuneDataset
from vla_adapter_tpu.data.collator import collate
from vla_adapter_tpu.data.tokenization import MockTokenizer
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.models.vlm import PrismaticVLM
from vla_adapter_tpu.train.pretrain import PretrainConfig, pretrain
from vla_adapter_tpu.train.stages import split_by_stage

VLM_CFG = dataclasses.replace(
    TINY_CFG,
    vision=dataclasses.replace(TINY_CFG.vision, num_images=1),
    use_proprio=False,
    max_text_tokens=64,
)
RT = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla")


def _records(n=6, with_image=True):
    recs = []
    for i in range(n):
        recs.append({
            **({"image": f"img_{i}.png"} if with_image else {}),
            "conversations": [
                {"from": "human", "value": f"<image>\ndescribe scene {i}"},
                {"from": "gpt", "value": f"a robot arm near object {i}"},
            ],
        })
    return recs


class _FakeImageProcessor:
    def __call__(self, img):
        return np.zeros((28, 28, 3), np.float32)


@pytest.fixture
def datasets(tmp_path, monkeypatch):
    recs = _records()
    path = tmp_path / "chat.json"
    path.write_text(json.dumps(recs))
    tok = MockTokenizer()

    def patched_pixels(self, record):
        if "image" not in record:
            return None
        return np.zeros((1, 28, 28, 3), np.float32)

    monkeypatch.setattr(AlignDataset, "_pixels", patched_pixels)
    monkeypatch.setattr(FinetuneDataset, "_pixels", patched_pixels)
    tokenize = lambda t: tok(t).input_ids
    align = AlignDataset(str(path), tokenize, None, max_text_tokens=64,
                         eos_token_id=5)
    ft = FinetuneDataset(str(path), tokenize, None, max_text_tokens=64,
                         eos_token_id=5, prompt_family="qwen")
    return align, ft


def test_align_dataset_structure(datasets):
    align, _ = datasets
    ex = align[0]
    assert ex["input_ids"].shape == (64,)
    n = int(ex["text_valid"].sum())
    assert ex["input_ids"][n - 1] == 5  # eos appended
    # align: token 0 is the patch-splice anchor and is IGNOREd (reference
    # datasets.py:84-85); loss lands on the rest of the caption + eos
    assert ex["labels"][0] == IGNORE_INDEX
    assert (ex["labels"][1:n] == ex["input_ids"][1:n]).all()
    assert (ex["labels"][n:] == IGNORE_INDEX).all()
    assert ex["pixel_values"].shape == (1, 28, 28, 3)


def test_finetune_dataset_masks_human_turns(datasets):
    _, ft = datasets
    ex = ft[0]
    n = int(ex["text_valid"].sum())
    lab = ex["labels"][:n]
    assert (lab == IGNORE_INDEX).any()      # human/system masked
    assert (lab != IGNORE_INDEX).any()      # gpt turn supervised
    assert (ex["labels"][n:] == IGNORE_INDEX).all()


def test_stage_splits():
    model = PrismaticVLM(VLM_CFG, RT)
    params = model.init(
        jax.random.key(0),
        input_ids=jnp.zeros((1, 64), jnp.int32),
        text_valid=jnp.ones((1, 64), jnp.int32),
        pixel_values=jnp.zeros((1, 1, 28, 28, 3), jnp.float32),
    )["params"]

    t_align, f_align = split_by_stage(params, "align")
    assert set(t_align.keys()) == {"projector"}
    t_ft, _ = split_by_stage(params, "finetune")
    assert set(t_ft.keys()) == {"projector", "language_model"}
    t_full, f_full = split_by_stage(params, "full-finetune")
    assert f_full == {}
    with pytest.raises(ValueError):
        split_by_stage(params, "bogus")


def test_pretrain_smoke_align_stage(datasets):
    align, _ = datasets
    cfg = PretrainConfig(
        model=VLM_CFG, stage="align", batch_size=2,
        optim=OptimizerConfig(learning_rate=3e-3, max_steps=5,
                              num_steps_before_decay=100),
        max_text_tokens=64,
    )

    def batches():
        rng = np.random.default_rng(0)
        while True:
            idx = rng.integers(0, len(align), size=2)
            yield collate([align[int(i)] for i in idx])

    it = batches()
    first = next(it)
    model = PrismaticVLM(VLM_CFG, RT)
    params = model.init(
        jax.random.key(0),
        input_ids=jnp.asarray(first["input_ids"]),
        text_valid=jnp.asarray(first["text_valid"]),
        pixel_values=jnp.asarray(first["pixel_values"]),
        labels=jnp.asarray(first["labels"]),
    )["params"]
    out0 = model.apply(
        {"params": params},
        input_ids=jnp.asarray(first["input_ids"]),
        text_valid=jnp.asarray(first["text_valid"]),
        pixel_values=jnp.asarray(first["pixel_values"]),
        labels=jnp.asarray(first["labels"]),
    )
    loss0 = float(out0["loss"])

    merged, metrics = pretrain(cfg, batches(), max_steps=4, rt=RT)
    assert np.isfinite(metrics["loss"])
    assert metrics["loss"] < loss0  # projector-only training reduces CE


def test_vlm_unimodal_forward():
    model = PrismaticVLM(VLM_CFG, RT)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 500, (2, 16)))
    valid = jnp.ones((2, 16), jnp.int32)
    params = model.init(jax.random.key(0), input_ids=ids, text_valid=valid)["params"]
    out = model.apply({"params": params}, input_ids=ids, text_valid=valid)
    assert out["logits"].shape == (2, 16, VLM_CFG.llm.vocab_size)


def test_last_layer_finetune_updates_only_last_layer():
    """Reference semantics (qwen25.py:84-86 + vlms/prismatic.py:190-203):
    last-layer-finetune trains exactly embed_tokens + layers[-1] (+ tied lm
    head); the projector, vision tower, final norm, and layers[:-1] must not
    move. The scanned stack is gated by stage_update_mask."""
    import optax

    from vla_adapter_tpu.train.optim import mask_updates
    from vla_adapter_tpu.train.stages import stage_update_mask

    model = PrismaticVLM(VLM_CFG, RT)
    batch = {
        "input_ids": jnp.asarray(
            np.random.default_rng(0).integers(3, 100, size=(2, 64)), jnp.int32),
        "text_valid": jnp.ones((2, 64), jnp.int32),
        "pixel_values": jnp.zeros((2, 1, 28, 28, 3), jnp.float32),
        "labels": jnp.asarray(
            np.random.default_rng(1).integers(3, 100, size=(2, 64)), jnp.int32),
    }
    params = model.init(
        jax.random.key(0),
        input_ids=batch["input_ids"], text_valid=batch["text_valid"],
        pixel_values=batch["pixel_values"], labels=batch["labels"],
    )["params"]

    trainable, frozen = split_by_stage(params, "last-layer-finetune")
    assert set(trainable.keys()) == {"language_model"}
    assert set(trainable["language_model"].keys()) == {"embed", "layers"}
    assert "norm" in frozen["language_model"]  # final norm stays frozen
    assert "projector" in frozen

    tx = mask_updates(optax.sgd(1e-2), stage_update_mask(
        trainable, "last-layer-finetune"))
    opt_state = tx.init(trainable)

    from vla_adapter_tpu.train.partition import merge_trees

    def loss_fn(t):
        out = model.apply(
            {"params": merge_trees(t, frozen)},
            input_ids=batch["input_ids"], text_valid=batch["text_valid"],
            pixel_values=batch["pixel_values"], labels=batch["labels"],
        )
        return out["loss"]

    grads = jax.grad(loss_fn)(trainable)
    updates, _ = tx.update(grads, opt_state, trainable)
    new = optax.apply_updates(trainable, updates)

    # embed moved
    emb_delta = np.abs(np.asarray(
        new["language_model"]["embed"]["embedding"]
        - trainable["language_model"]["embed"]["embedding"]))
    assert emb_delta.max() > 0

    # every stacked layer leaf: last slice moved, earlier slices bit-frozen
    moved_any_last = False
    for path, leaf in jax.tree_util.tree_flatten_with_path(
            trainable["language_model"]["layers"])[0]:
        new_leaf = leaf
        node = new["language_model"]["layers"]
        for k in path:
            node = node[k.key]
        new_leaf = np.asarray(node)
        old_leaf = np.asarray(leaf)
        np.testing.assert_array_equal(new_leaf[:-1], old_leaf[:-1],
                                      err_msg=str(path))
        if np.abs(new_leaf[-1] - old_leaf[-1]).max() > 0:
            moved_any_last = True
    assert moved_any_last


# --- LRV / LVIS-Instruct-4V merge builders ----------------------------------
# (reference scripts/additional-datasets/{lrv_instruct,lvis_instruct_4v}.py)


def _stage_instruct_fixtures(base_dir):
    """Synthetic raw inputs for both builders, with real image files so the
    existence verification runs."""
    base_dir.mkdir(parents=True, exist_ok=True)
    (base_dir / "coco").mkdir()
    lrv = base_dir / "lrv"
    (lrv / "lrv-vg").mkdir(parents=True)
    (lrv / "lrv-chart").mkdir()

    mix665k = _records(4)
    for i, r in enumerate(mix665k):
        r["image"] = f"coco/base_{i}.jpg"
        (base_dir / r["image"]).write_bytes(b"jpg")
    (base_dir / "llava_v1_5_mix665k.json").write_text(json.dumps(mix665k))

    lvis = _records(3)
    for i, r in enumerate(lvis):
        r["image"] = f"coco/lvis_{i}.jpg"
        (base_dir / r["image"]).write_bytes(b"jpg")
    (base_dir / "lvis_instruct4v_220k.json").write_text(json.dumps(lvis))

    vg1 = [{"image_id": "10", "question": " What is red? ",
            "answer": " The block. "}]
    vg2 = [{"image_id": "11", "question": "Any chart?", "answer": "No."}]
    chart = [{"image_id": "c0.png", "question": "Trend?", "answer": "Up."}]
    (lrv / "filter_cap1.json").write_text(json.dumps(vg1))
    (lrv / "filter_cap_more1.json").write_text(json.dumps(vg2))
    (lrv / "chart_release_update.json").write_text(json.dumps(chart))
    for fn in ("lrv-vg/10.jpg", "lrv-vg/11.jpg", "lrv-chart/c0.png"):
        (lrv / fn).write_bytes(b"img")
    return mix665k, lvis


def test_instruct_merge_builders_end_to_end(tmp_path, monkeypatch):
    """Both builders produce LLaVA-chat JSONs that FinetuneDataset resolves
    end-to-end (the llava-lvis4v-lrv mixture path, models/zoo.py:112-114)."""
    from vla_adapter_tpu.data.vlm_datasets import (
        build_lrv_instruct,
        build_lvis_instruct_4v,
        lrv_to_llava_chat,
    )

    base = tmp_path / "llava-v1.5-instruct"
    _stage_instruct_fixtures(base)

    out_lvis = build_lvis_instruct_4v(base)
    out_lrv, out_full = build_lrv_instruct(base)
    assert out_lvis.name == "llava_v1_5_lvis4v_mix888k.json"
    assert out_full.name == "llava_v1_5_lvis4v_lrv_mix1231k.json"

    merged = json.loads(out_full.read_text())
    assert len(merged) == 4 + 3 + 3  # base + lvis + lrv(2 vg + 1 chart)
    # LRV conversion facts: path layout + <image>\n prompt + stripping
    lrv_entries = {e["id"]: e for e in merged if str(e.get("image", ""))
                   .startswith("lrv/")}
    assert set(lrv_entries) == {"10", "11", "c0"}
    assert lrv_entries["10"]["image"] == "lrv/lrv-vg/10.jpg"
    assert lrv_entries["c0"]["image"] == "lrv/lrv-chart/c0.png"
    assert lrv_entries["10"]["conversations"][0]["value"] == (
        "<image>\nWhat is red?")
    assert lrv_entries["10"]["conversations"][1]["value"] == "The block."

    # deterministic: reference seeds random(7) and triple-shuffles, so two
    # runs produce byte-identical files
    first = out_full.read_bytes()
    build_lrv_instruct(base)
    assert out_full.read_bytes() == first

    # missing image -> builder refuses (the reference asserts per example)
    (base / "lrv/lrv-vg/10.jpg").unlink()
    with pytest.raises(AssertionError, match="missing"):
        build_lrv_instruct(base)

    # standalone `--build lrv` (no lvis4v build first): the 888k base is
    # absent, so the builder produces just the 1008k mix instead of dying
    # with FileNotFoundError after writing it
    solo = tmp_path / "solo-instruct"
    _stage_instruct_fixtures(solo)
    outs = build_lrv_instruct(solo)
    assert [o.name for o in outs] == ["llava_v1_5_lrv_mix1008k.json"]

    # the merged JSON drives FinetuneDataset end-to-end
    monkeypatch.setattr(FinetuneDataset, "_pixels",
                        lambda self, r: np.zeros((28, 28, 3), np.float32))
    tok = MockTokenizer()
    ft = FinetuneDataset(str(out_full), lambda t: tok(t).input_ids, None,
                         max_text_tokens=64, eos_token_id=5,
                         prompt_family="qwen")
    assert len(ft) == 10
    ex = ft[0]
    assert ex["input_ids"].shape == (64,)
