"""Validation wiring, frozen-bf16, batching sampler, VQ stub, profiling."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # train-step compiles dominate

import jax
import jax.numpy as jnp

from tests.test_train_step import TINY_CFG
from vla_adapter_tpu.core.config import OptimizerConfig, TrainConfig
from vla_adapter_tpu.data.action_tokenizer import VQActionTokenizer
from vla_adapter_tpu.data.batching import SplitModalitySampler
from vla_adapter_tpu.models.layers import Runtime
from vla_adapter_tpu.utils.profiling import StepTimer


def test_finetune_with_validation_and_frozen_bf16(tmp_path):
    from vla_adapter_tpu.data.dummy import DummyDataset
    from vla_adapter_tpu.train.loop import finetune

    cfg = TrainConfig(
        model=TINY_CFG,
        optim=OptimizerConfig(learning_rate=1e-3, max_steps=3,
                              num_steps_before_decay=100),
        batch_size=2, data_axis=1, run_root_dir=str(tmp_path),
        save_freq=100, log_freq=1, val_freq=2, remat_llm=False,
        frozen_bf16=True,
    )
    rt = Runtime(dtype=jnp.float32, param_dtype=jnp.float32, attn_impl="xla",
                 lora_rank=2, lora_scale=2.0)
    val_iter = iter(DummyDataset(TINY_CFG, 2, seed=99))
    state = finetune(cfg, rt=rt, val_iter=val_iter, val_batches=2)
    # frozen params were cast
    leaf = jax.tree.leaves(state.frozen)[0]
    assert leaf.dtype == jnp.bfloat16
    # validation metrics landed in the jsonl
    run_dir = next(tmp_path.iterdir())
    rows = [json.loads(l) for l in
            (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(any(k.startswith("val_") for k in r) for r in rows)


def test_split_modality_sampler():
    rng = np.random.default_rng(0)
    mm = rng.random(100) < 0.6
    lengths = rng.integers(5, 200, size=100)
    s = SplitModalitySampler(mm, lengths, batch_size=8, seed=0)
    batches = list(s)
    assert len(batches) == len(s)
    for b in batches:
        assert len(b) == 8
        assert len(set(mm[b])) == 1  # single modality per batch
    # epochs reshuffle
    s.set_epoch(1)
    batches2 = list(s)
    assert any(not np.array_equal(a, b) for a, b in zip(batches, batches2))


def test_vq_action_tokenizer_stub():
    class FakeVQ:
        def get_code(self, actions):
            return np.arange(actions.shape[1] * 0 + 4)[None] % 256

        def draw_code_forward(self, codes):
            return np.ones((1, 8, 7)) * codes[0, 0]

    at = VQActionTokenizer(151921, FakeVQ())
    ids = at.encode_to_ids(np.zeros((8, 7)))
    assert (ids > 151386).all()
    back = at.decode_token_ids_to_actions(ids)
    assert back.shape == (8, 7)


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(4):
        with t:
            time.sleep(0.01)
    s = t.summary()
    assert s["steps"] == 3 and 0.005 < s["median_s"] < 0.1


def test_vlm_dataset_prepare_offline(tmp_path):
    """Registry + extract + rename + jpg-conversion paths, no network:
    pre-stage a component archive exactly where download_file would put it
    and drive download_extract / convert_images_to_jpg over it."""
    import json
    import zipfile

    import numpy as np
    from PIL import Image

    from vla_adapter_tpu.data.vlm_datasets import (
        DATASET_REGISTRY,
        convert_images_to_jpg,
        download_extract,
        extract_archive,
    )

    # registry sanity: unique names, https/http urls, both reference stages
    # plus the instruct-tuning extras (lrv/lvis4v — reference
    # scripts/additional-datasets/)
    assert set(DATASET_REGISTRY) >= {"llava-laion-cc-sbu-558k",
                                     "llava-v1.5-instruct",
                                     "lrv-instruct", "lvis-instruct-4v"}
    for comps in DATASET_REGISTRY.values():
        names = [c["name"] for c in comps]
        assert len(names) == len(set(names))
        # lrv-instruct ships via Google Drive file ids (reference
        # scripts/additional-datasets/lrv_instruct.py uses gdown)
        assert all(c["url"].startswith(("http://", "https://", "gdrive:"))
                   for c in comps)

    # stage the align dataset offline: chat json (pre-renamed) + images.zip
    ddir = tmp_path / "download" / "llava-laion-cc-sbu-558k"
    ddir.mkdir(parents=True)
    (ddir / "chat.json").write_text(json.dumps([{"id": "0"}]))
    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            src / f"{i}.jpg")
    with zipfile.ZipFile(ddir / "images.zip", "w") as zf:
        for p in sorted(src.iterdir()):
            zf.write(p, f"images/{p.name}")

    out = download_extract("llava-laion-cc-sbu-558k", tmp_path)
    assert (out / "chat.json").exists()
    assert sorted(p.name for p in (out / "images").iterdir()) == [
        "0.jpg", "1.jpg", "2.jpg"]

    # conversion: png + gif + existing jpg -> exactly two new jpgs
    conv = tmp_path / "ocr"
    conv.mkdir()
    arr = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    Image.fromarray(arr).save(conv / "a.png")
    Image.fromarray(arr).save(conv / "b.gif")
    Image.fromarray(arr).save(conv / "c.jpg")
    assert convert_images_to_jpg(conv) == 2
    assert {p.name for p in conv.iterdir()} >= {"a.jpg", "b.jpg", "c.jpg"}

    # tar path of extract_archive
    import tarfile
    tdir = tmp_path / "tarred"
    tdir.mkdir()
    with tarfile.open(tdir / "x.tar.gz", "w:gz") as tf:
        tf.add(src, arcname="imgs")
    top = extract_archive(tdir / "x.tar.gz", tdir)
    assert top.name == "imgs" and len(list(top.iterdir())) == 3


def test_update_readme_bench_render_covers_every_bench_row():
    """The README regenerator's headline-candidate list must stay in sync
    with bench.py's rows — regression for the round-3 review finding where
    a w8a8_batch2 headline (the measured per-chip peak) asserted out."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "update_readme_bench",
        pathlib.Path(__file__).parent.parent / "tools" /
        "update_readme_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def row(batch, cps, mode=None):
        r = {"batch": batch, "chunks_per_s": cps, "actions_per_s": cps * 8,
             "mfu": 0.7, "s_per_forward": batch / cps}
        if mode:
            r["mode"] = mode
        return r

    extra = {
        "bf16_sweep": [row(1, 80.0), row(16, 84.0)],
        "int8": row(16, 86.0),
        "w8a8": row(16, 104.0, "w8a8"),
        "w8a8_batch1": row(1, 107.0, "w8a8"),
        "w8a8_batch2": row(2, 110.1, "w8a8"),
        "w8a8_batch1_pallas_mm": row(1, 95.0, "w8a8+pallas_mm"),
        # the error shape bench.py emits when a backend fails must not break
        "w8a8_batch1_pallas_stacked": {"error": "RuntimeError(...)"},
        "latency_s_batch1": 0.0125,
        "train_step_s_bs8_lora64": 0.364,
        "baseline_chunks_per_s_h100": 27.78,
    }
    rec = {"parsed": {"value": 110.1, "extra": extra}}
    block = mod.render(rec, "BENCH_r03.json")
    assert "batch 2, w8a8 (driver headline)" in block
    assert "110.10 chunks/s" in block
    # non-headline optional rows are rendered too
    assert "w8a8 + Pallas matmul" in block
