"""README performance-table integrity (fast tier).

VERDICT r3 weak item 2: the README perf block went a round stale because
regenerating it was a manual step. These tests make drift impossible —
the block must be byte-identical to what `tools/update_readme_bench.py`
renders from the newest checked-in `BENCH_r*.json`. If a new bench record
lands (the driver writes one at the end of every round), the fix is one
command: `python tools/update_readme_bench.py`.
"""

import importlib.util
import json
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).parent.parent


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "update_readme_bench", ROOT / "tools" / "update_readme_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", ["README.md", "BASELINE.md"])
def test_readme_bench_block_matches_newest_record(name):
    mod = _load_tool()
    assert name in mod.TARGET_FILES
    rec, src = mod.latest_bench()
    expected = mod.render(rec, src)
    text = (ROOT / name).read_text()
    m = re.search(re.escape(mod.START) + ".*?" + re.escape(mod.END), text,
                  re.S)
    assert m, f"{name} lost its BENCH_TABLE markers"
    assert m.group(0) == expected, (
        f"{name}'s performance table is stale vs {src} — run "
        "`python tools/update_readme_bench.py` to regenerate it")


def test_latest_bench_skips_failed_records(tmp_path, monkeypatch):
    """VERDICT r4 weak 2: the driver logs a record even when bench.py fails
    (BENCH_r04: rc=124, parsed null); latest_bench must fall back to the
    newest PARSEABLE record instead of crashing render with a TypeError."""
    mod = _load_tool()
    good = {"n": 3, "rc": 0,
            "parsed": {"value": 128.81, "extra": {"bf16_sweep": []}}}
    bad = {"n": 4, "rc": 124, "tail": "WARNING: ...", "parsed": None}
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(good))
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(bad))
    monkeypatch.setattr(mod, "ROOT", str(tmp_path))
    rec, src = mod.latest_bench()
    assert src == "BENCH_r03.json"
    assert rec["parsed"]["value"] == 128.81


def test_latest_bench_all_failed_raises(tmp_path, monkeypatch):
    mod = _load_tool()
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"rc": 124, "parsed": None}))
    monkeypatch.setattr(mod, "ROOT", str(tmp_path))
    with pytest.raises(SystemExit):
        mod.latest_bench()


def test_render_new_schema_headline_prefers_auto_row():
    """Round-4 bench schema: the serving_auto rows (the shipped batch-keyed
    default backend) win the headline label on value ties, and the
    default-serving batch-1 latency row is rendered."""
    mod = _load_tool()

    def row(batch, cps, mode=None):
        r = {"batch": batch, "chunks_per_s": cps, "actions_per_s": cps * 8,
             "mfu": 0.8, "s_per_forward": batch / cps}
        if mode:
            r["mode"] = mode
        return r

    extra = {
        "bf16_sweep": [row(1, 81.0), row(16, 84.0)],
        "int8": row(16, 86.0),
        "w8a8": row(16, 106.0, "w8a8"),
        "w8a8_batch1": row(1, 110.0, "w8a8"),
        "w8a8_batch2": row(2, 129.0, "w8a8"),
        "w8a8_batch1_fused_mlp": row(1, 117.0, "w8a8+fused_mlp"),
        "w8a8_batch2_fused_mlp": row(2, 123.0, "w8a8+fused_mlp"),
        # the error shape bench.py emits when a backend fails must not break
        "w8a8_batch4_fused_mlp": {"error": "RuntimeError(...)"},
        "serving_auto": {
            "1": row(1, 117.0, "w8a8+auto(fused)"),
            "2": row(2, 129.0, "w8a8+auto(xla)"),
            "16": row(16, 106.0, "w8a8+auto(xla)"),
        },
        "latency_s_batch1": 0.0123,
        "latency_s_batch1_default": 1 / 117.0,
        "train_step_s_bs8_lora64": 0.364,
        "baseline_chunks_per_s_h100": 27.78,
    }
    rec = {"parsed": {"value": 129.0, "extra": extra}}
    block = mod.render(rec, "BENCH_r04.json")
    # the auto row wins the headline label over the identical-value raw row
    assert "batch 2, w8a8+auto(xla) (driver headline)" in block
    assert "129.00 chunks/s" in block
    assert "shipped default (w8a8 auto)" in block
    assert "8.5 ms" in block  # 1/117 s default batch-1 latency
    assert "fused-MLP Pallas kernel" in block
