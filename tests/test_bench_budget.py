"""Budget-aware bench record assembly (fast tier).

VERDICT r4 item 1: BENCH_r04 timed out at the driver (rc=124) and lost
every number including the phases that HAD completed, because the old
bench printed its JSON line only after ALL phases. bench.py now runs
phases headline-first in bounded subprocesses and always assembles a
record from whatever finished. These tests drive the pure assembly
function with synthetic fragments — the full set, a budget-truncated set,
and the empty set — and check the README renderer accepts all three.
"""

import importlib.util
import json
import pathlib

import pytest

ROOT = pathlib.Path(__file__).parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load("bench", ROOT / "bench.py")


@pytest.fixture(scope="module")
def readme_tool():
    return _load("update_readme_bench", ROOT / "tools" / "update_readme_bench.py")


def _serve_frag(phase, batch, cps, mode=None):
    row = {"batch": batch, "s_per_forward": round(batch / cps, 6),
           "chunks_per_s": cps, "actions_per_s": cps * 8, "mfu": 0.8}
    if mode:
        row["mode"] = mode
    return {"phase": phase, "row": row, "overhead": 0.028,
            "flops_per_chunk_tf": 1.3352}


def _full_frags():
    return {
        "w8a8_fused_b1": _serve_frag("w8a8_fused_b1", 1, 118.0, "w8a8+fused_mlp"),
        "w8a8_b2": _serve_frag("w8a8_b2", 2, 129.0, "w8a8"),
        "w8a8_b1": _serve_frag("w8a8_b1", 1, 110.0, "w8a8"),
        "w8a8_fused_b2": _serve_frag("w8a8_fused_b2", 2, 122.0, "w8a8+fused_mlp"),
        "bf16_b1": _serve_frag("bf16_b1", 1, 81.0),
        "bf16_b16": _serve_frag("bf16_b16", 16, 84.0),
        "int8_b16": _serve_frag("int8_b16", 16, 86.0),
        "w8a8_b16": _serve_frag("w8a8_b16", 16, 106.0, "w8a8"),
        "w8a8_fused_b4": _serve_frag("w8a8_fused_b4", 4, 100.0, "w8a8+fused_mlp"),
        "train_bf16": {"phase": "train_bf16", "train_s": 0.356, "overhead": 0.028},
        "train_int8": {"phase": "train_int8", "train_s": 0.3246, "overhead": 0.028},
    }


def test_phase_registry_consistent(bench):
    """Every ordered phase must be runnable and every serving phase must
    have a landing key in extra (or be a bf16 sweep / train phase)."""
    keys = [k for k, _ in bench.PHASE_ORDER]
    assert len(keys) == len(set(keys))
    for k in keys:
        assert (k in bench.SERVE_PHASES) or k.startswith("train_") \
            or k == "research", k
    for k in bench.SERVE_PHASES:
        # every serving config is reachable: its own subprocess, or a row
        # of the grouped research tier (startup amortization, r5)
        assert k in keys or (k in bench.RESEARCH_KEYS and "research" in keys), \
            f"serving phase {k} unreachable from PHASE_ORDER"
        if not k.startswith("bf16_"):
            assert k in bench.SERVE_EXTRA_KEY, k
    assert not (set(bench.RESEARCH_KEYS) & set(keys))
    # headline phases lead: truncation must cost research rows, not the
    # shipped auto-backend rows (fused@b1, xla@b2) or the train defaults
    assert keys[:4] == ["w8a8_fused_b1", "w8a8_b2", "train_int8", "train_bf16"]


def test_assemble_full_record(bench, readme_tool):
    frags = _full_frags()
    log = [{"phase": k, "status": "done", "wall_s": 60.0} for k in frags]
    rec = bench.assemble_record(frags, log, 1500.0, 700.0)
    # headline = best auto-dispatch row (xla wins at b2 under the shipped
    # W8A8_FUSED_MAX_BATCH=1 crossover)
    assert rec["value"] == 129.0
    assert rec["extra"]["serving_auto"]["1"]["mode"] == "w8a8+auto(fused)"
    assert rec["extra"]["serving_auto"]["2"]["mode"] == "w8a8+auto(xla)"
    assert rec["extra"]["train_step_s_bs8_lora64"] == 0.356
    assert rec["extra"]["train_step_s_bs8_lora64_int8base"] == 0.3246
    assert rec["extra"]["latency_s_batch1"] == frags["bf16_b1"]["row"]["s_per_forward"]
    assert rec["extra"]["bf16_sweep"][0]["batch"] == 1
    assert rec["extra"]["bf16_sweep"][-1]["batch"] == 16
    assert "skipped" not in rec["extra"]
    assert rec["extra"]["dispatch_note"] is None
    json.dumps(rec)  # one-line emittable
    table = readme_tool.render({"n": 5, "rc": 0, "parsed": rec}, "BENCH_r05.json")
    assert "129.00 chunks/s" in table
    assert "int8 frozen base" in table


def test_assemble_truncated_record(bench, readme_tool):
    """Only the first phase completed: the record still carries the
    headline, lists the casualties, and renders."""
    frags = {"w8a8_fused_b1": _serve_frag(
        "w8a8_fused_b1", 1, 118.0, "w8a8+fused_mlp")}
    log = ([{"phase": "w8a8_fused_b1", "status": "done", "wall_s": 700.0},
            {"phase": "w8a8_b2", "status": "timeout", "wall_s": 780.0,
             "reason": "timeout after 780s"}]
           + [{"phase": k, "status": "skipped", "reason": "budget"}
              for k, _ in bench.PHASE_ORDER[2:]])
    rec = bench.assemble_record(frags, log, 1500.0, 1490.0)
    assert rec["value"] == 118.0
    assert rec["vs_baseline"] == pytest.approx(118.0 * 0.036, abs=0.001)
    assert len(rec["extra"]["skipped"]) == len(bench.PHASE_ORDER) - 1
    assert "skipped" in rec["unit"]
    wrapped = {"n": 5, "rc": 0, "parsed": rec}
    assert readme_tool.usable(wrapped)
    table = readme_tool.render(wrapped, "BENCH_r05.json")
    assert "118.00 chunks/s" in table


def test_assemble_empty_record(bench, readme_tool):
    """Nothing completed (wedged tunnel): emit a parsable failure record
    that the README tooling refuses to render from (falls back to the
    newest usable record instead of crashing — VERDICT r4 weak 2)."""
    log = [{"phase": k, "status": "skipped", "reason": "budget"}
           for k, _ in bench.PHASE_ORDER]
    rec = bench.assemble_record({}, log, 60.0, 61.0,
                                probe_error="tunnel down")
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "UNMEASURED" in rec["unit"]
    json.dumps(rec)
    assert not readme_tool.usable({"n": 5, "rc": 1, "parsed": rec})


def test_dispatch_note_flags_crossover_drift(bench):
    """A non-default backend beating the auto dispatch by >2% must be
    surfaced in the record, never crash the bench."""
    frags = {
        "w8a8_fused_b1": _serve_frag("w8a8_fused_b1", 1, 100.0, "w8a8+fused_mlp"),
        "w8a8_b1": _serve_frag("w8a8_b1", 1, 120.0, "w8a8"),
    }
    log = [{"phase": k, "status": "done", "wall_s": 60.0} for k in frags]
    rec = bench.assemble_record(frags, log, 1500.0, 200.0)
    # auto dispatches b1 to fused (100), but xla measured 120: drift
    assert rec["value"] == 100.0
    assert "W8A8_FUSED_MAX_BATCH" in rec["extra"]["dispatch_note"]


def test_merge_research_frag_partial(bench, readme_tool):
    """The grouped research tier (one subprocess for all RESEARCH_KEYS —
    backend init through the tunnel costs ~300 s/process, r5) unpacks
    into per-row fragments; failed rows annotate the log entry instead of
    killing the tier."""
    combined = {"phase": "research", "overhead": 0.028, "frags": {
        "bf16_b1": _serve_frag("bf16_b1", 1, 81.0),
        "w8a8_b16": {"phase": "w8a8_b16",
                     "error": "RuntimeError: RESOURCE_EXHAUSTED"},
        "int8_b16": None,
    }}
    frags = {"w8a8_fused_b1": _serve_frag(
        "w8a8_fused_b1", 1, 118.0, "w8a8+fused_mlp")}
    entry = {"phase": "research", "status": "done", "wall_s": 400.0}
    bench.merge_research_frag(combined, frags, entry)
    assert entry["status"] == "partial"
    assert entry["rows_done"] == ["bf16_b1"]
    assert set(entry["row_errors"]) == {"w8a8_b16", "int8_b16"}
    assert "bf16_b1" in frags and "w8a8_b16" not in frags
    rec = bench.assemble_record(
        frags, [entry], 1500.0, 900.0)
    assert rec["value"] == 118.0  # headline intact
    assert rec["extra"]["latency_s_batch1"] == \
        frags["bf16_b1"]["row"]["s_per_forward"]
    assert readme_tool.usable({"n": 5, "rc": 0, "parsed": rec})
