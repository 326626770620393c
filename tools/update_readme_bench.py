"""Regenerate the performance tables from the newest BENCH_r*.json.

One source of truth: the driver's bench record. Hand-transcribing numbers
drifts (round 2's README shipped "850 actions/s" against a measured 872.6;
round 4's BASELINE.md still quoted BENCH_r02 two rounds later); this script
rewrites everything between the BENCH_TABLE markers in EVERY target file
(README.md and BASELINE.md) from the JSON instead. Run after every bench
round:

    python tools/update_readme_bench.py
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
START = "<!-- BENCH_TABLE_START -->"
END = "<!-- BENCH_TABLE_END -->"


def usable(rec: dict) -> bool:
    """True when a bench record carries renderable numbers.

    The driver logs a record even when bench.py fails (BENCH_r04: rc=124,
    "parsed": null) — those must not crash the renderer; fall back to the
    newest record whose parsed payload has a value. rc is deliberately NOT
    checked: a budget-truncated bench (bench.py BENCH_BUDGET_S) still
    prints a full JSON line with whatever phases completed."""
    parsed = rec.get("parsed")
    return (isinstance(parsed, dict) and parsed.get("value") is not None
            and isinstance(parsed.get("extra"), dict))


def latest_bench() -> dict:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        raise SystemExit("no BENCH_r*.json found")
    for path in reversed(paths):
        with open(path) as f:
            rec = json.load(f)
        if usable(rec):
            return rec, os.path.basename(path)
    raise SystemExit("no parseable BENCH_r*.json found (all records failed)")


def fmt_ms(s: float) -> str:
    return f"{s * 1e3:.1f} ms"


def render(rec: dict, src: str) -> str:
    x = rec["parsed"]["extra"]
    # Every row is optional: a budget-truncated bench (bench.py
    # BENCH_BUDGET_S, round 5) emits the record with whatever phases
    # completed — the renderer must show those rows and silently drop the
    # rest, never KeyError on a partial record.
    sweep = x.get("bf16_sweep") or []
    b1 = sweep[0] if sweep else None
    bmax = sweep[-1] if len(sweep) >= 2 else None
    w8_b1, w8_bmax, i8 = (x.get("w8a8_batch1"), x.get("w8a8"), x.get("int8"))
    # serving_auto (round 4+): the shipped batch-keyed default backend —
    # its rows lead the headline search so the README quotes what a user
    # of the defaults gets.
    auto = [r for r in x.get("serving_auto", {}).values()
            if r and "chunks_per_s" in r]
    # optional rows (added/removed over rounds); tolerate their absence AND
    # the {"error": ...} shape bench.py emits when a Pallas backend fails
    opt = [x.get(k) for k in (
        "w8a8_batch2", "w8a8_batch1_fused_mlp", "w8a8_batch2_fused_mlp",
        "w8a8_batch4_fused_mlp", "w8a8_batch1_pallas_mm",
        "w8a8_batch1_pallas_stacked")]
    opt = [r for r in opt if r and "chunks_per_s" in r]
    ref = x["baseline_chunks_per_s_h100"]

    # The headline is whatever the driver recorded as the top-level value —
    # find that row so the README never disagrees with the record (auto
    # rows first: on value ties the shipped default wins the label). Keep
    # this list in sync with bench.py's phase rows.
    candidates = [r for r in (*auto, w8_b1, w8_bmax, i8, *sweep, *opt) if r]
    head = next((r for r in candidates
                 if r["chunks_per_s"] == rec["parsed"]["value"]), None)
    assert head is not None, (
        "headline row not found in extra", rec["parsed"]["value"])
    head_label = (f"batch {head['batch']}"
                  + (f", {head['mode']}" if head.get("mode") else ", bf16"))

    rows = [
        (f"**8-action chunk throughput, {head_label} (driver headline)**",
         f"{ref:.1f} chunks/s",
         f"**{head['chunks_per_s']:.2f} chunks/s** "
         f"({head['chunks_per_s'] / ref:.2f}x, MFU-bf16 {head['mfu']:.2f}, "
         f"{fmt_ms(head['s_per_forward'] / head['batch'])}/chunk)"),
        ("action throughput (best)", "222 actions/s",
         f"**{head['actions_per_s']:.1f} actions/s/chip** "
         f"({head['actions_per_s'] / 222:.1f}x)"),
    ]
    if x.get("latency_s_batch1_default") is not None:
        rows.append(
            ("chunk latency, batch 1, shipped default (w8a8 auto)", "36 ms",
             f"**{fmt_ms(x['latency_s_batch1_default'])}** "
             f"({0.036 / x['latency_s_batch1_default']:.1f}x)"))
    if x.get("latency_s_batch1") is not None:
        rows.append(
            ("chunk latency, batch 1, bf16", "36 ms",
             f"**{fmt_ms(x['latency_s_batch1'])}** "
             f"({0.036 / x['latency_s_batch1']:.1f}x)"))
    if b1 is not None:
        rows.append(
            (f"chunk throughput, batch {b1['batch']}, bf16",
             f"{ref:.1f} chunks/s",
             f"**{b1['chunks_per_s']:.1f} chunks/s** (MFU {b1['mfu']:.2f})"))
    if bmax is not None:
        rows.append(
            (f"chunk throughput, batch {bmax['batch']}, bf16",
             "unsupported (batch-1 only)",
             f"**{bmax['chunks_per_s']:.1f} chunks/s** "
             f"(MFU {bmax['mfu']:.2f})"))
    if i8 is not None:
        rows.append(
            (f"chunk throughput, batch {i8['batch']}, int8 weights",
             "unsupported",
             f"**{i8['chunks_per_s']:.1f} chunks/s** (MFU {i8['mfu']:.2f})"))
    if w8_bmax is not None:
        rows.append(
            (f"chunk throughput, batch {w8_bmax['batch']}, w8a8 (int8 MXU)",
             "unsupported",
             f"**{w8_bmax['chunks_per_s']:.1f} chunks/s** "
             f"(MFU-bf16 {w8_bmax['mfu']:.2f})"))
    mode_label = {"w8a8": "w8a8",
                  "w8a8+fused_mlp": "w8a8 + fused-MLP Pallas kernel",
                  "w8a8+pallas_mm": "w8a8 + Pallas matmul",
                  "w8a8+pallas_stacked": "w8a8 + stacked Pallas matmul"}
    for r in opt:
        if r is head:
            continue  # already rendered as the headline row
        rows.append(
            (f"chunk throughput, batch {r['batch']}, "
             f"{mode_label.get(r.get('mode'), r.get('mode'))}",
             "unsupported",
             f"**{r['chunks_per_s']:.1f} chunks/s** "
             f"(MFU-bf16 {r['mfu']:.2f})"))
    if x.get("train_step_s_bs8_lora64") is not None:
        rows.append(
            ("LoRA train step, batch 8, one chip (bf16 base)",
             "n/a (DDP multi-GPU)",
             f"**{fmt_ms(x['train_step_s_bs8_lora64'])}**"))
    if x.get("train_step_s_bs8_lora64_int8base") is not None:
        rows.append(
            ("LoRA train step, batch 8, one chip (int8 frozen base — "
             "recipe default)", "n/a (DDP multi-GPU)",
             f"**{fmt_ms(x['train_step_s_bs8_lora64_int8base'])}**"))
    lines = [START,
             f"Generated from `{src}` by `tools/update_readme_bench.py` — "
             "do not edit by hand.", "",
             "| Metric | reference (H100) | this framework |", "|---|---|---|"]
    lines += [f"| {m} | {r} | {o} |" for m, r, o in rows]
    lines.append(END)
    return "\n".join(lines)


TARGET_FILES = ("README.md", "BASELINE.md")


def main() -> None:
    rec, src = latest_bench()
    block = render(rec, src)
    pattern = re.compile(re.escape(START) + ".*?" + re.escape(END), re.S)
    for name in TARGET_FILES:
        path = os.path.join(ROOT, name)
        with open(path) as f:
            text = f.read()
        if not pattern.search(text):
            raise SystemExit(f"{name} is missing the BENCH_TABLE markers")
        with open(path, "w") as f:
            f.write(pattern.sub(lambda _: block, text))
        print(f"{name} table regenerated from {src}")


if __name__ == "__main__":
    main()
