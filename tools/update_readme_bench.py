"""Regenerate README.md's performance table from the newest BENCH_r*.json.

One source of truth: the driver's bench record. Hand-transcribing numbers
into the README drifts (round 2 shipped "850 actions/s" against a measured
872.6); this script rewrites everything between the BENCH_TABLE markers
from the JSON instead. Run after every bench round:

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


def latest_bench() -> dict:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        raise SystemExit("no BENCH_r*.json found")
    with open(paths[-1]) as f:
        rec = json.load(f)
    return rec, os.path.basename(paths[-1])


def fmt_ms(s: float) -> str:
    return f"{s * 1e3:.1f} ms"


def render(rec: dict, src: str) -> str:
    x = rec["parsed"]["extra"]
    b1, b16 = x["bf16_sweep"][0], x["bf16_sweep"][-1]
    w8_b1, w8_b16, i8 = x["w8a8_batch1"], x["w8a8"], x["int8"]
    ref = x["baseline_chunks_per_s_h100"]
    rows = [
        ("**8-action chunk throughput, batch 1, w8a8 (driver headline)**",
         f"{ref:.1f} chunks/s",
         f"**{w8_b1['chunks_per_s']:.2f} chunks/s** "
         f"({w8_b1['chunks_per_s'] / ref:.2f}x, MFU-bf16 {w8_b1['mfu']:.2f}, "
         f"{fmt_ms(w8_b1['s_per_forward'])}/chunk)"),
        ("action throughput (best)", "222 actions/s",
         f"**{w8_b1['actions_per_s']:.1f} actions/s/chip** "
         f"({w8_b1['actions_per_s'] / 222:.1f}x)"),
        ("chunk latency, batch 1, bf16", "36 ms",
         f"**{fmt_ms(x['latency_s_batch1'])}** "
         f"({0.036 / x['latency_s_batch1']:.1f}x)"),
        ("chunk throughput, batch 1, bf16", f"{ref:.1f} chunks/s",
         f"**{b1['chunks_per_s']:.1f} chunks/s** (MFU {b1['mfu']:.2f})"),
        ("chunk throughput, batch 16, bf16", "unsupported (batch-1 only)",
         f"**{b16['chunks_per_s']:.1f} chunks/s** (MFU {b16['mfu']:.2f})"),
        ("chunk throughput, batch 16, int8 weights", "unsupported",
         f"**{i8['chunks_per_s']:.1f} chunks/s** (MFU {i8['mfu']:.2f})"),
        ("chunk throughput, batch 16, w8a8 (int8 MXU)", "unsupported",
         f"**{w8_b16['chunks_per_s']:.1f} chunks/s** "
         f"(MFU-bf16 {w8_b16['mfu']:.2f})"),
        ("LoRA train step, batch 8, one chip", "n/a (DDP multi-GPU)",
         f"**{fmt_ms(x['train_step_s_bs8_lora64'])}**"),
    ]
    lines = [START,
             f"Generated from `{src}` by `tools/update_readme_bench.py` — "
             "do not edit by hand.", "",
             "| Metric | reference (H100) | this framework |", "|---|---|---|"]
    lines += [f"| {m} | {r} | {o} |" for m, r, o in rows]
    lines.append(END)
    return "\n".join(lines)


def main() -> None:
    rec, src = latest_bench()
    path = os.path.join(ROOT, "README.md")
    with open(path) as f:
        text = f.read()
    block = render(rec, src)
    pattern = re.compile(re.escape(START) + ".*?" + re.escape(END), re.S)
    if not pattern.search(text):
        raise SystemExit("README.md is missing the BENCH_TABLE markers")
    with open(path, "w") as f:
        f.write(pattern.sub(lambda _: block, text))
    print(f"README.md table regenerated from {src}")


if __name__ == "__main__":
    main()
