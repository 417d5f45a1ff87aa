"""Summarize every captured result — chip queue AND CPU hedges — into one table.

Round 4's lesson: the chip queue produced nothing (tunnel down all round)
and the collector only swept output/queue_logs, so RESULTS_r4.md was an
empty table even though the CPU hedge directories held real numbers
(VERDICT r4 weak item 2). This version sweeps every evidence directory,
tags each row with its source (chip vs cpu), and writes
output/queue_logs/RESULTS_r5.md — a single place to read whatever the
round managed to capture. Idempotent; run any time.

Parsed lines (all printed by the recipes themselves): bench JSON,
">>> ... test PSNR", "training wall-clock", part1 "Final PSNR",
"best val PSNR".

Usage: python tools/collect_results.py
"""

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QL = os.path.join(ROOT, "output", "queue_logs")

# (directory, source tag). queue_logs holds chip-queue jobs; the rest are
# the CPU-hedge evidence trees (dead-tunnel insurance).
SWEEP = [
    (QL, "chip"),
    (os.path.join(ROOT, "output", "cpu_hedge"), "cpu"),
    (os.path.join(ROOT, "output", "ab_cpu"), "cpu"),
    (os.path.join(ROOT, "output", "part1_cpu"), "cpu"),
]

BENCH_RE = re.compile(r'^\{"metric".*\}$', re.M)
PSNR_RE = re.compile(r">>> .*?(?:test PSNR|Final PSNR|Eval PSNR)"
                     r"[: ]+([0-9.]+) dB", re.I)
WALL_RE = re.compile(r"training wall-clock (\d+:\d+\.?\d*)")
VAL_RE = re.compile(r"best val PSNR: ([0-9.]+) dB")


def parse_log(log: str, src: str) -> dict:
    name = os.path.splitext(os.path.basename(log))[0]
    d = os.path.dirname(log)
    status = ("done" if os.path.exists(os.path.join(d, name + ".done"))
              else "fail" if os.path.exists(os.path.join(d, name + ".fail"))
              else "partial")
    with open(log, encoding="utf-8", errors="replace") as f:
        text = f.read()
    cells = {"job": name, "src": src, "status": status}
    m = BENCH_RE.findall(text)
    if m:
        try:
            j = json.loads(m[-1])
            cells["fps"] = f"{j.get('value', 0):.3f}"
            cells["vs_baseline"] = f"{j.get('vs_baseline', 0):.3f}"
            if "config" in j:
                cells["config"] = j["config"]
            if "error" in j:
                cells["note"] = j["error"][:60]
        except json.JSONDecodeError:
            pass
    m = PSNR_RE.findall(text)
    if m:
        cells["test_psnr_db"] = m[-1]
    m = WALL_RE.findall(text)
    if m:
        cells["wall"] = m[-1]
    m = VAL_RE.findall(text)
    if m:
        cells["best_val_db"] = m[-1]
    # Arms run outside a marker-writing queue (e.g. the round-4 ab_cpu
    # logs) have no .done file; a parsed final test PSNR means the run
    # reached its last line.
    if cells["status"] == "partial" and "test_psnr_db" in cells:
        cells["status"] = "done*"
    return cells


def main():
    rows = []
    for d, src in SWEEP:
        for log in sorted(glob.glob(os.path.join(d, "*.log"))):
            if os.path.basename(log) in ("queue.log", "queue_r4.log",
                                         "queue_r5.log"):
                continue
            rows.append(parse_log(log, src))

    cols = ["job", "src", "status", "fps", "vs_baseline", "config",
            "test_psnr_db", "best_val_db", "wall", "note"]
    used = [c for c in cols if any(c in r for r in rows)]
    lines = ["# Round-5 results (chip queue + CPU hedges)", "",
             "Sources: `chip` = output/queue_logs (TPU jobs), `cpu` = the "
             "dead-tunnel hedge trees (output/cpu_hedge, output/ab_cpu, "
             "output/part1_cpu).", "",
             "| " + " | ".join(used) + " |",
             "|" + "---|" * len(used)]
    for r in rows:
        lines.append("| " + " | ".join(str(r.get(c, "")) for c in used)
                     + " |")
    out = os.path.join(QL, "RESULTS_r5.md")
    body = "\n".join(lines) + "\n"
    with open(out, "w", encoding="utf-8") as f:
        f.write(body)
    print(body)


if __name__ == "__main__":
    main()
