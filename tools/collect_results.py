"""Summarize completed chip-queue jobs into one results table.

Parses output/queue_logs/<job>.log for the lines every recipe prints
(bench JSON, ">>> ... test PSNR", "training wall-clock", part1 "Final
PSNR") and writes output/queue_logs/RESULTS_r4.md — a single place to
read whatever the queue managed to capture, even if a later outage
killed the rest. Idempotent; run any time.

Usage: python tools/collect_results.py
"""

import glob
import json
import os
import re

QL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "output", "queue_logs")

BENCH_RE = re.compile(r'^\{"metric".*\}$', re.M)
PSNR_RE = re.compile(r">>> (?:[\w -]*?)(?:test PSNR|Final PSNR|Eval PSNR)"
                     r"[: ]+([0-9.]+) dB", re.I)
WALL_RE = re.compile(r"training wall-clock (\d+:\d+\.?\d*)")
VAL_RE = re.compile(r"best val PSNR: ([0-9.]+) dB")


def main():
    rows = []
    for log in sorted(glob.glob(os.path.join(QL, "*.log"))):
        name = os.path.splitext(os.path.basename(log))[0]
        if name == "queue":
            continue
        status = ("done" if os.path.exists(os.path.join(QL, name + ".done"))
                  else "fail" if os.path.exists(os.path.join(QL, name + ".fail"))
                  else "partial")
        with open(log, encoding="utf-8", errors="replace") as f:
            text = f.read()
        cells = {"job": name, "status": status}
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
        rows.append(cells)

    cols = ["job", "status", "fps", "vs_baseline", "config",
            "test_psnr_db", "best_val_db", "wall", "note"]
    used = [c for c in cols if any(c in r for r in rows)]
    lines = ["# Round-4 chip-queue results", "",
             "| " + " | ".join(used) + " |",
             "|" + "---|" * len(used)]
    for r in rows:
        lines.append("| " + " | ".join(str(r.get(c, "")) for c in used)
                     + " |")
    out = os.path.join(QL, "RESULTS_r4.md")
    body = "\n".join(lines) + "\n"
    with open(out, "w", encoding="utf-8") as f:
        f.write(body)
    print(body)


if __name__ == "__main__":
    main()
