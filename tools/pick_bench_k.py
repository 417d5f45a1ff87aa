"""Pick the shipped bench (k_coarse, k_fine) from measured evidence.

Inputs (produced by tools/chip_queue.sh on the real chip):
  * output/queue_logs/bench_*.log — driver-grade FPS per sweep point
    (the one JSON line each bench job prints);
  * output/queue_logs/quality_block.log — dense-test PSNR per block-
    renderer sweep point on the same trained artifact
    ("block 256^3, k=A+B   PSNR X dB" rows from tools/quality_ab.py).

Decision rule (ROADMAP P0 / VERDICT r3 item 1): among sweep points with
BOTH a measured FPS and a measured PSNR, pick the highest FPS whose PSNR
is within 0.3 dB of the 26.18 dB dense masked baseline (>= 25.88). Ties
break toward higher PSNR. Writes output/bench_defaults.json, which
bench.py reads when BENCH_K1/K2 are not set — so the driver's final
bench.py run measures the chosen configuration automatically.

Never degrades silently: if no point beats the current default's FPS
while holding the quality bar, the defaults file is left untouched.

Usage: python tools/pick_bench_k.py
"""

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QL = os.path.join(ROOT, "output", "queue_logs")
OUT = os.path.join(ROOT, "output", "bench_defaults.json")

PSNR_BAR = 25.88          # 26.18 dense baseline - 0.3 dB fallback rule
CODE_DEFAULT = (32, 12)   # bench.py's in-code default

# Which (k1, k2) each queue bench job measured.
BENCH_JOB_KS = {
    "bench_base": CODE_DEFAULT,
    "bench_k24_8": (24, 8),
    "bench_k28_8": (28, 8),
    "bench_k24_12": (24, 12),
}

QUALITY_RE = re.compile(
    r"block \d+\^3, k=(\d+)\+(\d+)\s+PSNR\s+([0-9.]+) dB")


def read_fps(log_path):
    try:
        with open(log_path, encoding="utf-8", errors="replace") as f:
            text = f.read()
    except OSError:
        return None
    for line in reversed(text.splitlines()):
        if line.startswith('{"metric"'):
            try:
                j = json.loads(line)
            except json.JSONDecodeError:
                return None
            if "error" in j:
                return None
            return float(j["value"])
    return None


def main():
    fps_by_k = {}
    for job, ks in BENCH_JOB_KS.items():
        fps = read_fps(os.path.join(QL, job + ".log"))
        if fps:
            fps_by_k[ks] = max(fps, fps_by_k.get(ks, 0.0))

    psnr_by_k = {}
    qlog = os.path.join(QL, "quality_block.log")
    if os.path.exists(qlog):
        with open(qlog, encoding="utf-8", errors="replace") as f:
            for m in QUALITY_RE.finditer(f.read()):
                psnr_by_k[(int(m.group(1)), int(m.group(2)))] = \
                    float(m.group(3))

    candidates = []
    for ks, fps in fps_by_k.items():
        psnr = psnr_by_k.get(ks)
        if psnr is None:
            print(f"k={ks}: FPS {fps:.3f} but no PSNR row; skipped")
            continue
        ok = psnr >= PSNR_BAR
        print(f"k={ks}: FPS {fps:.3f}, PSNR {psnr:.2f} dB "
              f"({'ok' if ok else 'below bar'})")
        if ok:
            candidates.append((fps, psnr, ks))

    if not candidates:
        print("no candidate holds the quality bar; defaults unchanged")
        return

    base_fps = fps_by_k.get(CODE_DEFAULT, 0.0)
    fps, psnr, ks = max(candidates)
    if ks != CODE_DEFAULT and fps <= base_fps:
        print(f"best candidate k={ks} ({fps:.3f} FPS) does not beat the "
              f"default's {base_fps:.3f} FPS; defaults unchanged")
        return

    with open(OUT, "w") as f:
        json.dump({"k1": ks[0], "k2": ks[1], "fps": fps, "psnr": psnr,
                   "rule": f"max FPS with PSNR >= {PSNR_BAR}"}, f)
        f.write("\n")
    print(f"picked k={ks[0]}+{ks[1]}: {fps:.3f} FPS at {psnr:.2f} dB "
          f"-> {OUT}")


if __name__ == "__main__":
    main()
