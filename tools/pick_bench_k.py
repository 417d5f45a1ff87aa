"""Pick the shipped bench (checkpoint, k_coarse, k_fine) from evidence.

Inputs (produced by tools/chip_queue.sh on the real chip):
  * output/queue_logs/bench_*.log — driver-grade FPS per sweep point
    (the one JSON line each bench job prints). FPS is measured through
    the BAKED block renderer, so it is checkpoint-independent to first
    order (the bake erases the hash layout; only occupancy differs).
  * output/queue_logs/quality_block.log — dense-test PSNR per block
    sweep point on the round-3 brick checkpoint;
  * output/queue_logs/quality_block_exact.log — same rows measured on
    the round-5 exact-layout checkpoint (the quality candidate: the CPU
    layout ladder has exact +3.2 dB over brick at equal params).

Decision rule (ROADMAP P0 / VERDICT r3 item 1): among (ckpt, k) pairs
with BOTH a measured FPS and a measured PSNR, pick the highest FPS whose
PSNR holds the quality bar. The bar is SAME-PATH: the best PSNR measured
through the block render path anywhere in the sweep, minus the 0.3 dB
fallback allowance (VERDICT r3's quality-fallback rule). The original
fixed bar (25.88 = 26.18 dense baseline - 0.3) compared block-path
renders against the dense eval path, which the block renderer
structurally undercuts by ~0.4 dB at every k — including the shipped
default (25.75 at k=32+12) — so no configuration could ever be picked;
measured round-5 rows: k=24+8 25.50 / 11.36 FPS vs k=32+12 25.75 /
7.64 FPS. Within the same path, trading 0.25 dB for +49% FPS is the
documented fallback rule applied honestly. Ties break toward higher
PSNR. Writes
output/bench_defaults.json {k1, k2, ckpt, fps, psnr}; bench.py reads it
when BENCH_K1/K2/BENCH_CKPT are not set — so the driver's final bench.py
run measures the chosen configuration automatically.

Never degrades silently: if no point beats the current default's FPS
while holding the quality bar, the defaults file is left untouched.

Usage: python tools/pick_bench_k.py
"""

import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QL = os.path.join(ROOT, "output", "queue_logs")
OUT = os.path.join(ROOT, "output", "bench_defaults.json")

PSNR_ALLOWANCE = 0.3      # the 0.3 dB quality-fallback rule
CODE_DEFAULT = (32, 12)   # bench.py's in-code default
CODE_CKPT = "output/part2_instant_r3/lego_proxy/best_model.pth"

# Which (k1, k2) each queue bench job measured.
BENCH_JOB_KS = {
    "bench_base": CODE_DEFAULT,
    "bench_k24_8": (24, 8),
    "bench_k28_8": (28, 8),
    "bench_k24_12": (24, 12),
}

# Quality log -> the checkpoint its rows were measured on.
QUALITY_LOGS = {
    "quality_block.log": CODE_CKPT,
    "quality_block_exact.log":
        "output/p2i_exact_r4/lego_proxy/best_model.pth",
    "quality_block_tbrick.log":
        "output/p2i_tbrick_hd_r5/lego_proxy/best_model.pth",
    # The round-5 quality-candidate artifact: 5k-step tbrick train whose
    # dense headroom lets the fast k=24+8 block point hold the bar.
    "quality_block_q5k.log":
        "output/p2i_q5k_r5/lego_proxy/best_model.pth",
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

    # (ckpt, k) -> PSNR, one entry per quality log whose ckpt exists.
    psnr_by_ck = {}
    for log_name, ckpt in QUALITY_LOGS.items():
        qlog = os.path.join(QL, log_name)
        if not os.path.exists(qlog):
            continue
        if not os.path.exists(os.path.join(ROOT, ckpt)):
            print(f"{log_name}: checkpoint {ckpt} missing; skipped")
            continue
        with open(qlog, encoding="utf-8", errors="replace") as f:
            for m in QUALITY_RE.finditer(f.read()):
                k = (int(m.group(1)), int(m.group(2)))
                psnr_by_ck[(ckpt, k)] = float(m.group(3))

    if not psnr_by_ck:
        print("no quality rows measured; defaults unchanged")
        return
    # Same-path quality bar: best block-path PSNR in the sweep, less the
    # 0.3 dB fallback allowance. Self-calibrating — a better training
    # artifact raises the bar with itself.
    bar = max(psnr_by_ck.values()) - PSNR_ALLOWANCE
    print(f"quality bar: best block-path {max(psnr_by_ck.values()):.2f} "
          f"- {PSNR_ALLOWANCE} = {bar:.2f} dB")

    candidates = []
    for (ckpt, ks), psnr in sorted(psnr_by_ck.items()):
        fps = fps_by_k.get(ks)
        if fps is None:
            continue
        ok = psnr >= bar
        tag = os.path.basename(os.path.dirname(os.path.dirname(ckpt)))
        print(f"{tag} k={ks}: FPS {fps:.3f}, PSNR {psnr:.2f} dB "
              f"({'ok' if ok else 'below bar'})")
        if ok:
            candidates.append((fps, psnr, ks, ckpt))

    if not candidates:
        print("no candidate holds the quality bar; defaults unchanged")
        return

    base_fps = fps_by_k.get(CODE_DEFAULT, 0.0)
    fps, psnr, ks, ckpt = max(candidates)
    if ks != CODE_DEFAULT and fps <= base_fps:
        print(f"best candidate k={ks} ({fps:.3f} FPS) does not beat the "
              f"default's {base_fps:.3f} FPS; defaults unchanged")
        return

    with open(OUT, "w") as f:
        json.dump({"k1": ks[0], "k2": ks[1], "ckpt": ckpt,
                   "fps": fps, "psnr": psnr,
                   "rule": f"max FPS with block-path PSNR >= {bar:.2f} "
                           f"(best block-path - {PSNR_ALLOWANCE})"}, f)
        f.write("\n")
    print(f"picked k={ks[0]}+{ks[1]} on {ckpt}: {fps:.3f} FPS at "
          f"{psnr:.2f} dB -> {OUT}")


if __name__ == "__main__":
    main()
