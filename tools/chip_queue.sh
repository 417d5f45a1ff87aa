#!/bin/bash
# Serial TPU chip-work queue with tunnel-outage recovery.
#
# The TPU reaches this VM through a relay daemon that has died mid-round
# before (round 3 lost its headline bench capture and the whole at-scale
# backlog to it, and the queue that would have recovered lived in /tmp,
# which this environment wipes). This committed version:
#   * waits for a relay port (127.0.0.1:8082/8113) before every job,
#   * runs the at-scale backlog serially (one TPU process at a time),
#   * is idempotent: a job whose output/queue_logs/<name>.done marker
#     exists is skipped, so the queue can be re-launched any time,
#   * retries a job when its failure looks like a tunnel outage; marks
#     .fail and moves on otherwise.
#
# Usage: nohup bash tools/chip_queue.sh > output/queue_logs/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QL=output/queue_logs
mkdir -p "$QL"

relay_up() {
  python3 - <<'EOF'
import socket, sys
for p in (8082, 8113):
    s = socket.socket(); s.settimeout(1.0)
    try:
        s.connect(("127.0.0.1", p)); sys.exit(0)
    except OSError:
        pass
    finally:
        s.close()
sys.exit(1)
EOF
}

wait_relay() {
  while ! relay_up; do
    echo "[queue] $(date -u +%H:%M:%S) relay down; waiting..."
    sleep 20
  done
}

# A driver-invoked bench.py writes $QL/BENCH_PRIORITY while it measures;
# the queue must not touch the chip then. Markers >30 min old are stale
# (a crashed bench must not stall the queue forever).
bench_priority() {
  [ -f "$QL/BENCH_PRIORITY" ] || return 1
  local age=$(( $(date +%s) - $(stat -c %Y "$QL/BENCH_PRIORITY") ))
  [ "$age" -le 1800 ] && return 0
  return 1
}

scene() {  # ensure a proxy scene exists (CPU, idempotent)
  [ -f "data_scenes/$1/.complete" ] || python tools/make_scenes.py "$1"
}

# After every job, fold its log into RESULTS_r4.md and commit the
# evidence tree so a mid-queue outage (or round end) cannot erase
# captured results again. Retries around a concurrent interactive
# commit holding index.lock.
commit_evidence() {
  local name=$1 rc=$2
  python tools/collect_results.py || true
  for _ in 1 2 3; do
    git add -A output/ AB_RESULTS.md 2>/dev/null \
      && git commit -q -m "chip queue: $name rc=$rc (auto-collected evidence)" \
      && return 0
    sleep 5
  done
  echo "[queue] WARNING: evidence commit failed for $name"
  return 0
}

# job NAME TIMEOUT_S CMD...
job() {
  local name=$1 tmo=$2; shift 2
  [ -e "$QL/$name.done" ] && { echo "[queue] $name: done, skip"; return 0; }
  [ -e "$QL/$name.fail" ] && { echo "[queue] $name: failed earlier, skip"; return 1; }
  local tries=0 pause_retries=0
  while : ; do
    wait_relay
    while bench_priority; do
      echo "[queue] $(date -u +%H:%M:%S) driver bench has priority; waiting"
      sleep 15
    done
    echo "[queue] $(date -u +%H:%M:%S) START $name: $*"
    local t0=$SECONDS
    timeout "$tmo" "$@" > "$QL/$name.log" 2>&1 &
    local jpid=$! stopped=0 was_paused=0
    while kill -0 "$jpid" 2>/dev/null; do
      if bench_priority; then
        if [ "$stopped" -eq 0 ]; then
          echo "[queue] $(date -u +%H:%M:%S) pausing $name for driver bench"
          pkill -STOP -P "$jpid" 2>/dev/null; kill -STOP "$jpid" 2>/dev/null
          stopped=1 was_paused=1
        fi
      elif [ "$stopped" -eq 1 ]; then
        echo "[queue] $(date -u +%H:%M:%S) resuming $name"
        kill -CONT "$jpid" 2>/dev/null; pkill -CONT -P "$jpid" 2>/dev/null
        stopped=0
      fi
      sleep 15
    done
    wait "$jpid"
    local rc=$?
    echo "[queue] $(date -u +%H:%M:%S) END $name rc=$rc (${t0:+$((SECONDS-t0))}s)"
    if [ $rc -eq 0 ]; then
      touch "$QL/$name.done"; commit_evidence "$name" 0; return 0
    fi
    # GNU timeout counts SIGSTOP-paused wall time toward the budget, so a
    # job paused for a driver bench can be timeout-killed (rc=124) through
    # no fault of its own; that leaves no tunnel-class signature in the
    # log and would .fail permanently. Retry it (bounded) instead.
    if [ $rc -eq 124 ] && [ "$was_paused" -eq 1 ] \
        && [ $((pause_retries+=1)) -le 2 ]; then
      echo "[queue] $name: rc=124 after a bench pause; retry $pause_retries/2"
      continue
    fi
    if grep -qE "Unable to initialize backend|UNAVAILABLE|DEADLINE_EXCEEDED" \
        "$QL/$name.log" && [ $((tries+=1)) -le 4 ]; then
      echo "[queue] $name: tunnel-class failure, retry $tries/4"
      sleep 30
      continue
    fi
    tail -5 "$QL/$name.log"
    touch "$QL/$name.fail"; commit_evidence "$name" "$rc"; return 1
  done
}

CKPT=output/part2_instant_r3/lego_proxy/best_model.pth

# Ordered so the top VERDICT items land first if the relay returns late:
# headline bench + key sweep point, then the two training gates, then
# part4 at scale, then quality/profiles, then the long tail.

# ---- P0: the graded render number (headline + key sweep point) ---------
scene lego_proxy
job bench_base    2700 env BENCH_FROM_QUEUE=1 python bench.py
job bench_k24_8   2700 env BENCH_FROM_QUEUE=1 BENCH_K1=24 BENCH_K2=8  python bench.py
# quality per sweep point on the same artifact, then auto-pick the
# shipped bench defaults (max FPS holding PSNR >= 25.88) and re-measure
# the chosen configuration driver-style (no env overrides).
job quality_block 5400 python tools/quality_ab.py --ckpt "$CKPT" \
  --data_dir data_scenes/lego_proxy --only block --n_images 8 \
  --out "$QL/ab_block_r4.md"
job pick_k        300  python tools/pick_bench_k.py
job bench_chosen  2700 env BENCH_FROM_QUEUE=1 python bench.py

# ---- P1: Instant 5-min gate (compaction + warm compile cache) ---------
job p2i_gate1 2400 python run.py --config configs/r4/p2i_gate.yaml \
  --data_dir data_scenes/lego_proxy
# second run on the warm compile cache is the honest gate measurement
job p2i_gate2 2400 python run.py --config configs/r4/p2i_gate.yaml \
  --data_dir data_scenes/lego_proxy
# compaction quality-fallback rule (ROADMAP P1): >0.3 dB below the
# 26.18 dense baseline -> re-measure with compaction off.
if [ -e "$QL/p2i_gate2.done" ] && [ ! -e "$QL/p2i_gate_nc.done" ]; then
  psnr=$(grep -oE "Instant-NeRF test PSNR: [0-9.]+" "$QL/p2i_gate2.log" \
         | grep -oE "[0-9.]+$" | tail -1)
  if python3 -c "import sys; sys.exit(0 if float('${psnr:-0}') < 25.88 else 1)"; then
    echo "[queue] gate PSNR ${psnr:-none} < 25.88: compaction fallback run"
    job p2i_gate_nc 2400 python run.py \
      --config configs/r4/p2i_gate_nocompact.yaml \
      --data_dir data_scenes/lego_proxy
  else
    echo "[queue] gate PSNR $psnr holds the baseline; no fallback needed"
    touch "$QL/p2i_gate_nc.done"
  fi
fi

# ---- P1b: brick/exact chip A/B (step-time half of the flip) ------------
# Moved ahead of the long exact-layout jobs: the default flipped to
# exact on CPU quality evidence, but exact costs 8x the gather/scatter
# descriptors per point-level on chip — these 2k-step arms (~30-60 min
# each) bound that step-time cost BEFORE the 5k/20k exact runs below
# spend hours on it, and their wall-clock lines are the flip decision's
# missing half (AB_RESULTS.md).
job ab_brick 2400 python run.py --config configs/r4/p2i_brick.yaml \
  --data_dir data_scenes/lego_proxy
job ab_exact 3600 python run.py --config configs/r4/p2i_exact.yaml \
  --data_dir data_scenes/lego_proxy

# ---- P1c: headline upgrade — block quality on the EXACT artifact --------
# The block path on the r3 brick ckpt tops out at 25.78 dB (quality_block
# .log), below the 25.88 bar at every k — so the 11.36 FPS k=24+8 point
# cannot ship from that artifact. The render path is BAKED (layout-
# independent), so the exact-layout 2k ckpt from ab_exact is pure quality
# upside at identical FPS. Measure its block rows, re-pick (pick writes
# {k1,k2,ckpt} and bench.py now reads the ckpt from the defaults file),
# then re-measure the chosen config driver-style.
if [ -f output/p2i_exact_r4/lego_proxy/best_model.pth ]; then
  job quality_block_exact 5400 python tools/quality_ab.py \
    --ckpt output/p2i_exact_r4/lego_proxy/best_model.pth \
    --data_dir data_scenes/lego_proxy --only block --n_images 8 \
    --out "$QL/ab_block_exact_r5.md"
fi
job bench_k28_8   2700 env BENCH_FROM_QUEUE=1 BENCH_K1=28 BENCH_K2=8  python bench.py
job bench_k24_12  2700 env BENCH_FROM_QUEUE=1 BENCH_K1=24 BENCH_K2=12 python bench.py
job bench_1disp   2700 env BENCH_FROM_QUEUE=1 BENCH_SINGLE_DISPATCH=1 python bench.py
# factorized-trilerp fine pass (foldf32 is numerically exact; fold is
# bf16 — needs a quality row before it could ever ship as default)
job bench_foldf32 2700 env BENCH_FROM_QUEUE=1 BAKED_TRILERP=foldf32 python bench.py
job bench_fold    2700 env BENCH_FROM_QUEUE=1 BAKED_TRILERP=fold    python bench.py
# re-pick with the full sweep + exact-ckpt quality measured, then
# validate the chosen configuration exactly as the driver will run it
job pick_k3       300  python tools/pick_bench_k.py
job bench_chosen3 2700 env BENCH_FROM_QUEUE=1 python bench.py

# ---- P1d: part 1 natural-photo row at chip scale (cheap README row) -----
# grace_hopper.jpg natural photo at 512x600 with the reference's own
# best-sweep capacity (L=15, 1024x5 — reference run.py:47-57); the CPU
# hedge at 256x4 capacity reached only 31.30 dB.
job part1_photo_hd_chip 2700 python run.py \
  --config configs/r5/part1_photo_chip.yaml \
  --image data_scenes/photo/grace_hopper.jpg

# ---- P2: part 4 at scale (anchor-times fix landed r3) ------------------
# The part-3/part-4 recipes defer the test pass to --eval_only
# (reference parity: run.py:2121-2160), so each training job is followed
# by an eval job that records the dense full-test PSNR + orbit frames.
# The eval runs off best_model.pth so it still lands if training hit its
# timeout after the last val checkpoint.
scene dyn_proxy
# Exact-layout part4 FIRST: the CPU layout A/B (output/ab_cpu/SUMMARY.md)
# has exact leading brick by 3.2 dB at equal param count — the quality
# candidate gets the first chip slot on the hardest quality gate.
job part4_exact 10800 python run.py \
  --config configs/r4/part4_exact.yaml --data_dir data_scenes/dyn_proxy
if [ -f output/part4_exact_r4/dyn_proxy/best_model.pth ]; then
  job part4_exact_eval 3600 python run.py \
    --config configs/r4/part4_exact.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part4_exact_r4/dyn_proxy/best_model.pth
fi

# ---- P3: part 3 flagship (instant, 20k) --------------------------------
# --render_n 20 routes the post-train eval into the full-test dense PSNR
# pass (render_n -1 would render the orbit video INSTEAD of the metric).
# 21600 s: the exact layout's backward scatter-adds may cost up to ~4x
# brick's step time on chip; 20k steps must not die at a 3h timeout.
job p3i_scale 21600 python run.py --config configs/r4/p3i_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20
# salvage eval: if training timed out after its last val checkpoint,
# the in-job test pass never ran — record the metric off best_model.pth.
if [ -f output/part3_instant_r4/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/p3i_scale.done" ]; then
  job p3i_salvage_eval 3600 python run.py \
    --config configs/r4/p3i_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part3_instant_r4/dyn_proxy/best_model.pth
fi

# ---- P4: part 2 vanilla golden number ----------------------------------
job p2_20k 3600 python run.py --config configs/r4/p2_20k.yaml \
  --data_dir data_scenes/lego_proxy

# ---- P5: part 4 brick control + part 3 standard/DTC + second scene -----
job part4_scale 7200 python run.py --config configs/r4/part4_scale.yaml \
  --data_dir data_scenes/dyn_proxy
if [ -f output/part4_r4/dyn_proxy/best_model.pth ]; then
  job part4_scale_eval 3600 python run.py \
    --config configs/r4/part4_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part4_r4/dyn_proxy/best_model.pth
fi
job part3_std 14400 python run.py --config configs/r4/part3_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20
job part3_dtc 14400 python run.py --config configs/r4/part3_dtc_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20
scene dyn_gentle
job part4_gentle 10800 python run.py --config configs/r4/part4_gentle.yaml \
  --data_dir data_scenes/dyn_gentle
if [ -f output/part4_gentle_r4/dyn_gentle/best_model.pth ]; then
  job part4_gentle_eval 3600 python run.py \
    --config configs/r4/part4_gentle.yaml \
    --data_dir data_scenes/dyn_gentle --eval_only --render_n 20 \
    --checkpoint output/part4_gentle_r4/dyn_gentle/best_model.pth
fi

# ---- P6: the headline-config stage profile (fine-pass-tail data) --------
job profile_block 1800 python -u tools/profile_block.py

# ---- P7: remaining hash-layout ladder rungs (2k each, same seed/scene) --
# (ab_brick/ab_exact moved up to P1b — they gate the long exact runs.)
# Round-5 rungs of the collision-granularity ladder (same recipe/seed):
# mixed = exact's per-vertex hashing on the fine levels only; cell =
# brick's one-row-gather descriptor cost at 8-vertex granularity. Their
# wall-clock lines give the chip step-time of each layout — the missing
# half of the flip decision (quality half: output/ab_cpu/SUMMARY.md).
job ab_mixed 3600 python run.py --config configs/r5/p2i_mixed.yaml \
  --data_dir data_scenes/lego_proxy
job ab_cell 2700 python run.py --config configs/r5/p2i_cell.yaml \
  --data_dir data_scenes/lego_proxy
# vcell: seam-free per-vertex dense prefix + hashed cell rows — the
# layout the round-5 CPU decomposition predicts wins quality at ~1/3 of
# exact's descriptor cost (brick 20.11 / mixed 21.20 / exact 23.31; the
# 2.1 dB mixed-vs-exact gap is the brick dense prefix's seams).
job ab_vcell 3000 python run.py --config configs/r5/p2i_vcell.yaml \
  --data_dir data_scenes/lego_proxy
# vbrick: the 2x3 matrix's last rung — seam-free vertex dense prefix +
# hashed BRICK rows (vcell's descriptor budget, brick's 64-vertex hashed
# granularity, which beat cell's by 1.1 dB on CPU). The speed-oriented
# quality candidate if exact's chip step time vetoes the new default.
job ab_vbrick 3000 python run.py --config configs/r5/p2i_vbrick.yaml \
  --data_dir data_scenes/lego_proxy

# ---- P8: (retired) exact-layout rerun of the part-3i gate -----------------
# The default flip landed in round 5 (AB_RESULTS.md decision rule: the
# full CPU ladder came in brick 20.11 / cell 18.99 / mixed 21.20 /
# exact 23.31, so the package default and configs/r4/p3i_scale.yaml are
# now `hash_impl: exact`) — the P3 p3i_scale job IS the exact arm and a
# separate rerun here would duplicate it.

# ---- P9: diagnostics tail (ungraded; after every graded row) -------------
job profile_block_k24 1800 python -u tools/profile_block.py --k1 24 --k2 8
job profile_train     1800 python -u tools/profile_train.py
# part-3i orbit video (the PSNR row came from --render_n 20 at P3)
if [ -f output/part3_instant_r4/dyn_proxy/best_model.pth ]; then
  job p3i_orbit 3600 python run.py --config configs/r4/p3i_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n -1 \
    --checkpoint output/part3_instant_r4/dyn_proxy/best_model.pth
fi

echo "[queue] $(date -u +%H:%M:%S) queue complete"
python tools/collect_results.py || true
ls "$QL"
