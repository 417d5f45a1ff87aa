#!/bin/bash
# Round-5 chip queue, revision c: the tbrick arms lead.
#
# Rationale for the reorder (supersedes tools/chip_queue_r5.sh): the
# exact layout measured ~16 steps/min on chip (ab_exact log, 2026-08-19)
# — ~2h per 2k-step arm — while the tbrick layout (tied brick rows,
# ops/hashgrid.py) promises exact-class quality at brick-class speed
# (~10 min per arm). Running tbrick first means the part4/part3i
# at-scale slots (the two hardest quality gates) start hours earlier
# with the better layout if it validates; ab_exact RESUMES late from its
# saved train state to finish the ladder's exact arm either way.
#
# Usage: nohup bash tools/chip_queue_r5e.sh > output/queue_logs/queue_r5e.log 2>&1 &
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

bench_priority() {
  [ -f "$QL/BENCH_PRIORITY" ] || return 1
  local age=$(( $(date +%s) - $(stat -c %Y "$QL/BENCH_PRIORITY") ))
  [ "$age" -le 1800 ] && return 0
  return 1
}

scene() {
  [ -f "data_scenes/$1/.complete" ] || python tools/make_scenes.py "$1"
}

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
    echo "[queue] ---- $name attempt tail (rc=$rc) ----"
    tail -8 "$QL/$name.log"
    echo "[queue] ---------------------------------"
    if [ $rc -eq 124 ] && [ "$was_paused" -eq 1 ] \
        && [ $((pause_retries+=1)) -le 2 ]; then
      echo "[queue] $name: rc=124 after a bench pause; retry $pause_retries/2"
      continue
    fi
    # rc=124 on a --resume training job just means the slice budget ran
    # out: the job continues from resume.pth, so retry it (bounded) —
    # each retry makes forward progress, unlike a from-scratch rerun.
    case "$*" in *--resume*) local resumable=1;; *) local resumable=0;; esac
    if [ $rc -eq 124 ] && [ "$resumable" -eq 1 ] \
        && [ $((tries+=1)) -le 12 ]; then
      echo "[queue] $name: timeout on a resumable job, continue $tries/12"
      continue
    fi
    if grep -qE "Unable to initialize backend|UNAVAILABLE|DEADLINE_EXCEEDED" \
        "$QL/$name.log" && [ $((tries+=1)) -le 12 ]; then
      echo "[queue] $name: tunnel-class failure, retry $tries/12"
      sleep 30
      continue
    fi
    touch "$QL/$name.fail"; commit_evidence "$name" "$rc"; return 1
  done
}

psnr_of() {  # last "Instant-NeRF test PSNR: X" (or generic test PSNR) in a log
  [ -f "$QL/$1.log" ] || { echo 0; return; }
  local v
  v=$(grep -oE "test PSNR: [0-9.]+" "$QL/$1.log" | grep -oE "[0-9.]+$" | tail -1)
  echo "${v:-0}"
}

# ---- P0: tbrick A/B arms (the round-5 layout candidate) ----------------
scene lego_proxy
job ab_tbrick_hd 5400 python run.py --config configs/r5/p2i_tbrick_hd.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_tbrick 5400 python run.py --config configs/r5/p2i_tbrick.yaml \
  --data_dir data_scenes/lego_proxy --resume
# 5-minute-gate attack: tbrick_hd quality at brick step time
job p2i_gate_tbrick 2400 python run.py \
  --config configs/r5/p2i_gate_tbrick.yaml \
  --data_dir data_scenes/lego_proxy --resume

# ---- P0b: headline quality/pick chain on the best artifacts ------------
if [ -f output/p2i_tbrick_hd_r5/lego_proxy/best_model.pth ]; then
  job quality_block_tbrick 5400 python tools/quality_ab.py \
    --ckpt output/p2i_tbrick_hd_r5/lego_proxy/best_model.pth \
    --data_dir data_scenes/lego_proxy --only block --n_images 8 \
    --out "$QL/ab_block_tbrick_r5.md"
fi
job pick_k3       300  python tools/pick_bench_k.py
job bench_chosen3 2700 env BENCH_FROM_QUEUE=1 python bench.py

# ---- P0c: train-step stage profiles (gate analysis; ~10 min each) ------
job profile_train_tbrick 1800 python -u tools/profile_train.py \
  --hash_impl tbrick --dense_max_entries 16777216
job profile_train_exact 1800 python -u tools/profile_train.py --hash_impl exact
job profile_train_brick 1800 python -u tools/profile_train.py --hash_impl brick

# ---- P0d: the headline quality-candidate artifact ----------------------
# The block render path loses ~0.3-0.4 dB vs dense eval at k=24+8, so no
# 2k-step artifact (dense ceiling ~25.9 on this recipe) can hold the
# 25.88 pick bar at the 11.36-FPS sweep point. A 5k-step tbrick train
# raises the dense ceiling so the fast point clears the bar.
job p2i_quality5k 10800 python run.py --config configs/r5/p2i_q5k.yaml \
  --data_dir data_scenes/lego_proxy --resume
if [ -f output/p2i_q5k_r5/lego_proxy/best_model.pth ]; then
  job quality_block_q5k 5400 python tools/quality_ab.py \
    --ckpt output/p2i_q5k_r5/lego_proxy/best_model.pth \
    --data_dir data_scenes/lego_proxy --only block --n_images 8 \
    --out "$QL/ab_block_q5k_r5.md"
fi
job pick_k5       300  python tools/pick_bench_k.py
job bench_chosen5 2700 env BENCH_FROM_QUEUE=1 python bench.py

# ---- P1: part 4 at scale with the measured-best layout ------------------
scene dyn_proxy
TB=$(psnr_of ab_tbrick_hd)
EX=$(psnr_of ab_exact)
P4_CFG=configs/r5/part4_tbrick.yaml
P4_DIR=output/part4_tbrick_r5
P3_CFG=configs/r5/p3i_tbrick.yaml
P3_DIR=output/p3i_tbrick_r5
# exact only wins the at-scale slots if it measurably beats tbrick_hd
# (>0.15 dB) — at ~8x the step time that is the only justification.
if python3 -c "import sys; sys.exit(0 if float('${EX:-0}') > float('${TB:-0}') + 0.15 else 1)"; then
  P4_CFG=configs/r4/part4_exact.yaml; P4_DIR=output/part4_exact_r4
  P3_CFG=configs/r4/p3i_scale.yaml;   P3_DIR=output/part3_instant_r4
fi
echo "[queue] layout choice: tbrick_hd=$TB exact=$EX -> part4=$P4_CFG p3i=$P3_CFG"
job part4_at_scale 14400 python run.py --config "$P4_CFG" \
  --data_dir data_scenes/dyn_proxy --resume
if [ -f "$P4_DIR/dyn_proxy/best_model.pth" ]; then
  job part4_at_scale_eval 3600 python run.py --config "$P4_CFG" \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint "$P4_DIR/dyn_proxy/best_model.pth"
fi

# ---- P2: part 3 flagship (instant, 20k) ---------------------------------
job p3i_at_scale 28800 python run.py --config "$P3_CFG" \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
if [ -f "$P3_DIR/dyn_proxy/best_model.pth" ] \
    && [ ! -e "$QL/p3i_at_scale.done" ]; then
  job p3i_salvage_eval 3600 python run.py --config "$P3_CFG" \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint "$P3_DIR/dyn_proxy/best_model.pth"
fi

# ---- P3: part 2 vanilla golden number -----------------------------------
job p2_20k 5400 python run.py --config configs/r4/p2_20k.yaml \
  --data_dir data_scenes/lego_proxy --resume

# ---- P4: part 1 natural-photo row at chip scale --------------------------
job part1_photo_hd_chip 2700 python run.py \
  --config configs/r5/part1_photo_chip.yaml \
  --image data_scenes/photo/grace_hopper.jpg

# ---- P5: part 3 standard + DTC (reduced-but-honest 10k budgets) ----------
job part3_std 14400 python run.py --config configs/r4/part3_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
job part3_dtc 14400 python run.py --config configs/r4/part3_dtc_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume

# ---- P6: finish the exact ladder arm (resumes from its saved state) -----
job ab_exact 5400 python run.py --config configs/r4/p2i_exact.yaml \
  --data_dir data_scenes/lego_proxy --resume
if [ -f output/p2i_exact_r4/lego_proxy/best_model.pth ]; then
  job quality_block_exact 5400 python tools/quality_ab.py \
    --ckpt output/p2i_exact_r4/lego_proxy/best_model.pth \
    --data_dir data_scenes/lego_proxy --only block --n_images 8 \
    --out "$QL/ab_block_exact_r5.md"
fi

# ---- P7: part 4 brick control + gentle second scene ----------------------
job part4_scale 10800 python run.py --config configs/r4/part4_scale.yaml \
  --data_dir data_scenes/dyn_proxy --resume
if [ -f output/part4_r4/dyn_proxy/best_model.pth ]; then
  job part4_scale_eval 3600 python run.py \
    --config configs/r4/part4_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part4_r4/dyn_proxy/best_model.pth
fi
scene dyn_gentle
job part4_gentle 10800 python run.py --config configs/r4/part4_gentle.yaml \
  --data_dir data_scenes/dyn_gentle --resume
if [ -f output/part4_gentle_r4/dyn_gentle/best_model.pth ]; then
  job part4_gentle_eval 3600 python run.py \
    --config configs/r4/part4_gentle.yaml \
    --data_dir data_scenes/dyn_gentle --eval_only --render_n 20 \
    --checkpoint output/part4_gentle_r4/dyn_gentle/best_model.pth
fi

# ---- P8: bench sweep experiments + re-pick -------------------------------
job bench_k28_8   2700 env BENCH_FROM_QUEUE=1 BENCH_K1=28 BENCH_K2=8  python bench.py
job bench_k24_12  2700 env BENCH_FROM_QUEUE=1 BENCH_K1=24 BENCH_K2=12 python bench.py
job bench_1disp   2700 env BENCH_FROM_QUEUE=1 BENCH_SINGLE_DISPATCH=1 python bench.py
job bench_foldf32 2700 env BENCH_FROM_QUEUE=1 BAKED_TRILERP=foldf32 python bench.py
job pick_k4       300  python tools/pick_bench_k.py
job bench_chosen4 2700 env BENCH_FROM_QUEUE=1 python bench.py

# ---- P9: remaining ladder rungs + diagnostics ----------------------------
job ab_vbrick 5400 python run.py --config configs/r5/p2i_vbrick.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_mixed 5400 python run.py --config configs/r5/p2i_mixed.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_vcell 5400 python run.py --config configs/r5/p2i_vcell.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_cell 5400 python run.py --config configs/r5/p2i_cell.yaml \
  --data_dir data_scenes/lego_proxy --resume
job profile_block_k24 1800 python -u tools/profile_block.py --k1 24 --k2 8
if [ -f "$P3_DIR/dyn_proxy/best_model.pth" ]; then
  job p3i_orbit 3600 python run.py --config "$P3_CFG" \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n -1 \
    --checkpoint "$P3_DIR/dyn_proxy/best_model.pth"
fi

echo "[queue] $(date -u +%H:%M:%S) queue complete"
python tools/collect_results.py || true
commit_evidence "queue_r5e" 0
ls "$QL"
