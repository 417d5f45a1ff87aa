#!/bin/bash
# Round-5 serial TPU chip-work queue: gates first, outage-RESUMABLE.
#
# Same primitives as tools/chip_queue.sh (relay wait, idempotent .done
# markers, bench-priority SIGSTOP protocol, per-job evidence commits),
# plus the round-5 upgrades:
#   * training jobs pass --resume: run.py now persists the FULL train
#     state (optimizer, step, grid, rng) at every val checkpoint, so a
#     tunnel flap costs at most one val interval instead of the whole
#     run (the relay dropped ~every 30 min on 2026-08-19 morning and
#     burned 4 ab_exact attempts at ~40 min each — none finished);
#   * tunnel-class retries raised 4 -> 12 (retries are cheap now);
#   * each failed attempt's log tail is folded into the queue log
#     before the retry overwrites it (the rc=1 diagnosis of the first
#     ab_exact failures was lost to the overwrite);
#   * job order = VERDICT r4 priority: headline bench chain, part 4 at
#     scale, part 3 flagship, part 2 golden number, part 1 photo row,
#     part 3 std/dtc, THEN experiments/profiles.
#
# Usage: nohup bash tools/chip_queue_r5.sh > output/queue_logs/queue_r5.log 2>&1 &
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
# the queue must not touch the chip then. Markers >30 min old are stale.
bench_priority() {
  [ -f "$QL/BENCH_PRIORITY" ] || return 1
  local age=$(( $(date +%s) - $(stat -c %Y "$QL/BENCH_PRIORITY") ))
  [ "$age" -le 1800 ] && return 0
  return 1
}

scene() {  # ensure a proxy scene exists (CPU, idempotent)
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
    # Preserve the failing attempt's diagnosis before a retry overwrites it.
    echo "[queue] ---- $name attempt tail (rc=$rc) ----"
    tail -8 "$QL/$name.log"
    echo "[queue] ---------------------------------"
    # GNU timeout counts SIGSTOP-paused wall time toward the budget;
    # rc=124 on a job that was paused for a driver bench is retryable.
    if [ $rc -eq 124 ] && [ "$was_paused" -eq 1 ] \
        && [ $((pause_retries+=1)) -le 2 ]; then
      echo "[queue] $name: rc=124 after a bench pause; retry $pause_retries/2"
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

# ---- P0: headline render chain -----------------------------------------
# ab_exact trains the exact-layout 2k Instant artifact (--resume: the 4
# pre-resume attempts all died to tunnel flaps). Its wall-clock line is
# also the exact arm of the layout A/B; its ckpt unlocks the quality
# re-pick: the r3 brick ckpt tops out at 25.78 dB via the block path,
# below the 25.88 bar, so the measured 11.36 FPS k=24+8 point cannot
# ship without this artifact.
scene lego_proxy
job ab_exact 5400 python run.py --config configs/r4/p2i_exact.yaml \
  --data_dir data_scenes/lego_proxy --resume
if [ -f output/p2i_exact_r4/lego_proxy/best_model.pth ]; then
  job quality_block_exact 5400 python tools/quality_ab.py \
    --ckpt output/p2i_exact_r4/lego_proxy/best_model.pth \
    --data_dir data_scenes/lego_proxy --only block --n_images 8 \
    --out "$QL/ab_block_exact_r5.md"
fi
job pick_k3       300  python tools/pick_bench_k.py
job bench_chosen3 2700 env BENCH_FROM_QUEUE=1 python bench.py


# ---- P0b: step-time stage profiles (feed the 5-min-gate attack and the
# layout decision's speed half; ~10 min each) ----------------------------
job profile_train_exact 1800 python -u tools/profile_train.py --hash_impl exact
job profile_train_brick 1800 python -u tools/profile_train.py --hash_impl brick

# ---- P1: part 4 at scale, exact layout (hardest quality gate) ----------
scene dyn_proxy
job part4_exact 14400 python run.py \
  --config configs/r4/part4_exact.yaml --data_dir data_scenes/dyn_proxy \
  --resume
if [ -f output/part4_exact_r4/dyn_proxy/best_model.pth ]; then
  job part4_exact_eval 3600 python run.py \
    --config configs/r4/part4_exact.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part4_exact_r4/dyn_proxy/best_model.pth
fi

# ---- P2: part 3 flagship (instant, 20k) --------------------------------
job p3i_scale 28800 python run.py --config configs/r4/p3i_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
if [ -f output/part3_instant_r4/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/p3i_scale.done" ]; then
  job p3i_salvage_eval 3600 python run.py \
    --config configs/r4/p3i_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part3_instant_r4/dyn_proxy/best_model.pth
fi

# ---- P3: part 2 vanilla golden number ----------------------------------
job p2_20k 5400 python run.py --config configs/r4/p2_20k.yaml \
  --data_dir data_scenes/lego_proxy --resume

# ---- P4: part 1 natural-photo row at chip scale ------------------------
job part1_photo_hd_chip 2700 python run.py \
  --config configs/r5/part1_photo_chip.yaml \
  --image data_scenes/photo/grace_hopper.jpg

# ---- P5: part 3 standard + DTC (reduced-but-honest 10k budgets) --------
job part3_std 14400 python run.py --config configs/r4/part3_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
job part3_dtc 14400 python run.py --config configs/r4/part3_dtc_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume

# ---- P6: part 4 brick control + gentle second scene --------------------
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

# ---- P7: bench sweep experiments + re-pick ------------------------------
job bench_k28_8   2700 env BENCH_FROM_QUEUE=1 BENCH_K1=28 BENCH_K2=8  python bench.py
job bench_k24_12  2700 env BENCH_FROM_QUEUE=1 BENCH_K1=24 BENCH_K2=12 python bench.py
job bench_1disp   2700 env BENCH_FROM_QUEUE=1 BENCH_SINGLE_DISPATCH=1 python bench.py
job bench_foldf32 2700 env BENCH_FROM_QUEUE=1 BAKED_TRILERP=foldf32 python bench.py
job pick_k4       300  python tools/pick_bench_k.py
job bench_chosen4 2700 env BENCH_FROM_QUEUE=1 python bench.py

# ---- P8: hash-layout ladder rungs + diagnostics -------------------------
job ab_mixed 5400 python run.py --config configs/r5/p2i_mixed.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_vcell 5400 python run.py --config configs/r5/p2i_vcell.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_vbrick 5400 python run.py --config configs/r5/p2i_vbrick.yaml \
  --data_dir data_scenes/lego_proxy --resume
job ab_cell 5400 python run.py --config configs/r5/p2i_cell.yaml \
  --data_dir data_scenes/lego_proxy --resume
job profile_block_k24 1800 python -u tools/profile_block.py --k1 24 --k2 8
job profile_train     1800 python -u tools/profile_train.py
if [ -f output/part3_instant_r4/dyn_proxy/best_model.pth ]; then
  job p3i_orbit 3600 python run.py --config configs/r4/p3i_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n -1 \
    --checkpoint output/part3_instant_r4/dyn_proxy/best_model.pth
fi

echo "[queue] $(date -u +%H:%M:%S) queue complete"
python tools/collect_results.py || true
commit_evidence "queue_r5" 0
ls "$QL"
