#!/bin/bash
# Round-5 chip queue, revision f: post-OOM-fix endgame.
#
# Replaces r5c, which was killed at the part1_photo_hd_chip boundary:
# after part1 it would have started a 4h part3_std slot, starving the
# p3i_at_scale retry — p3i OOMed under the old hash-level scan layout
# (queue_logs/p3i_at_scale.log: [2, 1048576] backward cotangents padded
# 64x on the lane axis) and the fix landed in commit 98b0944. Remaining
# round budget, prioritized:
#   1. p3i_at_scale retry (the 4-round evidence hole) in resume slices
#      under a deadline + an always-run salvage eval.
#   2. part3_std slices + salvage eval with what remains.
#   3. part3_dtc slices + salvage eval if anything is left.
#
# Usage: nohup bash tools/chip_queue_r5f.sh <orphan_pid> \
#          > output/queue_logs/queue_r5f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QL=output/queue_logs
mkdir -p "$QL"

# Hard stop for chip work this round; leaves headroom for the driver's
# graded bench + judge. Reassigned between jobs to stage the budget.
QDEADLINE=$(date -d "18:10" +%s)

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

# job NAME TIMEOUT_S CMD...  — r5c's pause/retry machinery plus a
# QDEADLINE check: no new attempt starts past the deadline, and each
# attempt's timeout is clamped to the time remaining.
job() {
  local name=$1 tmo=$2; shift 2
  [ -e "$QL/$name.done" ] && { echo "[queue] $name: done, skip"; return 0; }
  [ -e "$QL/$name.fail" ] && { echo "[queue] $name: failed earlier, skip"; return 1; }
  local tries=0 pause_retries=0
  while : ; do
    local now=$(date +%s)
    if [ "$now" -ge "$QDEADLINE" ]; then
      echo "[queue] $(date -u +%H:%M:%S) $name: deadline reached, moving on"
      return 1
    fi
    local left=$((QDEADLINE - now))
    local t=$tmo
    [ "$left" -lt "$t" ] && t=$left
    wait_relay
    while bench_priority; do
      echo "[queue] $(date -u +%H:%M:%S) driver bench has priority; waiting"
      sleep 15
    done
    echo "[queue] $(date -u +%H:%M:%S) START $name (slice ${t}s): $*"
    local t0=$SECONDS
    timeout "$t" "$@" > "$QL/$name.log" 2>&1 &
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
    echo "[queue] $(date -u +%H:%M:%S) END $name rc=$rc ($((SECONDS-t0))s)"
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
    case "$*" in *--resume*) local resumable=1;; *) local resumable=0;; esac
    if [ $rc -eq 124 ] && [ "$resumable" -eq 1 ] \
        && [ $((tries+=1)) -le 12 ]; then
      echo "[queue] $name: slice budget out on a resumable job, continue $tries/12"
      commit_evidence "$name" 124
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

# ---- adopt the orphaned part1 job from r5c -------------------------------
ORPHAN=${1:-}
if [ -n "$ORPHAN" ]; then
  echo "[queue] waiting for orphaned r5c job (pid $ORPHAN)"
  while kill -0 "$ORPHAN" 2>/dev/null; do sleep 15; done
  if grep -q "PSNR" "$QL/part1_photo_hd_chip.log" 2>/dev/null; then
    touch "$QL/part1_photo_hd_chip.done"
    commit_evidence "part1_photo_hd_chip" 0
  else
    echo "[queue] part1_photo_hd_chip left no PSNR; log tail:"
    tail -5 "$QL/part1_photo_hd_chip.log" 2>/dev/null
  fi
fi

# ---- P1: part 3 instant at scale, with the OOM fix -----------------------
rm -f "$QL/p3i_at_scale.fail"
QDEADLINE=$(date -d "18:10" +%s)
job p3i_at_scale 2700 python run.py --config configs/r5/p3i_tbrick.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
QDEADLINE=$(date -d "18:35" +%s)
if [ -f output/p3i_tbrick_r5/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/p3i_at_scale.done" ]; then
  job p3i_salvage_eval 1500 python run.py --config configs/r5/p3i_tbrick.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/p3i_tbrick_r5/dyn_proxy/best_model.pth
fi

# ---- P2: part 3 standard, slices + salvage -------------------------------
QDEADLINE=$(date -d "18:50" +%s)
job part3_std 2400 python run.py --config configs/r4/part3_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
QDEADLINE=$(date -d "19:05" +%s)
if [ -f output/part3_r4/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/part3_std.done" ]; then
  job part3_std_salvage_eval 1200 python run.py \
    --config configs/r4/part3_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part3_r4/dyn_proxy/best_model.pth
fi

# ---- P3: part 3 DTC, only if time is left --------------------------------
QDEADLINE=$(date -d "19:20" +%s)
job part3_dtc 1800 python run.py --config configs/r4/part3_dtc_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
if [ -f output/part3_dtc_r4/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/part3_dtc.done" ]; then
  job part3_dtc_salvage_eval 1200 python run.py \
    --config configs/r4/part3_dtc_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part3_dtc_r4/dyn_proxy/best_model.pth
fi

echo "[queue] $(date -u +%H:%M:%S) queue r5f complete"
python tools/pick_bench_k.py || true
python tools/collect_results.py || true
commit_evidence "queue_r5f" 0
