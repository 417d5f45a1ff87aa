#!/bin/bash
# Round-5 chip queue, revision g: the p3i retry with both memory fixes.
#
# Supersedes r5f. p3i_at_scale OOMed twice on chip; the fixes are
# (1) per-feature scan emission + (2) per-dense-level remat in
# ops/hashgrid.py (commits 98b0944 + this one), and the retry config
# configs/r5/p3i_tbrick_10k.yaml additionally drops the 16M dense-entry
# cap (chip A/B: buys nothing — 25.88 vs 25.89) and runs a COMPLETED
# 10k cosine schedule instead of an interrupted 20k one (chip-time
# honest: half the reference budget, noted in the README row).
# After p3i: the steps-per-dispatch Instant gate attack, then part3
# std/dtc slices with whatever remains.
#
# Usage: nohup bash tools/chip_queue_r5g.sh > output/queue_logs/queue_r5g.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
QL=output/queue_logs
mkdir -p "$QL"

QDEADLINE=$(date -d "18:05" +%s)

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

# ---- adopt/clear any chip process handed over from r5f -------------------
for pid in "$@"; do
  if kill -0 "$pid" 2>/dev/null; then
    echo "[queue] killing handed-over chip job pid $pid"
    kill "$pid" 2>/dev/null
    sleep 3
    kill -9 "$pid" 2>/dev/null
  fi
done
sleep 2

# ---- P1: part 3 instant, 10k completed-cosine, memory-fixed --------------
QDEADLINE=$(date -d "18:05" +%s)
job p3i_10k 2700 python run.py --config configs/r5/p3i_tbrick_10k.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
QDEADLINE=$(date -d "18:30" +%s)
if [ -f output/p3i_tbrick10k_r5/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/p3i_10k.done" ]; then
  job p3i_10k_salvage_eval 1500 python run.py \
    --config configs/r5/p3i_tbrick_10k.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/p3i_tbrick10k_r5/dyn_proxy/best_model.pth
fi

# ---- P2: Instant 5-minute gate with steps_per_dispatch -------------------
QDEADLINE=$(date -d "18:50" +%s)
job p2i_gate_spd 1500 python run.py --config configs/r5/p2i_gate_spd.yaml \
  --data_dir data_scenes/lego_proxy
QDEADLINE=$(date -d "19:05" +%s)
job p2i_gate_spd_tbrick 1500 python run.py \
  --config configs/r5/p2i_gate_spd_tbrick.yaml \
  --data_dir data_scenes/lego_proxy

# ---- P3: part 3 standard + DTC leftovers ---------------------------------
QDEADLINE=$(date -d "19:20" +%s)
job part3_std 1800 python run.py --config configs/r4/part3_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
if [ -f output/part3_r4/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/part3_std.done" ]; then
  job part3_std_salvage_eval 1200 python run.py \
    --config configs/r4/part3_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part3_r4/dyn_proxy/best_model.pth
fi
QDEADLINE=$(date -d "19:35" +%s)
job part3_dtc 1200 python run.py --config configs/r4/part3_dtc_scale.yaml \
  --data_dir data_scenes/dyn_proxy --render_n 20 --resume
if [ -f output/part3_dtc_r4/dyn_proxy/best_model.pth ] \
    && [ ! -e "$QL/part3_dtc.done" ]; then
  job part3_dtc_salvage_eval 1200 python run.py \
    --config configs/r4/part3_dtc_scale.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 20 \
    --checkpoint output/part3_dtc_r4/dyn_proxy/best_model.pth
fi

echo "[queue] $(date -u +%H:%M:%S) queue r5g complete"
python tools/pick_bench_k.py || true
python tools/collect_results.py || true
commit_evidence "queue_r5g" 0
