#!/bin/bash
# CPU-scale exact-vs-brick hash-layout A/B (VERDICT r3 item 8 hedge).
#
# The chip queue (tools/chip_queue.sh) carries the authoritative 2k-step
# A/B; this CPU version (500 steps, downscale 8) exists so the question
# still gets an evidence row if the TPU tunnel never returns. It must
# NEVER contend with chip work on this 1-core host: a supervisor
# SIGSTOPs the training process whenever a relay port is listening
# (the chip queue is then measuring wall-clock gates) and SIGCONTs it
# when the relay is down again.
#
# Usage: setsid nohup bash tools/ab_cpu.sh > /tmp/ab_cpu/runner.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
AB=/tmp/ab_cpu
mkdir -p "$AB"

# Self-contained configs: 500 steps, downscale 8, full-size model
# (16 levels, 2^19 tables) — same recipe shape as configs/r4/p2i_brick
# at CPU-tractable scale.
for arm in brick exact; do
  [ -f "$AB/$arm.yaml" ] && continue
  cat > "$AB/$arm.yaml" <<EOF
mode: part2_instant
hash_impl: $arm
log_dir: $AB/$arm
train_iters: 500
batch_size: 2048
n_samples: 128
render_n_samples: 128
train_ray_budget: 32
render_ray_budget: 32
warmup_n_samples: 32
budget_capacity_fraction: 0.5
learning_rate: 0.01
n_levels: 16
n_features_per_level: 2
log2_hashmap_size: 19
base_resolution: 16
per_level_scale: 1.5
hidden_dim: 64
L_embed_dir: 4
near: 2.0
far: 6.0
scene_bound: 1.5
scene_scale: 1.0
downscale: 8
white_bkgd: true
use_density_grid: true
grid_resolution: 64
grid_threshold: 0.12
grid_update_interval: 32
grid_warmup_iters: 128
chunk: 20000
log_every: 100
val_every: 250
save_every: 250
EOF
done

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

# run_arm NAME TIMEOUT: train one arm, pausing while the relay is up.
run_arm() {
  local name=$1 tmo=$2
  [ -e "$AB/$name.done" ] && { echo "[ab] $name done, skip"; return 0; }
  rm -rf "$AB/$name"
  echo "[ab] $(date -u +%H:%M:%S) START $name"
  env JAX_PLATFORMS=cpu timeout "$tmo" \
    python run.py --config "$AB/$name.yaml" \
    --data_dir data_scenes/lego_proxy > "$AB/$name.log" 2>&1 &
  local pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[ab] $(date -u +%H:%M:%S) relay up: pausing $name (chip queue has the core)"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[ab] $(date -u +%H:%M:%S) relay down: resuming $name"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"
  local rc=$?
  echo "[ab] $(date -u +%H:%M:%S) END $name rc=$rc"
  if [ $rc -eq 0 ]; then touch "$AB/$name.done"; else tail -3 "$AB/$name.log"; fi
  return $rc
}

run_arm brick 14400
run_arm exact 21600
echo "[ab] $(date -u +%H:%M:%S) A/B complete"
for arm in brick exact; do
  echo "== $arm =="
  grep -E "test PSNR|wall|Step 500" "$AB/$arm.log" | tail -5
done
