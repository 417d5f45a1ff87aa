#!/bin/bash
# CPU queue, stage 5 (round 5). Two jobs, in grading-value order:
#   1. part1_photo_hd2 — the 35 dB-class natural-photo arm: the H256
#      constant-lr sweep plateaued at 31.66/31.30 dB (L
#      insensitive => capacity/optimization-limited), so this arm
#      scales width to H512 and opts into the new cosine decay at
#      8000 steps (single L=10 point).
#   2. p2i_vbrick — the 2x3 layout matrix's last rung (seam-free
#      per-vertex dense prefix + hashed 128-lane brick rows; vcell's
#      ~44-descriptor budget with brick's 64-vertex hashed granularity,
#      which beat cell's 8-vertex rows by 1.1 dB).
# Runs after the stage-4 queue (tools/ab_cpu4.sh) exits; same protocol,
# marker, summarize and commit conventions as ab4.
#
# Usage: AB4_PID=<pid> setsid nohup bash tools/ab_cpu5.sh > /tmp/ab_cpu5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
AB=/tmp/ab_cpu
OUT=output/ab_cpu
mkdir -p "$AB" "$OUT"

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

AB4_PID="${AB4_PID:?pass the ab_cpu4.sh supervisor pid}"
while kill -0 "$AB4_PID" 2>/dev/null; do
  echo "[ab5] $(date -u +%H:%M:%S) waiting for ab4 (pid $AB4_PID)"
  sleep 300
done

summarize() {
  {
    echo "# CPU hash-layout A/B — the collision-granularity ladder"
    echo
    echo "part2_instant, 500 steps, lego_proxy ds8, identical recipe/seed,"
    echo "byte-parity hashed tables. brick/exact/brick20 are round-4 arms;"
    echo "mixed/cell/vcell/vbrick are the round-5 layouts (decomposition"
    echo "in AB_RESULTS.md)."
    echo
    echo "Collected $(date -u +%Y-%m-%dT%H:%MZ)."
    echo
    for arm in brick brick20 exact mixed cell vcell vbrick; do
      for src in "$OUT/p2i_$arm.log" "$OUT/$arm.log"; do
        [ -f "$src" ] || continue
        echo "## $arm"
        grep -E ">>> Step (100|200|300|400|500)/|best val PSNR|test PSNR|wall-clock" \
          "$src" | sed 's/^/    /'
        echo
        break
      done
    done
  } > "$OUT/SUMMARY.md"
}

job() {  # job NAME TIMEOUT CMD...
  local name=$1 tmo=$2; shift 2
  [ -e "$OUT/$name.done" ] && { echo "[ab5] $name done, skip"; return 0; }
  echo "[ab5] $(date -u +%H:%M:%S) START $name"
  env JAX_PLATFORMS=cpu timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  local pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[ab5] pausing $name (relay up)"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[ab5] resuming $name"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"; local rc=$?
  echo "[ab5] $(date -u +%H:%M:%S) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  summarize
  for _ in 1 2 3; do
    git add "$OUT" 2>/dev/null \
      && git commit -q -m "CPU queue r5: $name rc=$rc" && break
    sleep 5
  done
}

# ---- 1: part-1 natural photo, capacity-scaled + cosine decay -------------
if [ ! -f configs/r5/part1_photo_hd2.yaml ]; then
  cat > configs/r5/part1_photo_hd2.yaml <<'EOF'
# Round-5 part-1 35 dB-class arm: the H256 constant-lr sweep measured
# 31.66 (L=10) / 31.30 (L=15) on grace_hopper 512x600 — L-insensitive,
# so the limiter is capacity/optimization, not encoding bandwidth.
# This arm doubles width and adds the cosine tail at 2x steps.
mode: part1_fourier
use_positional_encoding: true
L_embed:
- 10
hidden_dim: 512
num_layers: 4
output_dim: 3
epochs: 8000
learning_rate: 0.001
lr_schedule: cosine
batch_size: 16384
image_size: 512
log_dir: output/part1_photo_hd2
save_every: 4000
log_every: 800
EOF
fi
job part1_photo_hd2 18000 python run.py \
  --config configs/r5/part1_photo_hd2.yaml \
  --image data_scenes/photo/grace_hopper.jpg
for _ in 1 2 3; do
  git add configs/r5/part1_photo_hd2.yaml output/part1_photo_hd2 \
    output/part1_photo_hd 2>/dev/null \
    && git commit -q -m "CPU queue r5: part-1 photo arms evidence" && break
  sleep 5
done

# ---- 2: vbrick part2i arm -------------------------------------------------
# The EXACT round-4/5 ab_cpu recipe + hash_impl (mirrors ab4's mk_p2i).
cat > "$AB/vbrick.yaml" <<EOF
mode: part2_instant
hash_impl: vbrick
log_dir: $AB/vbrick
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
cp "$AB/vbrick.yaml" "$OUT/vbrick.yaml"
job p2i_vbrick 14400 python run.py --config "$AB/vbrick.yaml" \
  --data_dir data_scenes/lego_proxy

python tools/collect_results.py || true
for _ in 1 2 3; do
  git add "$OUT" output/queue_logs 2>/dev/null \
    && git commit -q -m "CPU queue r5 stage 5 complete (vbrick arm)" && break
  sleep 5
done
echo "[ab5] $(date -u +%H:%M:%S) complete"
