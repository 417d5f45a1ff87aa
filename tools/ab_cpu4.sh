#!/bin/bash
# CPU queue, stage 4 (round 5). Takes over from tools/ab_cpu3.sh after
# its p2i_cell arm: the part-4 layout A/B came back a wash (brick 15.49
# vs exact 16.13 at mismatched best-ckpt steps, indistinguishable at
# matched steps), so ab3's tail p4cell arm is dropped in favor of a
# part-4 PRUNE arm — the round-5 root cause for part 4 is occupancy
# staleness, not layout (AB_RESULTS.md). Sequence (serial, 1-core host,
# relay-yielding, idempotent, committed after every job):
#   1. full pytest suite, uncontended (the round's green-tests evidence)
#   2. p2i vcell arm  — the predicted quality/speed winner
#   3. part-1 natural-photo sweep (shared marker with ab3)
#   4. p3i 1k recipe probe (shared marker with ab3)
#   5. part-4 exact + grid_prune_every=96 arm vs the p4exact baseline
#
# Usage: setsid nohup bash tools/ab_cpu4.sh > /tmp/ab_cpu4.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
AB=/tmp/ab_cpu
OUT=output/ab_cpu
HQ=output/cpu_hedge
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

mk_p2i() {  # mk_p2i ARM — the EXACT round-4 ab_cpu recipe + hash_impl
  cat > "$AB/$1.yaml" <<EOF
mode: part2_instant
hash_impl: $1
log_dir: $AB/$1
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
}

summarize() {
  {
    echo "# CPU hash-layout A/B — the collision-granularity ladder"
    echo
    echo "part2_instant, 500 steps, lego_proxy ds8, identical recipe/seed,"
    echo "byte-parity hashed tables. brick/exact/brick20 are round-4 arms;"
    echo "mixed/cell/vcell are the round-5 layouts (see AB_RESULTS.md for"
    echo "the decomposition)."
    echo
    echo "Collected $(date -u +%Y-%m-%dT%H:%MZ)."
    echo
    for arm in brick brick20 exact mixed cell vcell; do
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
  [ -e "$OUT/$name.done" ] && { echo "[ab4] $name done, skip"; return 0; }
  echo "[ab4] $(date -u +%H:%M:%S) START $name"
  env JAX_PLATFORMS=cpu timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  local pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[ab4] pausing $name (relay up)"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[ab4] resuming $name"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"; local rc=$?
  echo "[ab4] $(date -u +%H:%M:%S) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  summarize
  for _ in 1 2 3; do
    git add "$OUT" 2>/dev/null \
      && git commit -q -m "CPU queue r5: $name rc=$rc" && break
    sleep 5
  done
}

# ---- 0: wait for the stage-3 runner to release the single core -----------
# ab3 (if alive) is finishing part1_photo_hd + p3i_probe; its p4cell tail
# is skipped via pre-created .done markers (the part-4 layout question is
# settled). AB3_PID may be passed by the launcher; default to the known
# round-5 supervisor pid.
AB3_PID="${AB3_PID:-30640}"
while kill -0 "$AB3_PID" 2>/dev/null; do
  echo "[ab4] $(date -u +%H:%M:%S) waiting for ab3 (pid $AB3_PID)"
  sleep 120
done

# ---- 1: full test suite (uncontended slot) -------------------------------
job pytest_full 7200 python -m pytest tests/ -q

# ---- 2: vcell part2i arm -------------------------------------------------
mk_p2i vcell
cp "$AB/vcell.yaml" "$OUT/vcell.yaml"
job p2i_vcell 14400 python run.py --config "$AB/vcell.yaml" \
  --data_dir data_scenes/lego_proxy

# ---- 3: part-1 natural-photo sweep ---------------------------------------
job part1_photo_hd 7200 python run.py \
  --config configs/r5/part1_photo_hd.yaml \
  --image data_scenes/photo/grace_hopper.jpg

# ---- 4: p3i 1k-step recipe probe -----------------------------------------
if [ ! -f "$AB/p3i_probe.yaml" ]; then
  python3 - <<'EOF'
import yaml
cfg = yaml.safe_load(open("configs/r4/p3i_scale.yaml"))
cfg.update({
    "hash_impl": "exact",
    "downscale": 8,
    "train_iters": 1000,
    "batch_size": 2048,
    "chunk": 20000,
    "log_every": 100,
    "val_every": 500,
    "grid_resolution": 64,
    "grid_warmup_iters": 128,
    "grid_prune_every": 256,
    "random_bg_start": 200,
    "log_dir": "/tmp/ab_cpu/p3i_probe",
})
yaml.safe_dump(cfg, open("/tmp/ab_cpu/p3i_probe.yaml", "w"))
EOF
  cp "$AB/p3i_probe.yaml" "$OUT/p3i_probe.yaml"
fi
job p3i_probe 18000 python run.py --config "$AB/p3i_probe.yaml" \
  --data_dir data_scenes/dyn_proxy --render_n 5

# ---- 5: part-4 prune arm (exact layout + grid_prune_every 96) ------------
# Baseline: output/cpu_hedge/p4exact_train (no prune in effect at 500
# steps, Skip 0.0% throughout, test 16.13 / rebuilt-grid eval 16.44).
if [ ! -e "$OUT/p4prune_train.done" ]; then
  python3 - <<'EOF'
import yaml
cfg = yaml.safe_load(open("configs/r4/part4_scale.yaml"))
cfg.update({
    "hash_impl": "exact",
    "downscale": 8,
    "train_iters": 500,
    "batch_size": 2048,
    "log_every": 100,
    "val_every": 250,
    "save_every": 250,
    "grid_warmup_iters": 128,
    "grid_prune_every": 96,
    "random_bg_start": 100,
    "chunk": 20000,
    "seed": 0,
    "log_dir": "/tmp/p4_ab/p4prune",
})
yaml.safe_dump(cfg, open("/tmp/p4_ab/p4prune.yaml", "w"))
EOF
  cp /tmp/p4_ab/p4prune.yaml "$OUT/p4prune.yaml"
fi
job p4prune_train 21600 python run.py --config /tmp/p4_ab/p4prune.yaml \
  --data_dir data_scenes/dyn_proxy
if [ -f /tmp/p4_ab/p4prune/dyn_proxy/best_model.pth ]; then
  job p4prune_eval 3600 python run.py --config /tmp/p4_ab/p4prune.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 0 \
    --checkpoint /tmp/p4_ab/p4prune/dyn_proxy/best_model.pth
fi

python tools/collect_results.py || true
for _ in 1 2 3; do
  git add "$OUT" output/queue_logs 2>/dev/null \
    && git commit -q -m "CPU queue r5 stage 4 complete (suite + vcell + part1 HD + p3i probe + p4 prune arm)" && break
  sleep 5
done
echo "[ab4] $(date -u +%H:%M:%S) complete"
