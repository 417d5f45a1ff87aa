#!/bin/bash
# CPU A/B, stage 3 (round 5): the two NEW hash layouts — mixed and cell —
# on the identical part2_instant protocol the round-4 A/B used
# (500 steps, lego_proxy ds8, same recipe/seed, byte-parity tables), so
# output/ab_cpu/SUMMARY.md becomes the full granularity ladder:
#   brick (64-vertex collisions, 1 row-gather/level)   — r4: 20.11 dB
#   cell  ( 8-vertex collisions, 1 row-gather/level)   — this script
#   mixed ( 1-vertex collisions, 8 gathers/hashed lvl) — this script
#   exact ( 1-vertex collisions, 8 gathers/EVERY lvl)  — r4: 23.31 dB
# Then two longer probes: p3i at the recipe lr (VERDICT item 10 — part 3
# has had zero at-scale numbers for four rounds; this de-risks the chip
# run) and the part-4 cell arm (the layout part4 would actually ship if
# cell wins: brick-speed descriptors + fine granularity).
#
# Serialized after tools/cpu_hedge2.sh (single CPU core): waits for
# P4_AB_SUMMARY.md, which hedge2 writes after both part-4 arms. Pauses
# while a relay port listens (chip work owns the box then). Commits
# evidence after every job.
#
# Usage: setsid nohup bash tools/ab_cpu3.sh > /tmp/ab_cpu3.log 2>&1 &
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

echo "[ab3] $(date -u +%H:%M:%S) waiting for cpu_hedge2 (P4_AB_SUMMARY.md)"
while [ ! -f "$HQ/P4_AB_SUMMARY.md" ]; do sleep 60; done

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

job() {  # job NAME TIMEOUT CMD...  (relay-yielding, idempotent, committed)
  local name=$1 tmo=$2; shift 2
  [ -e "$OUT/$name.done" ] && { echo "[ab3] $name done, skip"; return 0; }
  echo "[ab3] $(date -u +%H:%M:%S) START $name"
  env JAX_PLATFORMS=cpu timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  local pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[ab3] pausing $name (relay up)"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[ab3] resuming $name"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"; local rc=$?
  echo "[ab3] $(date -u +%H:%M:%S) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$OUT/$name.done"
  summarize
  for _ in 1 2 3; do
    git add "$OUT" 2>/dev/null \
      && git commit -q -m "CPU layout A/B: $name rc=$rc" && break
    sleep 5
  done
}

summarize() {
  {
    echo "# CPU hash-layout A/B — the collision-granularity ladder"
    echo
    echo "part2_instant, 500 steps, lego_proxy ds8, identical recipe/seed,"
    echo "byte-parity tables (2^19 vertex-scalars x F=2 per hashed level)."
    echo "brick/exact/brick20 rows are the round-4 arms (committed logs);"
    echo "mixed/cell are the round-5 layouts. Granularity = vertices that"
    echo "share a hash-collision fate; descriptors = gathers per"
    echo "point-level on the hashed levels."
    echo
    echo "| arm | granularity | descriptors | logs |"
    echo "|---|---|---|---|"
    echo "| brick | 64 | 1 row | r4 |"
    echo "| brick20 | 64 (2x capacity) | 1 row | r4 |"
    echo "| cell | 8 | 1 row | r5 |"
    echo "| mixed | 1 | 8 vertex | r5 |"
    echo "| exact | 1 | 8 vertex (all levels) | r4 |"
    echo
    echo "Collected $(date -u +%Y-%m-%dT%H:%MZ)."
    echo
    for arm in brick brick20 exact mixed cell; do
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

# ---- 1-2: the two new part2i arms ---------------------------------------
for arm in mixed cell; do
  mk_p2i "$arm"
  cp "$AB/$arm.yaml" "$OUT/$arm.yaml"
  job "p2i_$arm" 14400 python run.py --config "$AB/$arm.yaml" \
    --data_dir data_scenes/lego_proxy
done

# ---- 3: part-1 on a genuinely hard target (VERDICT r4 weak item 7):
# real natural photograph, max dim 512, 2-point L_embed sweep ----------
job part1_photo_hd 7200 python run.py \
  --config configs/r5/part1_photo_hd.yaml \
  --image data_scenes/photo/grace_hopper.jpg

# ---- 4: p3i 1k-step probe at the recipe lr (exact layout: the known
# quality arm and the FASTEST layout on CPU — 5 s/step vs brick's 56) ----
if [ ! -e "$OUT/p3i_probe.done" ]; then
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
    "random_bg_start": 200,
    "log_dir": "/tmp/ab_cpu/p3i_probe",
})
yaml.safe_dump(cfg, open("/tmp/ab_cpu/p3i_probe.yaml", "w"))
EOF
  cp "$AB/p3i_probe.yaml" "$OUT/p3i_probe.yaml"
fi
job p3i_probe 18000 python run.py --config "$AB/p3i_probe.yaml" \
  --data_dir data_scenes/dyn_proxy --render_n 5

# ---- 4: part-4 cell arm (same protocol as cpu_hedge2's brick/exact) -----
if [ ! -e "$OUT/p4cell_train.done" ]; then
  python3 - <<'EOF'
import yaml
cfg = yaml.safe_load(open("configs/r4/part4_scale.yaml"))
cfg.update({
    "hash_impl": "cell",
    "downscale": 8,
    "train_iters": 500,
    "batch_size": 2048,
    "log_every": 100,
    "val_every": 250,
    "save_every": 250,
    "grid_warmup_iters": 128,
    "random_bg_start": 100,
    "chunk": 20000,
    "seed": 0,
    "log_dir": "/tmp/p4_ab/p4cell",
})
yaml.safe_dump(cfg, open("/tmp/p4_ab/p4cell.yaml", "w"))
EOF
  cp /tmp/p4_ab/p4cell.yaml "$OUT/p4cell.yaml"
fi
job p4cell_train 21600 python run.py --config /tmp/p4_ab/p4cell.yaml \
  --data_dir data_scenes/dyn_proxy
if [ -f /tmp/p4_ab/p4cell/dyn_proxy/best_model.pth ]; then
  job p4cell_eval 3600 python run.py --config /tmp/p4_ab/p4cell.yaml \
    --data_dir data_scenes/dyn_proxy --eval_only --render_n 0 \
    --checkpoint /tmp/p4_ab/p4cell/dyn_proxy/best_model.pth
fi

python tools/collect_results.py || true
for _ in 1 2 3; do
  git add "$OUT" output/queue_logs 2>/dev/null \
    && git commit -q -m "CPU layout A/B stage 3 complete (mixed/cell arms + p3i probe + part-4 cell)" && break
  sleep 5
done
echo "[ab3] $(date -u +%H:%M:%S) complete"
