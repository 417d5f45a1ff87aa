#!/bin/bash
# CPU hedge, stage 2: part-4 exact-vs-brick hash-layout A/B.
#
# The part2_instant CPU A/B (tools/ab_cpu.sh + ab_cpu2.sh) found the
# exact Instant-NGP hash layout leading the brick-row layout by ~3 dB at
# 500 steps / downscale 8. Part 4 is the round's largest quality gap
# (22.66 vs the 30 dB gate) and uses FOUR hash fields (3 deform + 1
# canonical), so the layout choice compounds there. This measures the
# same A/B on the part-4 recipe (dyn_proxy, ds8, 500 steps, same seed)
# so the exact-layout flip decision for part4 has direct evidence even
# if the TPU tunnel never returns this round.
#
# Serialization: waits for tools/ab_cpu2.sh AND tools/cpu_hedge.sh to
# finish (single CPU core), pauses while a relay port listens (chip work
# owns the core then), commits evidence after each arm.
#
# Usage: setsid nohup bash tools/cpu_hedge2.sh > /tmp/cpu_hedge2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
HQ=output/cpu_hedge
AB=/tmp/p4_ab
mkdir -p "$HQ" "$AB"

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

# ---- wait for the earlier CPU runners to release the core --------------
while [ -f /tmp/ab_cpu/runner2.log ] \
    && ! grep -q "\[ab2\].*complete" /tmp/ab_cpu/runner2.log; do
  sleep 60
done
while [ -f /tmp/cpu_hedge.log ] \
    && ! grep -q "hedge queue complete" /tmp/cpu_hedge.log \
    && [ ! -e "$HQ/part1_photo_cpu.done" ]; do
  sleep 60
done

# ---- derive the two arms from the at-scale config -----------------------
mk_cfg() {  # mk_cfg NAME HASH_IMPL
  python3 - "$1" "$2" <<'EOF'
import sys, yaml
name, impl = sys.argv[1], sys.argv[2]
cfg = yaml.safe_load(open("configs/r4/part4_scale.yaml"))
cfg.update({
    "hash_impl": impl,
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
    "log_dir": f"/tmp/p4_ab/{name}",
})
yaml.safe_dump(cfg, open(f"/tmp/p4_ab/{name}.yaml", "w"))
EOF
}

job() {  # job NAME CFG EXTRA_ARGS...
  local name=$1; shift
  [ -e "$HQ/$name.done" ] && { echo "[hedge2] $name done, skip"; return 0; }
  echo "[hedge2] $(date -u +%H:%M:%S) START $name"
  env JAX_PLATFORMS=cpu timeout 21600 "$@" > "$HQ/$name.log" 2>&1 &
  local pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[hedge2] pausing $name (relay up)"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[hedge2] resuming $name"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"; local rc=$?
  echo "[hedge2] $(date -u +%H:%M:%S) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$HQ/$name.done"
  for _ in 1 2 3; do
    git add "$HQ" 2>/dev/null \
      && git commit -q -m "CPU hedge: $name rc=$rc" && break
    sleep 5
  done
}

for arm in brick exact; do
  mk_cfg "p4$arm" "$arm"
  job "p4${arm}_train" python run.py --config "$AB/p4$arm.yaml" \
    --data_dir data_scenes/dyn_proxy
  if [ -f "/tmp/p4_ab/p4$arm/dyn_proxy/best_model.pth" ]; then
    job "p4${arm}_eval" python run.py --config "$AB/p4$arm.yaml" \
      --data_dir data_scenes/dyn_proxy --eval_only --render_n 0 \
      --checkpoint "/tmp/p4_ab/p4$arm/dyn_proxy/best_model.pth"
  fi
done

# ---- summary -------------------------------------------------------------
{
  echo "# Part-4 CPU exact-vs-brick hash-layout A/B (500 steps, dyn_proxy ds8)"
  echo
  echo "Same recipe/seed per arm (configs/r4/part4_scale.yaml shrunk to"
  echo "CPU scale); hash_impl flips all four hash fields (3 deform grids"
  echo "+ canonical). Collected $(date -u +%Y-%m-%dT%H:%MZ)."
  echo
  for arm in brick exact; do
    echo "## $arm"
    for suff in train eval; do
      [ -f "$HQ/p4${arm}_$suff.log" ] || continue
      grep -E ">>> Step (100|200|300|400|500)/|best val PSNR|test PSNR" \
        "$HQ/p4${arm}_$suff.log" | sed 's/^/    /'
    done
    echo
  done
} > "$HQ/P4_AB_SUMMARY.md"

for _ in 1 2 3; do
  git add "$HQ" 2>/dev/null \
    && git commit -q -m "CPU hedge: part-4 hash-layout A/B summary" && break
  sleep 5
done
echo "[hedge2] $(date -u +%H:%M:%S) complete"
