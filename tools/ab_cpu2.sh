#!/bin/bash
# CPU A/B follow-up: the capacity-vs-seams decomposition arm.
#
# tools/ab_cpu.sh measures brick@19 vs exact@19 (equal parameter count).
# The brick layout differs from the exact Instant-NGP layout in THREE
# confounded ways: (a) unique-site capacity (64 slots per brick cover
# only 27 owned lattice sites -> ~2.37x redundancy), (b) collision
# granularity (whole 64-vertex bricks alias, not single vertices),
# (c) C0 seams between duplicated boundary vertices. Arm 3 (brick@20:
# one extra hashmap bit = 2x bricks ~= capacity parity with exact@19)
# separates (a) from (b)+(c):
#   brick20 ~= exact   -> the gap is capacity; brick is fixable with
#                         one config bit (part4 already ships log2=20).
#   brick20 ~= brick19 -> the gap is seams/granularity; exact is the
#                         quality default and brick the speed option.
#
# Runs strictly AFTER the first runner finishes (single CPU core), and
# pauses whenever a relay port listens (chip work owns the core then).
#
# Usage: setsid nohup bash tools/ab_cpu2.sh > /tmp/ab_cpu/runner2.log 2>&1 &
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

# ---- wait for the first runner's exact arm to finish -------------------
while ! grep -q "END exact" "$AB/runner.log" 2>/dev/null; do
  sleep 60
done
cp -f "$AB/exact.log" "$AB/exact.yaml" "$OUT/" 2>/dev/null || true

# ---- arm 3: brick layout with one extra hashmap bit --------------------
if [ ! -f "$AB/brick20.yaml" ]; then
  sed -e 's/^hash_impl: .*/hash_impl: brick/' \
      -e 's/^log2_hashmap_size: .*/log2_hashmap_size: 20/' \
      -e "s|^log_dir: .*|log_dir: $AB/brick20|" \
      "$AB/brick.yaml" > "$AB/brick20.yaml"
fi

if [ ! -e "$AB/brick20.done" ]; then
  rm -rf "$AB/brick20"
  echo "[ab2] $(date -u +%H:%M:%S) START brick20"
  env JAX_PLATFORMS=cpu timeout 14400 \
    python run.py --config "$AB/brick20.yaml" \
    --data_dir data_scenes/lego_proxy > "$AB/brick20.log" 2>&1 &
  pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[ab2] $(date -u +%H:%M:%S) relay up: pausing brick20"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[ab2] $(date -u +%H:%M:%S) relay down: resuming brick20"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"; rc=$?
  echo "[ab2] $(date -u +%H:%M:%S) END brick20 rc=$rc"
  [ $rc -eq 0 ] && touch "$AB/brick20.done"
fi
cp -f "$AB/brick20.log" "$AB/brick20.yaml" "$OUT/" 2>/dev/null || true

# ---- summary + evidence commit ------------------------------------------
{
  echo "# CPU exact-vs-brick hash-layout A/B (500 steps, lego_proxy ds8)"
  echo
  echo "Same recipe/seed per arm; equal param count for brick@19 vs"
  echo "exact@19; brick@20 doubles the brick budget (capacity-parity"
  echo "diagnostic). Collected $(date -u +%Y-%m-%dT%H:%MZ)."
  echo
  for arm in brick exact brick20; do
    [ -f "$OUT/$arm.log" ] || [ -f "$AB/$arm.log" ] || continue
    src="$OUT/$arm.log"; [ -f "$src" ] || src="$AB/$arm.log"
    echo "## $arm"
    grep -E ">>> Step (100|200|300|400|500)/|best val PSNR|test PSNR" \
      "$src" | sed 's/^/    /'
    echo
  done
} > "$OUT/SUMMARY.md"

for _ in 1 2 3; do
  git add "$OUT" 2>/dev/null \
    && git commit -q -m "CPU hash-layout A/B evidence (exact arm + brick@20 capacity diagnostic)" \
    && break
  sleep 5
done
echo "[ab2] $(date -u +%H:%M:%S) complete"
