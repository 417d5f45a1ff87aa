#!/bin/bash
# CPU hedge queue: evidence rows that survive a permanently-dead tunnel.
#
# Runs strictly after tools/ab_cpu2.sh finishes (single CPU core —
# serialize everything), pauses while a relay port listens (chip work
# owns the core then), and commits each job's evidence. Jobs are
# idempotent via output/cpu_hedge/<name>.done markers.
#
# Usage: setsid nohup bash tools/cpu_hedge.sh > /tmp/cpu_hedge.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
HQ=output/cpu_hedge
mkdir -p "$HQ"

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

# wait for the A/B follow-up runner to release the core
while [ -f /tmp/ab_cpu/runner2.log ] \
    && ! grep -q "\[ab2\].*complete" /tmp/ab_cpu/runner2.log; do
  sleep 60
done

job() {  # job NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  [ -e "$HQ/$name.done" ] && { echo "[hedge] $name done, skip"; return 0; }
  echo "[hedge] $(date -u +%H:%M:%S) START $name"
  env JAX_PLATFORMS=cpu timeout "$tmo" "$@" > "$HQ/$name.log" 2>&1 &
  local pid=$! stopped=0
  while kill -0 "$pid" 2>/dev/null; do
    if relay_up; then
      if [ "$stopped" -eq 0 ]; then
        echo "[hedge] pausing $name (relay up)"
        pkill -STOP -P "$pid" 2>/dev/null; kill -STOP "$pid" 2>/dev/null
        stopped=1
      fi
    elif [ "$stopped" -eq 1 ]; then
      echo "[hedge] resuming $name"
      kill -CONT "$pid" 2>/dev/null; pkill -CONT -P "$pid" 2>/dev/null
      stopped=0
    fi
    sleep 30
  done
  wait "$pid"; local rc=$?
  echo "[hedge] $(date -u +%H:%M:%S) END $name rc=$rc"
  [ $rc -eq 0 ] && touch "$HQ/$name.done"
  for _ in 1 2 3; do
    git add "$HQ" output/part1_cpu 2>/dev/null \
      && git commit -q -m "CPU hedge: $name rc=$rc" && break
    sleep 5
  done
}

job part1_photo_cpu 7200 python run.py \
  --config configs/r4/part1_photo_cpu.yaml \
  --image data_scenes/lego_proxy/test/r_0.png

echo "[hedge] $(date -u +%H:%M:%S) hedge queue complete"
