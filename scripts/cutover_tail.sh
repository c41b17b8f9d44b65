#!/bin/sh
# Stop a run_build.sh shard-build loop at a deadline and run the
# partial-coverage tail (OPQ/pack/serve/eval) on whatever was built.
#
# Under a fixed chip-time budget the optimal split is: build shards in
# greedy set-cover order until (deadline - tail_cost), then cut over to
# `scale_bench --partial-tail`.  This script automates the cutover so
# the tail cannot be squeezed out by a long-running build: it pauses
# the build at a safe point (utils/tpu_lease.py PAUSE protocol — every
# shard/stage write is tmp+rename atomic, so killing a parked build
# loses nothing), kills the wrapper+child, and launches the tail.
#
# Usage: scripts/cutover_tail.sh <workdir> <cutoff_epoch> <wrapper_pid> \
#          [scale_bench args for the tail...]
set -u
WD="$1"; CUTOFF="$2"; WRAP="$3"; shift 3

now=$(date +%s)
[ "$now" -lt "$CUTOFF" ] && sleep $((CUTOFF - now))

echo "[cutover] deadline reached, pausing build" >&2
touch "$WD/PAUSE"
i=0
while [ $i -lt 180 ]; do
  [ -e "$WD/PAUSED" ] && break
  # the child may have exited (leak-cap restart window): wrapper sleeps
  # on PAUSE, nothing to park
  CHILD=$(python -c "import json,sys;print(json.load(open('/root/repo/.tpu_busy.json'))['pid'])" 2>/dev/null || echo "")
  if [ -n "$CHILD" ] && ! kill -0 "$CHILD" 2>/dev/null; then break; fi
  sleep 5; i=$((i + 1))
done

CHILD=$(python -c "import json,sys;print(json.load(open('/root/repo/.tpu_busy.json'))['pid'])" 2>/dev/null || echo "")
kill "$WRAP" 2>/dev/null
[ -n "$CHILD" ] && kill "$CHILD" 2>/dev/null
sleep 5
[ -n "$CHILD" ] && kill -9 "$CHILD" 2>/dev/null
rm -f "$WD/PAUSE" "$WD/PAUSED" /root/repo/.tpu_busy.json

echo "[cutover] build stopped ($(ls "$WD"/shards/*.graph 2>/dev/null | wc -l) graphs); launching tail" >&2
exec python -m meme_search_engine_tpu.tools.scale_bench \
  --workdir "$WD" --partial-tail "$@"
