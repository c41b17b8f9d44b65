#!/bin/sh
# Conditional deadline backstop for a resumed scale_bench build loop.
#
# At <cutoff_epoch>: if all shards are built and nothing is running,
# the stage-all tail already packed+evaluated — do nothing. Otherwise
# (build or tail still in flight, or the loop died mid-way) run the
# standard timed cutover so the round always ends with a fresh
# pack/serve/eval over whatever was built.
#
# Usage: scripts/backstop_tail.sh <workdir> <cutoff_epoch> <wrapper_pid> \
#          <total_shards> [scale_bench args for the tail...]
set -u
WD="$1"; CUTOFF="$2"; WRAP="$3"; TOTAL="$4"; shift 4

now=$(date +%s)
[ "$now" -lt "$CUTOFF" ] && sleep $((CUTOFF - now))

GRAPHS=$(ls "$WD"/shards/*.graph 2>/dev/null | wc -l)
if [ "$GRAPHS" -ge "$TOTAL" ] && [ ! -e /root/repo/.tpu_busy.json ] \
   && ! kill -0 "$WRAP" 2>/dev/null; then
  echo "[backstop] build+tail already complete ($GRAPHS/$TOTAL); no-op" >&2
  exit 0
fi
echo "[backstop] deadline with $GRAPHS/$TOTAL graphs; cutting over" >&2
exec sh "$(dirname "$0")/cutover_tail.sh" "$WD" 0 "$WRAP" "$@"
