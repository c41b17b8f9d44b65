#!/bin/sh
# Leak-capped build loop for many-shard scale_bench runs.
#
# The TPU tunnel plugin retains ~19 KB of host memory per spill-record
# transferred during graph build (BENCHMARKS.md round-3/4 diagnosis:
# not jax arrays, not reachable numpy, not reclaimable glibc arena), so
# an unbounded 1e7 build OOMs around shard 133. --max-build-records
# makes scale_bench exit 3 at the cap; this wrapper restarts a fresh
# process. Every stage checkpoints to the workdir and the persistent
# XLA compile cache (<workdir>/.jaxcache) makes restarts cheap.
#
# The PAUSE file is the cooperative chip handoff (utils/tpu_lease.py):
# a client that paused the previous pass keeps the chip until it
# removes <workdir>/PAUSE, so this wrapper also holds between passes.
#
# Usage: scripts/run_build.sh <workdir> [scale_bench args...]
set -u
WD="$1"; shift
while :; do
  while [ -e "$WD/PAUSE" ]; do sleep 5; done
  python -m meme_search_engine_tpu.tools.scale_bench --workdir "$WD" "$@"
  rc=$?
  [ $rc -eq 3 ] || exit $rc
  echo "[run_build] pass exited 3 (leak cap); restarting fresh process" >&2
done
