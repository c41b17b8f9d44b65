"""Pre-build vectors.f16 on the idle host while shard builds hold the chip.

The scale_bench tail's collect stage (tools/scale_bench.py, "collecting
vectors for OPQ/pack") is pure host work: stream every shard input and
scatter fp16 rows into a flat (n, 1152) file in global-id order.  On
this 1-core host it costs ~20 min that would otherwise serialise after
the last shard build.  Running it concurrently is safe: shard inputs
are immutable after the split stage, the build loop only reads them,
and the tail skips collect when vectors.f16 already exists (writes go
to .tmp + rename, so a partial run is invisible).

Byte-identical to the tail's collect: same iteration order, same
np.zeros initialisation, same fp16 scatter (each record id is written
once per spill shard with the same vector, so order cannot matter).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from meme_search_engine_tpu.pipeline.formats import read_shard_input  # noqa: E402
from meme_search_engine_tpu.tools.scale_bench import D_EMB  # noqa: E402


def main():
    wd = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale1e7"
    clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 420
    manifest = np.load(os.path.join(wd, "manifest.npy"), allow_pickle=True)
    n_total = len(manifest)
    del manifest
    flat_path = os.path.join(wd, "vectors.f16")
    if os.path.exists(flat_path):
        print("vectors.f16 already exists; nothing to do")
        return
    t0 = time.time()
    vectors = np.zeros((n_total, D_EMB), np.float16)
    for s in range(clusters):
        in_path = os.path.join(wd, "shards", f"shard_{s}.msgpack")
        if not os.path.exists(in_path):
            continue
        _h, records = read_shard_input(in_path)
        for rid, vec in records:
            vectors[rid] = vec
        if s % 40 == 0:
            print(f"shard {s} at +{time.time() - t0:.0f}s", flush=True)
    vectors.tofile(flat_path + ".tmp")
    os.rename(flat_path + ".tmp", flat_path)
    print(f"collect: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
