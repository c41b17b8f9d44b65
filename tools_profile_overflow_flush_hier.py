"""A/B the defer-and-batch overflow window on the HIERARCHICAL 100k
fixture (VERDICT r3 weak #3: the flush=8 default was justified only on
the adversarial uniform fixture; this is the realistic regime — the
same generator the 1e6/1e7 pipeline fixtures use).

Methodology matches tools_profile_overflow_flush.py: same process
(warm = second+ build), bf16/e2 default geometry, recall@10 vs the
exact MXU top-k, plus held-out queries drawn near the same fine
centres (the serving-shaped workload). Run on the real TPU with the
1e7 job paused (one TPU job at a time).
"""
import os
import time

import numpy as np

os.environ["MSE_BUILD_PROFILE"] = "1"

from meme_search_engine_tpu.index import vamana as V
from meme_search_engine_tpu.ops.mips import mips_topk
from meme_search_engine_tpu.tools.scale_bench import (
    _hier_centers,
    _hier_points,
)

N = 100_000
_supers, fines = _hier_centers(N)
rng = np.random.default_rng(0)
vectors = _hier_points(fines, rng.integers(0, len(fines), N), rng)

# held-out queries near the same fine centres (realistic workload)
qrng = np.random.default_rng(1234)
qs = _hier_points(fines, qrng.integers(0, len(fines), 512), qrng)
exact = np.asarray(mips_topk(vectors, qs, 10)[1])

runs = [("cold", 8), ("warm", 8), ("warm", 1)]
for label, flush in runs:
    cfg = V.VamanaConfig(overflow_flush_rounds=flush)
    t0 = time.perf_counter()
    graph = V.build_graph(vectors, cfg, seed=0)
    dt = time.perf_counter() - t0
    _, ids, _ = V.search(vectors, graph, qs, 10, cfg)
    hits = sum(len(set(ids[i]) & set(exact[i])) for i in range(len(qs)))
    recall = hits / (len(qs) * 10)
    deg = (graph >= 0).sum(axis=1)
    print(
        f"RESULT flush={flush} ({label}): build {dt:.1f}s "
        f"recall@10 {recall:.4f} mean_deg {deg.mean():.1f}",
        flush=True,
    )
