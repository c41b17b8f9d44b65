"""A/B the defer-and-batch overflow window on the uniform 100k fixture.

Methodology matches BENCHMARKS.md "Round-3 100k clean numbers": same
process (warm = second+ build, XLA executables cached), bf16/e2 default
geometry, MSE_BUILD_PROFILE per-phase split, recall@10 vs the exact MXU
top-k. Run on the real TPU with the 1e7 job paused (one TPU job at a
time).
"""
import os
import time

import numpy as np

os.environ["MSE_BUILD_PROFILE"] = "1"

from meme_search_engine_tpu.index import vamana as V
from meme_search_engine_tpu.ops.mips import mips_topk

N, D = 100_000, 1152
rng = np.random.default_rng(0)
vectors = rng.standard_normal((N, D)).astype(np.float32)
vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)

qs = vectors[:512]
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
