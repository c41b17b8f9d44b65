"""Generate a production-geometry disk index from synthetic data.

Serving-capacity measurement scaffolding: beam-search QPS is a function
of record IO + per-hop frontier work, both of which are capped by
``search_list`` regardless of graph quality, so a synthetic index with
random adjacency and sample-point PQ centroids exercises the EXACT
per-query cost structure of a real one (4096-B records, fp16 vectors,
R out-edges, 64-chunk OPQ codes, descriptor bytes) at any N without a
multi-hour build. Used for the QPS-vs-threads curves in BENCHMARKS.md;
recall numbers from a synthetic index are meaningless and never
reported.

Usage:
  python -m meme_search_engine_tpu.tools.synth_disk_index \
      --out /data/synth1m --n 1000000 [--d 1152] [--r 64] [--shards 42]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=1152)
    ap.add_argument("--r", type=int, default=64)
    ap.add_argument("--shards", type=int, default=42)
    ap.add_argument("--chunks", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-flat", action="store_true",
                    help="also write vectors.f16 next to the index")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ..index.opq import ProductQuantizer
    from ..pipeline import processor

    rng = np.random.default_rng(args.seed)
    n, d = args.n, args.d
    t0 = time.time()

    print(f"generating {n} x {d} corpus...", flush=True)
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    vectors = vectors.astype(np.float16)

    # quantizer: random orthonormal rotation + sample-point centroids —
    # ADC scores correlate with true dots (frontier ordering behaves),
    # without an OPQ training run
    q, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float32))
    centroids = vectors[rng.permutation(n)[:256]].astype(np.float32) @ q.T
    quantizer = ProductQuantizer(
        centroids=centroids,
        transform=q.astype(np.float32),
        n_dims_per_code=d // args.chunks,
        n_dims=d,
    )

    print("adjacency + manifest...", flush=True)
    adj = rng.integers(0, n, (n, args.r), dtype=np.int64)
    shard_of = rng.integers(0, args.shards, n)
    vertices = adj.tolist()
    node_shards = [[int(s)] for s in shard_of]
    manifest = [
        {"timestamp": 1700000000 + i, "url": f"https://cdn.example.com/{i}.png",
         "dimensions": (640, 480)}
        for i in range(n)
    ]
    scores = rng.standard_normal((n, 3)).astype(np.float32)
    shard_centroids = vectors[rng.permutation(n)[: args.shards]].astype(
        np.float32
    )
    shard_medioids = rng.permutation(n)[: args.shards].tolist()

    print("packing records...", flush=True)
    from ..pipeline.descriptors import compute_cdfs

    cdfs = compute_cdfs(scores, [m["timestamp"] for m in manifest])
    processor.pack_index(
        args.out,
        vectors,
        vertices,
        node_shards,
        manifest,
        quantizer,
        shard_centroids,
        shard_medioids,
        scores=scores,
        descriptor_cdfs=cdfs,
    )
    if args.save_flat:
        vectors.tofile(os.path.join(args.out, "vectors.f16"))
    print(f"done in {time.time() - t0:.0f}s -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
