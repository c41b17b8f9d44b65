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


def stream_main(args):
    """Bounded-memory generator for N where full arrays don't fit:
    writes records chunk-by-chunk (no pack_index list-of-lists)."""
    from ..index.opq import ProductQuantizer
    from ..pipeline.formats import (
        RECORD_PAD_SIZE,
        IndexHeader,
        PackedIndexEntry,
    )

    rng = np.random.default_rng(args.seed)
    n, d = args.n, args.d
    t0 = time.time()
    os.makedirs(args.out, exist_ok=True)

    q, _ = np.linalg.qr(rng.standard_normal((d, d)).astype(np.float32))
    first = rng.standard_normal((4096, d)).astype(np.float32)
    first /= np.linalg.norm(first, axis=1, keepdims=True)
    centroids = (first[:256] @ q.T).astype(np.float32)
    quantizer = ProductQuantizer(
        centroids=centroids,
        transform=q.astype(np.float32),
        n_dims_per_code=d // args.chunks,
        n_dims=d,
    )
    shard_centroids = first[256 : 256 + args.shards]
    shard_medioids = rng.integers(0, n, args.shards).tolist()

    chunk = 32768
    with open(os.path.join(args.out, "index.bin"), "wb") as recf, open(
        os.path.join(args.out, "index.pq-codes.bin"), "wb"
    ) as pqf, open(
        os.path.join(args.out, "index.descriptor-codes.bin"), "wb"
    ) as descf:
        for start in range(0, n, chunk):
            end = min(n, start + chunk)
            b = end - start
            vecs = rng.standard_normal((b, d)).astype(np.float32)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            codes = quantizer.quantize(vecs)
            pqf.write(np.ascontiguousarray(codes).tobytes())
            descf.write(rng.integers(0, 256, (b, 4), dtype=np.uint8).tobytes())
            adj = rng.integers(0, n, (b, args.r), dtype=np.int64)
            for i in range(b):
                gid = start + i
                recf.write(
                    PackedIndexEntry(
                        id=gid,
                        vector=vecs[i],
                        vertices=adj[i].tolist(),
                        timestamp=1700000000 + gid,
                        dimensions=(640, 480),
                        scores=[0.0, 0.0, 0.0],
                        url=f"https://cdn.example.com/{gid}.png",
                        shards=[int(gid % args.shards)],
                    ).pack(RECORD_PAD_SIZE)
                )
            if (start // chunk) % 16 == 0:
                print(f"{end}/{n} records ({time.time()-t0:.0f}s)", flush=True)

    header = IndexHeader(
        shards=[
            (list(map(float, c)), int(m))
            for c, m in zip(shard_centroids, shard_medioids)
        ],
        count=n,
        dead_count=0,
        record_pad_size=RECORD_PAD_SIZE,
        quantizer={
            "centroids": quantizer.centroids.flatten().tolist(),
            "transform": quantizer.transform.flatten().tolist(),
            "n_dims_per_code": quantizer.n_dims_per_code,
            "n_dims": d,
        },
        descriptor_cdfs=[],
    )
    header.save(os.path.join(args.out, "index.msgpack"))
    print(f"done in {time.time() - t0:.0f}s -> {args.out}", flush=True)


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
    ap.add_argument("--stream", action="store_true",
                    help="bounded-memory streaming mode (for N >= 1e7)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.stream:
        return stream_main(args)

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
