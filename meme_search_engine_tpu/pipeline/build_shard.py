"""Per-shard Vamana build (generate-index-shard equivalent).

Parity with src/generate_index_shard.rs:43-168: read a shard input file
(ShardInputHeader + ShardedRecords), append OOD query vectors after the
base data (query_breakpoint = n_base, :71-94), random-fill, run 1-2
build passes, RobustStitch, and write raw adjacency + ShardHeader with
per-node offsets and the local->global id mapping.

The build itself is the TPU-batched Vamana from index/vamana.py.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..index import vamana
from .formats import ShardHeader, read_shard_input, write_shard_output

# reference defaults (generate_index_shard.rs:22-37)
DEFAULT_R = 64
DEFAULT_L = 192
DEFAULT_MAXC = 750


def build_shard(
    input_path: str,
    output_path: str,
    *,
    query_vectors: Optional[np.ndarray] = None,
    r: int = DEFAULT_R,
    l: int = DEFAULT_L,
    maxc: int = DEFAULT_MAXC,
    alpha: float = 1.0,
    query_alpha: float = 0.9,
    n_build_passes: int = 1,
    batch_size: int = 512,
    build_expand: int = 2,
    corpus_dtype: str = "bf16",
    seed: int = 0,
    pad_to: int = 0,
    verbose: bool = False,
) -> ShardHeader:
    header_in, records = read_shard_input(input_path)
    mapping = [rid for rid, _vec in records]
    base = np.stack([vec for _rid, vec in records]).astype(np.float32)
    n_base = len(base)

    if query_vectors is not None and len(query_vectors):
        vectors = np.concatenate(
            [base, np.asarray(query_vectors, np.float32)]
        )
    else:
        vectors = base

    if pad_to:
        # Round the total node count up to a multiple of pad_to with
        # extra random OOD query vectors. The jitted build kernels are
        # shaped by the corpus size, so a many-shard run (420 shards at
        # 1e7, each a slightly different size) would otherwise recompile
        # per shard; bucketing the size bounds compiles to the handful
        # of distinct buckets. Pad vectors ride the existing OOD
        # machinery (>= query_breakpoint: never returned for base
        # searches, pruned with query_alpha, and their in-edges are
        # removed by RobustStitch), so the emitted base adjacency is
        # unaffected beyond normal OOD-query side effects.
        short = -len(vectors) % pad_to
        if short:
            prng = np.random.default_rng(seed ^ 0x5EED)
            pad = prng.standard_normal((short, vectors.shape[1])).astype(
                np.float32
            )
            pad /= np.linalg.norm(pad, axis=1, keepdims=True)
            vectors = np.concatenate([vectors, pad])

    cfg = vamana.VamanaConfig(
        r=r,
        l=l,
        maxc=maxc,
        alpha=alpha,
        query_alpha=query_alpha,
        query_breakpoint=n_base,
        batch_size=batch_size,
        build_expand=build_expand,
        corpus_dtype=corpus_dtype,
    )
    # ONE corpus upload per shard, shared by every pass + stitch + the
    # medioid: each fp32/bf16 re-upload used to leak its size in host
    # RSS through the tunneled plugin (~19 KB/record/shard; audit in
    # tools_audit_build_uploads.py), and the corpus uploads were ~90%
    # of the build's uploaded bytes.
    corpus_dev = vamana._corpus_on_device(vectors, corpus_dtype)
    graph = vamana.random_fill(len(vectors), r, seed)
    for p in range(n_build_passes):
        graph = vamana.build_graph(
            vectors, cfg, seed=seed + p, graph=graph, verbose=verbose,
            corpus_dev=corpus_dev,
        )
    if len(vectors) > n_base:
        graph = vamana.robust_stitch(
            vectors, graph, cfg, corpus_dev=corpus_dev
        )

    med = vamana.medioid_dev(corpus_dev, n_base)
    adjacency = [row[row >= 0].astype(np.uint32) for row in graph[:n_base]]
    header = ShardHeader(
        id=header_in.id,
        max=n_base,
        centroid=header_in.centroid,
        medioid=int(med),
        offsets=[],  # filled by write_shard_output
        mapping=mapping,
    )
    write_shard_output(output_path, header, adjacency)
    return header
