"""Maximum-inner-product search over an HBM-resident fp16 corpus.

This replaces the reference's two brute-force paths — FAISS
``ScalarQuantizerIndexImpl`` QT_fp16 inner-product (src/main.rs:821-827)
and the AVX2 ``fast_dot`` kernels (diskann/src/vector.rs:192-306) — with
the TPU equivalent: the corpus lives in HBM as fp16, and queries scan it
as a tiled MXU matmul fused with top-k selection, so per-tile score
tensors never round-trip through HBM.

:func:`mips_topk` is a ``lax.scan`` over corpus tiles; each tile does
(upcast -> matmul -> top-k -> merge with running top-k). XLA pipelines
the HBM tile reads against the MXU; the running (B, k) state stays in
registers/VMEM. At 1e5x1152 it runs at HBM-bandwidth roofline, which is
the speed-of-light for this op (measured 31k QPS at 1e5/k=20,
BENCHMARKS.md), so a hand-scheduled kernel has no headroom here.

Scores are fp32 inner products (the reference orders by i64 fixed-point
f32*2^32, vector.rs:45-47 — a total-order trick, not extra precision;
fp32 + stable index tie-break gives the same ranking within fp
tolerance).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["mips_topk", "exact_scores", "streamed_mips_topk"]


def exact_scores(corpus: jax.Array, queries: jax.Array) -> jax.Array:
    """(N,D) x (B,D) -> (B,N) fp32 inner products. Brute-force oracle."""
    return jnp.einsum(
        "nd,bd->bn",
        corpus.astype(jnp.float32),
        queries.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def mips_topk(
    corpus: jax.Array,
    queries: jax.Array,
    k: int,
    *,
    tile: int = 16384,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k inner-product search.

    Args:
      corpus: (N, D) fp16/bf16/fp32 vectors resident in HBM.
      queries: (B, D) fp32 query vectors (weighted fusion output).
      k: number of results per query.
      tile: corpus rows per scan step; tile*D*2 bytes stream per step.

    Returns:
      (scores, indices): each (B, k), scores fp32 descending, indices
      int32 into the corpus. Out-of-range pad rows never win (scores
      -inf).
    """
    n, d = corpus.shape
    b = queries.shape[0]
    k_eff = min(k, n)
    qf = queries.astype(jnp.float32)

    pad = (-n) % tile
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    n_tiles = corpus.shape[0] // tile
    tiles = corpus.reshape(n_tiles, tile, d)

    kt = min(k_eff, tile)

    def step(carry, inp):
        best_s, best_i = carry
        tile_vecs, tile_idx = inp
        # fp16 -> fp32 upcast fuses into the matmul read
        s = jnp.einsum(
            "td,bd->bt",
            tile_vecs.astype(jnp.float32),
            qf,
            preferred_element_type=jnp.float32,
        )
        base = tile_idx * tile
        valid = (base + jnp.arange(tile)) < n
        s = jnp.where(valid[None, :], s, -jnp.inf)
        ts, ti = jax.lax.top_k(s, kt)
        ti = ti + base
        # merge running top-k with this tile's top-k
        ms = jnp.concatenate([best_s, ts], axis=1)
        mi = jnp.concatenate([best_i, ti], axis=1)
        sel_s, sel_pos = jax.lax.top_k(ms, k_eff)
        sel_i = jnp.take_along_axis(mi, sel_pos, axis=1)
        return (sel_s, sel_i), None

    init = (
        jnp.full((b, k_eff), -jnp.inf, jnp.float32),
        jnp.zeros((b, k_eff), jnp.int32),
    )
    (scores, indices), _ = jax.lax.scan(
        step, init, (tiles, jnp.arange(n_tiles))
    )
    return scores, indices.astype(jnp.int32)


def streamed_mips_topk(corpus_iter, queries, k, *, tile: int = 16384):
    """Exact top-k when the corpus exceeds device HBM.

    Streams host-resident corpus slabs through the device once (slab
    upload -> :func:`mips_topk` over the resident slab -> host merge),
    with ALL queries scored against each slab before the next upload —
    so a 1e7x1152 fp16 corpus (23 GB, vs 16 GB HBM on one v5e) costs one
    pass of host->device transfer total, not one per query chunk. Used
    by the disk-index eval oracle at N >= 1e7
    (query_disk_index.rs:225-343 computes the same ground truth by
    scanning all records on the host).

    Args:
      corpus_iter: iterable of (slab, base_row) where slab is a host
        (M, D) array (fp16 ok) and base_row its global row offset.
      queries: (B, D) host fp32 queries.
      k: results per query.
      tile: scan tile within each resident slab.

    Returns:
      (scores, indices) host arrays, each (B, k), globally exact.
    """
    import numpy as np

    qdev = jnp.asarray(np.asarray(queries, np.float32))
    b = qdev.shape[0]
    best_s = np.full((b, k), -np.inf, np.float32)
    best_i = np.zeros((b, k), np.int64)
    for slab, base in corpus_iter:
        sdev = jnp.asarray(slab)
        s, i = mips_topk(sdev, qdev, k, tile=min(tile, slab.shape[0]))
        s = np.asarray(s)
        i = np.asarray(i).astype(np.int64) + int(base)
        ms = np.concatenate([best_s, s], axis=1)
        mi = np.concatenate([best_i, i], axis=1)
        sel = np.argsort(-ms, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(ms, sel, axis=1)
        best_i = np.take_along_axis(mi, sel, axis=1)
        # free the slab before the next upload (HBM holds one slab +
        # the running (B, k) state only)
        sdev.delete()
    return best_s, best_i


def dedup_matches(
    embeddings: jax.Array,
    scores: jax.Array,
    threshold: float = 0.95,
) -> jax.Array:
    """Result de-duplication mask via pairwise similarity.

    The reference drops results whose embedding has cosine > 0.95 with a
    higher-ranked result, computed as an n^2 sgemm over visited
    embeddings (query_disk_index.rs:99,486-527). Here it is one MXU
    matmul + a causal comparison.

    Args:
      embeddings: (M, D) fp candidate embeddings, ranked best-first.
      scores: (M,) their scores (used only to define rank order).
      threshold: similarity above which a lower-ranked item is dropped.

    Returns:
      (M,) bool mask — True = keep.
    """
    e = embeddings.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-30)
    order = jnp.argsort(-scores)
    es = e[order]
    sim = jnp.dot(es, es.T, preferred_element_type=jnp.float32)
    m = es.shape[0]
    pos = jnp.arange(m)

    # greedy retain (query_disk_index.rs:514-527): item i is dropped only
    # if similar to an already-KEPT higher-ranked item, so chains A>B>C
    # with sim(A,B)>t, sim(B,C)>t, sim(A,C)<=t keep C. Inherently
    # sequential in rank — one fori_loop over the (M, M) sim matrix.
    def body(i, kept):
        dominated = jnp.any(
            jnp.logical_and(kept, (sim[i] > threshold) & (pos < i))
        )
        return kept.at[i].set(~dominated)

    kept_sorted = jax.lax.fori_loop(0, m, body, jnp.zeros((m,), bool))
    return jnp.zeros((m,), bool).at[order].set(kept_sorted)
