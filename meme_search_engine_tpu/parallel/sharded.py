"""Corpus-sharded multi-chip MIPS search.

The TPU analogue of the reference's shard-level index parallelism
(SURVEY SS2.10 P8: per-shard searches merged by rank,
query_disk_index.rs:281-318) and of "scaling the long dimension"
(SURVEY SS5): the corpus row dimension is sharded across the mesh, each
chip scans its HBM-resident slice with the fused MIPS top-k kernel, and
per-chip top-k candidates are all-gathered over ICI and rank-merged —
k*n_devices values cross the interconnect instead of the corpus.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.mips import mips_topk
from .mesh import DATA

__all__ = ["ShardedFlatIndex", "sharded_mips_topk"]


@functools.partial(jax.jit, static_argnames=("k", "mesh", "tile"))
def sharded_mips_topk(
    corpus: jax.Array,
    queries: jax.Array,
    k: int,
    mesh: Mesh,
    tile: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """corpus (N, D) sharded over mesh axis DATA; queries replicated.

    Returns (scores, global indices), both (B, k).
    """
    n, d = corpus.shape
    n_shards = mesh.shape[DATA]
    shard_rows = n // n_shards

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def search(local_corpus, q):
        local_k = min(k, local_corpus.shape[0])
        s, i = mips_topk(local_corpus, q, local_k, tile=min(tile, shard_rows))
        shard_id = jax.lax.axis_index(DATA)
        gi = i + shard_id * shard_rows
        # gather every shard's candidates, then rank-merge
        all_s = jax.lax.all_gather(s, DATA, axis=0)  # (S, B, k')
        all_i = jax.lax.all_gather(gi, DATA, axis=0)
        b = q.shape[0]
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, -1)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, -1)
        top_s, pos = jax.lax.top_k(all_s, min(k, all_s.shape[1]))
        top_i = jnp.take_along_axis(all_i, pos, axis=1)
        return top_s, top_i

    return search(corpus, queries.astype(jnp.float32))


class ShardedFlatIndex:
    """Flat index whose rows are sharded across all devices of a mesh.

    Rows are padded to a multiple of the shard count with -inf-scoring
    sentinels (zero vectors are excluded by index masking on the host).
    """

    def __init__(self, vectors: np.ndarray, mesh: Mesh, tile: int = 8192):
        self.mesh = mesh
        self.n = vectors.shape[0]
        n_shards = mesh.shape[DATA]
        pad = (-self.n) % n_shards
        if pad:
            vectors = np.concatenate(
                [vectors, np.zeros((pad, vectors.shape[1]), vectors.dtype)]
            )
        self.tile = tile
        sharding = NamedSharding(mesh, P(DATA, None))
        self.vectors = jax.device_put(
            jnp.asarray(vectors, jnp.float16), sharding
        )

    def search(self, queries: np.ndarray, k: int):
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        kq = min(k + 8, self.vectors.shape[0])  # slack for pad sentinels
        s, i = sharded_mips_topk(
            self.vectors, jnp.asarray(queries), kq, self.mesh, self.tile
        )
        s, i = np.asarray(s), np.asarray(i)
        out_s = np.empty((s.shape[0], min(k, self.n)), np.float32)
        out_i = np.empty_like(out_s, dtype=np.int64)
        for b in range(s.shape[0]):
            valid = i[b] < self.n
            out_s[b] = s[b][valid][: out_s.shape[1]]
            out_i[b] = i[b][valid][: out_s.shape[1]]
        return out_s, out_i
