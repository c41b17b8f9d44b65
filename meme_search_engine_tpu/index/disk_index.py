"""Disk-resident DiskANN index: beam search over 4096-byte node records.

Capability parity with src/query_disk_index.rs: shard selection by
centroid dot (:447-450), beam search with beamwidth-parallel node reads
(:144-212), PQ asymmetric-distance frontier scoring from mmap'd codes
(:189-207), descriptor-column slider scoring (:133-142), full-precision
rerank of visited nodes, cosine>0.95 result dedup (:99, 486-527), and an
offline evaluate mode (:225-343) printing rank stats + recall@20 +
PQ-comparison counts.

Runtime split (SURVEY SS2.10 P6): the whole per-query beam search —
record IO, msgpack parse, seen-bitmap, frontier ADC, exact fp16 dots,
top-beamwidth selection — runs GIL-free in native/diskio.cpp
(disknav_search) when the C++ reader is available; Python keeps only
per-query setup (the LUT GEMV) and final result assembly. A
numpy-vectorised loop with the same semantics remains as the fallback
and parity oracle. Batch-friendly math (result dedup, eval rerank,
brute-force oracle) runs on the TPU. Per-hop frontier ADC deliberately
does NOT: at beamwidth x degree ~ 200 candidates/hop the C++ LUT-sum is
microseconds while one device dispatch over this tunnel is
milliseconds — device ADC would multiply query latency (SURVEY
hard-part 4's host-side fallback; ops/adc.py stays the batch-path
kernel).
"""

from __future__ import annotations

import dataclasses

import mmap
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .opq import ProductQuantizer
from ..pipeline.formats import IndexHeader, PackedIndexEntry

DUPLICATES_THRESHOLD = 0.95  # query_disk_index.rs:99


@dataclasses.dataclass
class SearchCounters:
    node_reads: int = 0
    pq_comparisons: int = 0


@dataclasses.dataclass
class SearchResult:
    id: int
    score: float
    url: str
    scores: List[float]
    shards: List[int]
    timestamp: int
    dimensions: Tuple[int, int]
    embedding: Optional[np.ndarray] = None


def _dedup_results(
    results: List[SearchResult], k: int
) -> List[SearchResult]:
    """Greedy cosine>0.95 near-duplicate drop over the candidates that
    can still make the top-k (query_disk_index.rs:486-527: each item is
    compared only against already-KEPT items, so a chain A>B>C with
    sim(A,B)>t, sim(B,C)>t, sim(A,C)<=t keeps C). Host-side n^2 over a
    rank-sorted prefix — a device dispatch here would dominate query
    latency; 4k candidates is plenty of slack."""
    if len(results) <= 1:
        return results
    cands = results[: max(4 * k, 64)]
    embs = np.stack([r.embedding for r in cands]).astype(np.float32)
    embs /= np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-30)
    sim = embs @ embs.T
    keep = []
    dropped = np.zeros(len(cands), bool)
    for i in range(len(cands)):
        if dropped[i]:
            continue
        keep.append(cands[i])
        dropped |= sim[i] > DUPLICATES_THRESHOLD
    return keep + results[len(cands):]


class DiskIndex:
    """Reader over index.msgpack / index.bin / index.pq-codes.bin /
    index.descriptor-codes.bin."""

    def __init__(self, directory: str, io_backend: Optional[object] = None):
        self.dir = directory
        self.header = IndexHeader.load(os.path.join(directory, "index.msgpack"))
        q = self.header.quantizer
        self.quantizer = ProductQuantizer(
            centroids=np.asarray(q["centroids"], np.float32).reshape(
                -1, q["n_dims"]
            ),
            transform=np.asarray(q["transform"], np.float32).reshape(
                q["n_dims"], q["n_dims"]
            ),
            n_dims_per_code=q["n_dims_per_code"],
            n_dims=q["n_dims"],
        )
        self.pad = self.header.record_pad_size
        n = self.header.count
        self.n_chunks = self.quantizer.n_chunks

        self._rec_path = os.path.join(directory, "index.bin")
        if io_backend is None:
            from .native_io import open_reader

            io_backend = open_reader(self._rec_path, self.pad)
        self.io = io_backend

        # mmap + populate the PQ/descriptor code files
        # (query_disk_index.rs:686-709)
        with open(os.path.join(directory, "index.pq-codes.bin"), "rb") as f:
            self.pq_codes = np.frombuffer(
                mmap.mmap(f.fileno(), 0, prot=mmap.PROT_READ), np.uint8
            ).reshape(n, self.n_chunks)
        desc_path = os.path.join(directory, "index.descriptor-codes.bin")
        with open(desc_path, "rb") as f:
            raw = mmap.mmap(f.fileno(), 0, prot=mmap.PROT_READ)
            n_desc = len(raw) // n
            self.descriptors = np.frombuffer(raw, np.uint8).reshape(n, n_desc)
        self.n_descriptors = self.descriptors.shape[1]

        self.shard_centroids = np.asarray(
            [c for c, _m in self.header.shards], np.float32
        )
        self.shard_medioids = [m for _c, m in self.header.shards]

        # native hot loop: the whole beam search runs GIL-free in
        # native/diskio.cpp when the C++ reader is in use (the round-2
        # Python/numpy per-hop loop measured GIL-bound: 2 serving
        # threads slower than 1, docs/scale1m_report.json)
        self._nav = None
        from .native_io import NativeNav, NativeReader

        if isinstance(self.io, NativeReader):
            try:
                self._nav = NativeNav(
                    self.io,
                    n,
                    self.quantizer.n_dims,
                    np.ascontiguousarray(self.pq_codes),
                    self.quantizer.n_centroids,
                    np.ascontiguousarray(self.descriptors),
                )
            except Exception:  # noqa: BLE001 — python loop still works
                self._nav = None

    # -- node IO ------------------------------------------------------------

    def read_nodes(self, ids: Sequence[int]) -> List[PackedIndexEntry]:
        records = self.io.read_batch(list(ids))
        return [PackedIndexEntry.unpack(r) for r in records]

    # -- search -------------------------------------------------------------

    def select_shard(self, query: np.ndarray) -> int:
        """argmax centroid . q (query_disk_index.rs:447-450)."""
        return int(np.argmax(self.shard_centroids @ query))

    def search_all_shards(
        self, query: np.ndarray, k: int = 20, *, dedup: bool = True, **kwargs
    ) -> Tuple[List[SearchResult], SearchCounters]:
        """Beam search from every shard medioid, rank-merged by exact
        score (the eval-mode cross-shard pattern,
        query_disk_index.rs:281-318; trades node reads for the coverage
        the single-shard serve path gives up). Near-duplicate dedup runs
        once on the merged ranking (matching the single-shard serve
        path's cosine>0.95 drop)."""
        merged: Dict[int, SearchResult] = {}
        total = SearchCounters()
        for start in self.shard_medioids:
            results, counters = self.search(
                query, k, start_id=start, dedup=False, **kwargs
            )
            total.node_reads += counters.node_reads
            total.pq_comparisons += counters.pq_comparisons
            for r in results:
                merged[r.id] = r
        results = sorted(merged.values(), key=lambda r: -r.score)
        if dedup:
            results = _dedup_results(results, k)
        return results[:k], total

    def search(
        self,
        query: np.ndarray,
        k: int = 20,
        *,
        beamwidth: int = 3,
        search_list: int = 1000,
        descriptor_scales: Optional[np.ndarray] = None,
        dedup: bool = True,
        start_id: Optional[int] = None,
        spec: Optional[int] = None,
    ) -> Tuple[List[SearchResult], SearchCounters]:
        """Beam search (query_disk_index.rs:144-212 semantics).

        Frontier candidates are scored with PQ ADC + descriptor product;
        visited nodes get the exact fp16 dot; results are rank-sorted by
        exact score and near-duplicates dropped.

        spec (default env MSE_DISK_SPEC or 0): speculative frontier
        reads per hop on the native path — same results, deeper IO
        queue for cold single-stream latency. Python fallback ignores
        it (no read-ahead value without the native fan-out pool).
        """
        if spec is None:
            spec = int(os.environ.get("MSE_DISK_SPEC", "0"))
        query = np.asarray(query, np.float32)
        counters = SearchCounters()
        if descriptor_scales is None:
            descriptor_scales = np.zeros(self.n_descriptors, np.float32)
        use_desc = bool(np.any(descriptor_scales != 0))

        lut = self.quantizer.preprocess_query(query)  # (chunks, C)
        chunk_idx = np.arange(self.n_chunks)

        if start_id is None:
            start_id = self.shard_medioids[self.select_shard(query)]

        if self._nav is not None:
            return self._finish_native(
                lut, query, descriptor_scales, use_desc, start_id,
                beamwidth, search_list, k, dedup, counters, spec,
            )

        # frontier as flat numpy arrays + a seen-bitmap: the per-hop work
        # (dedupe, ADC, top-beamwidth selection) is all vectorised — a
        # python heap costs ~pq_comparisons pushes per query (measured
        # 4x the total search time at search_list=500)
        seen = np.zeros(self.header.count, bool)
        seen[start_id] = True
        visited: Dict[int, SearchResult] = {}
        f_ids = np.asarray([start_id], np.int64)
        f_scores = np.asarray(
            [lut[chunk_idx, self.pq_codes[start_id]].sum()], np.float32
        )
        counters.pq_comparisons += 1

        while len(f_ids):
            # pop the top-beamwidth frontier candidates
            bw = min(beamwidth, len(f_ids))
            if len(f_ids) > bw:
                top = np.argpartition(-f_scores, bw - 1)[:bw]
            else:
                top = np.arange(len(f_ids))
            batch = f_ids[top].tolist()
            mask = np.ones(len(f_ids), bool)
            mask[top] = False
            f_ids, f_scores = f_ids[mask], f_scores[mask]

            nodes = self.read_nodes(batch)  # beamwidth-parallel IO
            counters.node_reads += len(nodes)

            new_candidates: List[np.ndarray] = []
            for node in nodes:
                exact = float(query @ node.vector)
                if use_desc:
                    # the reference adds the descriptor product to the
                    # exact score too, so sliders reorder final results
                    # (query_disk_index.rs:168-169), not just the frontier
                    exact += float(
                        self.descriptors[node.id].astype(np.float32)
                        @ descriptor_scales
                    )
                visited[node.id] = SearchResult(
                    id=node.id,
                    score=exact,
                    url=node.url,
                    scores=node.scores,
                    shards=node.shards,
                    timestamp=node.timestamp,
                    dimensions=node.dimensions,
                    embedding=node.vector,
                )
                if node.vertices:
                    new_candidates.append(
                        np.asarray(node.vertices, np.int64)
                    )

            if new_candidates:
                cand = np.unique(np.concatenate(new_candidates))
                cand = cand[~seen[cand]]
                seen[cand] = True
                if len(cand):
                    codes = self.pq_codes[cand]  # (C, chunks)
                    approx = lut[chunk_idx[None, :], codes].sum(axis=1)
                    counters.pq_comparisons += len(cand)
                    if use_desc:
                        approx = approx + (
                            self.descriptors[cand].astype(np.float32)
                            @ descriptor_scales
                        )
                    f_ids = np.concatenate([f_ids, cand])
                    f_scores = np.concatenate(
                        [f_scores, approx.astype(np.float32)]
                    )
                    if len(f_ids) > search_list * 2:
                        keep = np.argpartition(-f_scores, search_list)[
                            :search_list
                        ]
                        f_ids, f_scores = f_ids[keep], f_scores[keep]

            if len(visited) >= search_list:
                break

        results = sorted(visited.values(), key=lambda r: -r.score)
        if dedup:
            results = _dedup_results(results, k)
        return results[:k], counters

    def _finish_native(
        self, lut, query, descriptor_scales, use_desc, start_id,
        beamwidth, search_list, k, dedup, counters, spec=0,
    ) -> Tuple[List[SearchResult], SearchCounters]:
        """Run the native beam search and assemble SearchResults for the
        ranked prefix. Only the records that can reach the final top-k
        (the dedup window + backfill) are msgpack-decoded in Python; the
        search itself already read them natively, so these re-reads hit
        the page cache."""
        ids, scores, node_reads, pq_cmps = self._nav.search(
            lut, query, descriptor_scales, use_desc, start_id,
            beamwidth, search_list, spec,
        )
        counters.node_reads += node_reads
        counters.pq_comparisons += pq_cmps

        window = max(4 * k, 64) if dedup else k

        def make_results(lo: int, hi: int) -> List[SearchResult]:
            nodes = self.read_nodes(ids[lo:hi].tolist())
            return [
                SearchResult(
                    id=node.id,
                    score=float(scores[lo + i]),
                    url=node.url,
                    scores=node.scores,
                    shards=node.shards,
                    timestamp=node.timestamp,
                    dimensions=node.dimensions,
                    embedding=node.vector,
                )
                for i, node in enumerate(nodes)
            ]

        results = make_results(0, min(window, len(ids)))
        if dedup:
            results = _dedup_results(results, k)
            # backfill from the ranked tail if dedup dropped below k
            # (tail entries are appended unchecked, matching the python
            # path's keep + results[len(cands):] semantics)
            lo = window
            while len(results) < k and lo < len(ids):
                hi = min(lo + window, len(ids))
                results.extend(make_results(lo, hi))
                lo = hi
        return results[:k], counters

    # -- offline evaluation (query_disk_index.rs:225-343) -------------------

    def evaluate(
        self,
        queries: np.ndarray,
        k: int = 20,
        *,
        beamwidth: int = 3,
        search_list: int = 1000,
        corpus: Optional[np.ndarray] = None,
    ) -> dict:
        """Brute-force oracle vs per-shard beam search: recall@k, rank
        stats, PQ-comparison counts.

        Pass ``corpus`` (the (N, D) fp16 flat the build pipeline already
        has on disk) to skip the O(N) 4096-B record sweep — at 1e6 that
        sweep alone measured 643.9 s; at 1e7+ it is unusable."""
        import jax.numpy as jnp

        from ..ops.mips import mips_topk, streamed_mips_topk

        n = self.header.count
        if corpus is not None:
            all_vecs = np.asarray(corpus, np.float16)
            assert all_vecs.shape == (n, self.quantizer.n_dims)
        else:
            all_vecs = np.zeros((n, self.quantizer.n_dims), np.float16)
            for start in range(0, n, 1024):
                ids = range(start, min(n, start + 1024))
                for node in self.read_nodes(list(ids)):
                    all_vecs[node.id] = node.vector.astype(np.float16)

        qs = np.atleast_2d(np.asarray(queries, np.float32))
        if n <= 3_000_000:
            _scores, oracle = mips_topk(
                jnp.asarray(all_vecs), jnp.asarray(qs), k
            )
            oracle = np.asarray(oracle)
        else:
            # corpus exceeds device HBM at this scale: stream slabs
            # through the device once (ops/mips.py)
            _scores, oracle = streamed_mips_topk(
                ((all_vecs[s0 : s0 + 1_000_000], s0)
                 for s0 in range(0, n, 1_000_000)),
                qs, k,
            )

        recalls, ranks, cmps, reads = [], [], [], []
        for b in range(len(qs)):
            results, counters = self.search(
                qs[b],
                k,
                beamwidth=beamwidth,
                search_list=search_list,
                dedup=False,
            )
            got = [r.id for r in results]
            truth = set(oracle[b].tolist())
            recalls.append(len(set(got) & truth) / k)
            pos = {rid: i for i, rid in enumerate(got)}
            ranks.extend(
                pos.get(t, search_list) + 1 for t in oracle[b].tolist()
            )
            cmps.append(counters.pq_comparisons)
            reads.append(counters.node_reads)

        ranks = np.asarray(ranks, np.float64)
        return {
            "recall": float(np.mean(recalls)),
            "mean_rank": float(ranks.mean()),
            "median_rank": float(np.median(ranks)),
            "harmonic_mean_rank": float(len(ranks) / np.sum(1.0 / ranks)),
            "mean_pq_comparisons": float(np.mean(cmps)),
            "mean_node_reads": float(np.mean(reads)),
        }
