"""Vamana (DiskANN) graph construction and search, TPU-batched.

Capability parity with the reference's ``diskann`` crate — greedy best-
first search, ParlayANN-style alpha-RNG robust prune, OOD query-vector
handling (query_breakpoint / query_alpha), RobustStitch, random fill,
medioid selection (diskann/src/lib.rs:183-387) — re-architected for TPU:

The reference builds with rayon threads doing one node at a time over
per-node RwLocks and AVX2 dot kernels (lib.rs:287-324, vector.rs:192).
Fine-grained locks don't map to an accelerator, so the build runs in
**batched synchronous rounds** (FreshDiskANN/ParlayANN-style): a batch
of nodes runs greedy search *in lockstep* on device — frontier expansion
is an adjacency gather + one batched MXU contraction per hop — followed
by a batched on-device robust prune (argmax selection + masked matvec
per degree slot), and one host-side back-edge reconciliation per round.
The resulting graph differs from the sequential reference's only in
insertion-order effects; quality is validated by the recall harness
(tests/test_vamana.py), matching the reference's own evaluation strategy
(diskann/src/main.rs:101-137 — recall + distance-comparison counts, not
graph isomorphism).

Scores are fp32 inner products ordered (score desc, id asc); the
reference's i64 fixed-point trick (vector.rs:45-47) exists only to get a
total order, which the composite sort key provides here. One deliberate
relaxation: the visited-log ranking in ``_greedy_search_batch`` uses a
single ``lax.top_k`` on scores alone, so ties AT the maxc truncation
boundary break by visit-log position rather than by id (common with
``corpus_dtype='int8'``, where scores are exact integers). Which tied
candidates enter the prune pool may therefore differ from the
reference's deterministic order; prune/recall semantics are unaffected
(the pool is a candidate superset, and quality is asserted by recall
tests, not graph isomorphism).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# overflow-bucket occupancy counters (diagnostic; read by the
# MSE_BUILD_PROFILE print in build_graph)
_OVF_STATS = {"narrow": 0, "wide": 0}

__all__ = ["VamanaConfig", "build_graph", "medioid", "random_fill", "robust_stitch", "search"]


@dataclasses.dataclass(frozen=True)
class VamanaConfig:
    """Build parameters (reference defaults: lib.rs:41-52,
    generate_index_shard.rs:22-37)."""

    r: int = 64  # max out-degree
    l: int = 192  # search list size
    maxc: int = 750  # prune candidate pool
    alpha: float = 65536 / 65536  # RNG diversity factor (fixed-point /2^16)
    saturate_graph: bool = False
    query_breakpoint: int = 2**31 - 1  # ids >= this are OOD query vectors
    query_alpha: float = 1.0
    max_add_per_stitch_iter: int = 16
    batch_size: int = 1024  # nodes per synchronous build round
    max_search_steps: int = 0  # 0 -> auto
    build_expand: int = 2  # beam entries popped per hop during build
    # device-resident corpus dtype for build-time distance evals:
    # "bf16" (default) or "int8" (symmetric global-scale quantisation —
    # halves the frontier-gather HBM traffic, the build's bottleneck;
    # every score comparison is scale-invariant so no rescale is needed,
    # exactly like the reference's PQ-approximated frontier in serving)
    corpus_dtype: str = "bf16"
    # defer-and-batch overflow: back-edge pairs that overflow R are
    # accumulated for this many rounds before the batched re-prune runs
    # (1 = re-prune every round, the reference's immediate semantics,
    # lib.rs:313-318). Deferral amortises dispatch + tunnel round-trips
    # over K rounds and merges a hub node's overflows across the window
    # into ONE prune; the cost is that a deferred edge is invisible to
    # searches for up to K rounds. Quality is validated by the recall
    # harness like every other batching relaxation in this module.
    overflow_flush_rounds: int = 8


def _corpus_on_device(vectors: np.ndarray, dtype: str) -> jnp.ndarray:
    if dtype == "int8":
        scale = 127.0 / max(1e-9, float(np.abs(vectors).max()))
        q = np.clip(np.rint(vectors * scale), -127, 127).astype(np.int8)
        return jnp.asarray(q)
    assert dtype == "bf16", dtype
    return jnp.asarray(vectors, jnp.bfloat16)


def medioid(vectors: np.ndarray) -> int:
    """Entry point = argmax dot with the corpus mean (lib.rs:54-68)."""
    x = jnp.asarray(vectors, jnp.float32)
    mean = x.mean(axis=0)
    return int(jnp.argmax(jnp.dot(x, mean, preferred_element_type=jnp.float32)))


def medioid_dev(corpus_dev: jnp.ndarray, count: Optional[int] = None) -> int:
    """medioid() over an already-device-resident corpus (first `count`
    rows) — no host->device upload. The tunneled TPU plugin retains host
    RSS ~1:1 with uploaded bytes (BENCHMARKS.md leak bisect), and the
    fp32 corpus re-upload medioid() forced was the single largest leak
    contributor per shard build (tools_audit_build_uploads.py), so the
    build path computes its entry point from the build's own reduced-
    width corpus copy. argmax over the mean-dot is scale-invariant, so
    the int8/bf16 storage only perturbs genuine near-ties."""
    x = corpus_dev[: int(count)] if count is not None else corpus_dev
    x = x.astype(jnp.float32)
    mean = x.mean(axis=0)
    return int(jnp.argmax(jnp.dot(x, mean, preferred_element_type=jnp.float32)))


def random_fill(n: int, r: int, seed: int = 0) -> np.ndarray:
    """Random R-regular init (lib.rs:376-387), (N, R) int32."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, n, (n, r), dtype=np.int32)


# ---------------------------------------------------------------------------
# device-side primitives
# ---------------------------------------------------------------------------


def _dedupe_by_id(scores, ids):
    """Mark duplicate ids (keep best score). ids sorted ascending first."""
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, 1)
    scores_s = jnp.take_along_axis(scores, order, 1)
    dup = jnp.concatenate(
        [
            jnp.zeros((ids.shape[0], 1), bool),
            ids_s[:, 1:] == ids_s[:, :-1],
        ],
        axis=1,
    )
    scores_s = jnp.where(dup, -jnp.inf, scores_s)
    ids_s = jnp.where(dup, jnp.int32(2**31 - 1), ids_s)
    return scores_s, ids_s


@functools.partial(
    jax.jit,
    static_argnames=("l", "maxc", "max_steps", "expand", "collect_pool"),
)
def _batched_greedy_search(
    vectors,  # (N, D) f32/bf16 on device
    graph,  # (N, R) i32, -1 padded
    queries,  # (B, D) f32
    start,  # scalar i32
    query_breakpoint,  # scalar i32
    base_only_mask,  # (B,) bool: rows that skip OOD query nodes
    l: int,
    maxc: int,
    max_steps: int,
    expand: int = 1,
    collect_pool: bool = True,
):
    """Lockstep greedy search for B queries (lib.rs:183-211 semantics).

    ``base_only_mask`` is per-row, mirroring the reference's per-node
    ``base_vectors_only`` flag (lib.rs:196-199, 298-299): True rows
    never admit OOD query nodes into the beam.
    ``expand`` > 1 pops several unvisited beam entries per step (beam
    expansion, like the disk index's beamwidth reads) — fewer sort
    passes per visited node at the cost of a few extra distance evals.
    ``collect_pool=False`` skips the robust-prune candidate pool
    (query-serving mode: only the beam buffer is needed).

    Returns (cand_scores (B, P), cand_ids (B, P), steps) where P = maxc
    (pool mode) or l (buffer mode), best-first.
    """
    b = queries.shape[0]
    n, r = graph.shape
    INVALID = jnp.int32(2**31 - 1)

    qf = queries.astype(jnp.float32)

    start_vec = vectors[start].astype(jnp.float32)
    s0 = jnp.dot(qf, start_vec, preferred_element_type=jnp.float32)

    # beam buffer: (B, L) ids/scores/visited
    buf_ids = jnp.full((b, l), INVALID, jnp.int32).at[:, 0].set(start)
    buf_scores = jnp.full((b, l), -jnp.inf, jnp.float32).at[:, 0].set(s0)
    buf_visited = jnp.zeros((b, l), bool)

    # per-query seen bitmap — the reference's visited hash set
    # (lib.rs:195-199: a neighbour is scored at most once per search).
    # It also means the beam merge never sees duplicate ids, so the merge
    # is ONE top-k selection instead of two dedupe lexsorts per hop.
    seen = jnp.zeros((b, n), bool).at[:, start].set(True)

    # visited/scored pool for robust_prune: an append-only log written at
    # step offsets — zero sort work inside the loop; deduped + ranked
    # ONCE after the search
    pool_n = max_steps * expand * r if collect_pool else 1
    pool_ids = jnp.full((b, pool_n), INVALID, jnp.int32)
    pool_scores = jnp.full((b, pool_n), -jnp.inf, jnp.float32)

    def cond(state):
        _bi, _bs, bv, _seen, _pi, _ps, step, done = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(done))

    def body(state):
        (buf_ids, buf_scores, buf_visited, seen, pool_ids, pool_scores,
         step, _) = state

        # pop the best `expand` unvisited slots (buffer is best-first)
        unvisited = jnp.logical_and(~buf_visited, buf_ids != INVALID)
        slot_order = jnp.argsort(~unvisited, axis=1, stable=True)
        slots = slot_order[:, :expand]  # (B, E)
        slot_ok = jnp.take_along_axis(unvisited, slots, 1)
        cur = jnp.take_along_axis(buf_ids, slots, 1)
        cur = jnp.where(slot_ok, cur, 0)
        rows = jnp.arange(b)[:, None]
        buf_visited = buf_visited.at[rows, slots].set(
            jnp.logical_or(buf_visited[rows, slots], slot_ok)
        )

        # expand: gather adjacency rows + candidate vectors, one dot.
        # The row gather is XLA's generic gather: the pipelined Pallas
        # row-gather was measured SLOWER at these shapes (20 vs 51 GB/s
        # — per-block pipeline overhead on single-row blocks; see
        # ops/gather.py use_pallas_gather for the committed numbers)
        # and remains opt-in via MSE_PALLAS_GATHER=1
        neigh = graph[cur].reshape(b, expand * r)  # (B, E*R)
        valid = neigh >= 0
        neigh_safe = jnp.where(valid, neigh, 0)
        from ..ops.gather import gather_rows, use_pallas_gather

        if use_pallas_gather():
            nvecs = gather_rows(vectors, neigh_safe).astype(jnp.float32)
        else:
            nvecs = vectors[neigh_safe].astype(jnp.float32)  # (B, E*R, D)
        nscores = jnp.einsum(
            "bd,brd->br", qf, nvecs, preferred_element_type=jnp.float32
        )
        # OOD: rows flagged base-only skip query nodes (lib.rs:196-199)
        valid = jnp.logical_and(
            valid,
            jnp.logical_or(
                ~base_only_mask[:, None], neigh < query_breakpoint
            ),
        )
        valid = jnp.logical_and(valid, jnp.repeat(slot_ok, r, axis=1))
        # never re-admit a seen node (first occurrence in this hop wins;
        # intra-hop duplicates collapse via a segment-max on the bitmap)
        valid = jnp.logical_and(valid, ~seen[rows, neigh_safe])
        # mark + drop intra-hop duplicates: after setting the bitmap,
        # recompute which candidate slots were the first writer
        seen = seen.at[rows, jnp.where(valid, neigh_safe, 0)].set(
            jnp.logical_or(
                seen[rows, jnp.where(valid, neigh_safe, 0)], valid
            )
        )
        # intra-hop duplicate ids (same node from two expanded parents):
        # keep the first slot only
        eq_prev = jnp.zeros_like(valid)
        if expand > 1:
            # O(E*R^2/2) pairwise compare only across parent groups
            for a in range(1, expand):
                for c in range(a):
                    eq = (
                        neigh[:, a * r : (a + 1) * r, None]
                        == neigh[:, None, c * r : (c + 1) * r]
                    ).any(axis=2)
                    eq_prev = eq_prev.at[:, a * r : (a + 1) * r].set(
                        jnp.logical_or(eq_prev[:, a * r : (a + 1) * r], eq)
                    )
        valid = jnp.logical_and(valid, ~eq_prev)
        nscores = jnp.where(valid, nscores, -jnp.inf)
        nids = jnp.where(valid, neigh, INVALID)

        # merge into beam buffer: ids are unique by construction, so one
        # top-l selection suffices (score desc, INVALID sorts last)
        m_ids = jnp.concatenate([buf_ids, nids], axis=1)
        m_scores = jnp.concatenate([buf_scores, nscores], axis=1)
        m_visited = jnp.concatenate(
            [buf_visited, jnp.zeros_like(nids, bool)], axis=1
        )
        top_scores, top_pos = jax.lax.top_k(m_scores, l)
        m_ids = jnp.take_along_axis(m_ids, top_pos, 1)
        m_scores = top_scores
        m_visited = jnp.take_along_axis(m_visited, top_pos, 1)

        if collect_pool:
            # append scored candidates at this step's offset
            # (visited_list semantics: every scored neighbour included)
            width = expand * r
            p_ids = jax.lax.dynamic_update_slice(
                pool_ids, nids, (0, step * width)
            )
            p_scores = jax.lax.dynamic_update_slice(
                pool_scores, nscores, (0, step * width)
            )
        else:
            p_ids, p_scores = pool_ids, pool_scores

        done = jnp.logical_not(jnp.any(
            jnp.logical_and(~m_visited, m_ids != INVALID)
        ))
        return (m_ids, m_scores, m_visited, seen, p_ids, p_scores,
                step + 1, done)

    state = (buf_ids, buf_scores, buf_visited, seen, pool_ids, pool_scores,
             jnp.int32(0), jnp.bool_(False))
    (buf_ids, buf_scores, buf_visited, _seen, pool_ids, pool_scores, steps,
     _) = jax.lax.while_loop(cond, body, state)
    if not collect_pool:
        return buf_scores, buf_ids, steps
    # rank the visited log (+ the seed). Ids are unique by construction —
    # the seen bitmap admits each node once and the seed is pre-marked —
    # so a single score sort replaces the dedupe lexsort pair
    # (the log is (B, 2*l*r) wide; at reference params that is a 25M-
    # element sort per round, previously done twice)
    p_ids = jnp.concatenate([pool_ids, jnp.full((b, 1), start, jnp.int32)], 1)
    p_scores = jnp.concatenate([pool_scores, s0[:, None]], 1)
    top_scores, top_pos = jax.lax.top_k(p_scores, min(maxc, p_scores.shape[1]))
    pool_ids = jnp.take_along_axis(p_ids, top_pos, 1)
    pool_scores = top_scores
    return pool_scores, pool_ids, steps


def _merge_pool(pool_ids, pool_scores, add_ids, add_scores, maxc):
    p_ids = jnp.concatenate([pool_ids, add_ids], axis=1)
    p_scores = jnp.concatenate([pool_scores, add_scores], axis=1)
    p_scores, p_ids = _dedupe_by_id(p_scores, p_ids)
    order = jnp.lexsort((p_ids, -p_scores))
    p_ids = jnp.take_along_axis(p_ids, order, 1)[:, :maxc]
    p_scores = jnp.take_along_axis(p_scores, order, 1)[:, :maxc]
    return p_ids, p_scores


@functools.partial(jax.jit, static_argnames=("r",))
def _batched_robust_prune(
    vectors,  # (N, D)
    p_nodes,  # (B,) i32 node being pruned
    cand_ids,  # (B, C) i32 sorted best-first, INVALID padded
    cand_scores,  # (B, C) f32
    alpha,  # scalar f32
    query_alpha,  # scalar f32
    query_breakpoint,  # scalar i32
    saturate,  # scalar bool (saturate_graph or p is query node)
    r: int,
):
    """alpha-RNG prune, ParlayANN flavour (lib.rs:227-285), batched.

    Iterates r rounds; each round selects the best remaining candidate
    p* and suppresses every candidate c with
    alpha_c * dot(c, p*) >= dot(c, p) — alpha_c switches to query_alpha
    for OOD query candidates (lib.rs:261-265).
    """
    b, c = cand_ids.shape
    INVALID = jnp.int32(2**31 - 1)

    valid0 = cand_ids != INVALID
    # self-edges never selected (p_star == p skip, lib.rs:241)
    valid0 = jnp.logical_and(valid0, cand_ids != p_nodes[:, None])
    cand_safe = jnp.where(cand_ids != INVALID, cand_ids, 0)

    # ALL candidate-pair dots up front as one batched MXU matmul
    # (C, D) @ (D, C) per row, fp32 accumulation. The selection loop then
    # only gathers rows of this matrix — the per-step (B,1,D)@(B,D,C)
    # matvec it replaces ran the MXU at ~1/128 utilisation and dominated
    # the whole build (measured 1.6 s -> ~0.1 s per 1024-node round).
    # The (B, C, D) row gather feeding it is XLA's generic gather — the
    # Pallas row-gather alternative measured slower and is opt-in only
    # (ops/gather.py use_pallas_gather has the numbers).
    from ..ops.gather import gather_rows, use_pallas_gather

    if use_pallas_gather():
        cvecs = gather_rows(vectors, cand_safe)  # (B, C, D)
    else:
        cvecs = vectors[cand_safe]  # (B, C, D) bf16
    pair = jnp.einsum(
        "bcd,bed->bce", cvecs, cvecs, preferred_element_type=jnp.float32
    )  # (B, C, C)

    alpha_c = jnp.where(cand_ids >= query_breakpoint, query_alpha, alpha)

    def body(i, state):
        alive, selected_ids, n_selected = state
        # best remaining candidate (cand arrays sorted best-first)
        any_alive = jnp.any(alive, axis=1)
        pick = jnp.argmax(alive, axis=1)  # first alive slot
        pick_id = jnp.take_along_axis(cand_ids, pick[:, None], 1)[:, 0]

        do_pick = jnp.logical_and(any_alive, n_selected < r)
        selected_ids = selected_ids.at[:, i].set(
            jnp.where(do_pick, pick_id, INVALID)
        )
        n_selected = n_selected + do_pick.astype(jnp.int32)

        # suppress candidates dominated by p* (precomputed dot row)
        pstar_dots = jnp.take_along_axis(
            pair, pick[:, None, None], 1
        )[:, 0, :]  # (B, C)
        dominated = alpha_c * pstar_dots >= cand_scores
        alive = jnp.where(
            do_pick[:, None],
            jnp.logical_and(alive, jnp.logical_not(dominated)),
            alive,
        )
        # the pick itself always leaves the pool
        alive = alive.at[jnp.arange(b), pick].set(
            jnp.where(do_pick, False, alive[jnp.arange(b), pick])
        )
        return alive, selected_ids, n_selected

    selected = jnp.full((b, r), INVALID, jnp.int32)
    alive, selected, n_selected = jax.lax.fori_loop(
        0, r, body, (valid0, selected, jnp.zeros((b,), jnp.int32))
    )

    # compact the INVALID gaps left by exhausted queries
    order = jnp.argsort(selected, axis=1)  # INVALID sorts last
    selected = jnp.take_along_axis(selected, order, 1)
    # saturate: refill from remaining candidates best-first
    # (lib.rs:274-284); selected entries excluded via dedupe
    def saturate_fill(selected):
        # selected edges first (rank 0), then remaining candidates
        # best-first (rank = 1 + position in the score-sorted pool);
        # dedupe by id keeping the lowest rank, drop INVALID/self
        m_ids = jnp.concatenate([selected, cand_ids], axis=1)
        rank = jnp.concatenate(
            [
                jnp.zeros((b, r), jnp.int32),
                1 + jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (b, c)),
            ],
            axis=1,
        )
        order = jnp.lexsort((rank, m_ids))  # by id, lowest rank first
        m_ids_s = jnp.take_along_axis(m_ids, order, 1)
        rank_s = jnp.take_along_axis(rank, order, 1)
        dup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), m_ids_s[:, 1:] == m_ids_s[:, :-1]],
            axis=1,
        )
        keep = jnp.logical_and(~dup, m_ids_s != INVALID)
        keep = jnp.logical_and(keep, m_ids_s != p_nodes[:, None])
        m_ids_s = jnp.where(keep, m_ids_s, INVALID)
        rank_s = jnp.where(keep, rank_s, jnp.int32(2**30))
        order2 = jnp.lexsort((m_ids_s, rank_s))  # rank asc, INVALID last
        return jnp.take_along_axis(m_ids_s, order2, 1)[:, :r]

    selected = jnp.where(saturate[:, None], saturate_fill(selected), selected)
    selected = jnp.where(selected == INVALID, -1, selected)
    return selected


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------


def _insert_back_edges(graph, degrees, batch, new_neigh, r):
    """Vectorised back-edge insertion (lib.rs:311-322 semantics).

    For every new edge u -> v, append u to v's adjacency if there is
    room and the edge isn't already present; returns the (v, u) pairs
    whose target rows overflowed R and need a re-prune. Insertion order
    within a round is (v, u)-sorted rather than batch-ordered — the
    reference's own order is rayon-thread-racy, so no order is
    semantically privileged.
    """
    b, rr = new_neigh.shape
    tgt = new_neigh.ravel()
    src = np.repeat(batch.astype(np.int32), rr)
    ok = tgt >= 0
    tgt, src = tgt[ok], src[ok]
    if len(tgt) == 0:
        return (
            np.empty((0, 2), np.int32),
            (np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0, np.int32)),
        )
    # drop edges already present in the target's row
    present = (graph[tgt] == src[:, None]).any(axis=1)
    tgt, src = tgt[~present], src[~present]
    if len(tgt) == 0:
        return (
            np.empty((0, 2), np.int32),
            (np.empty(0, np.int32), np.empty(0, np.int32), np.empty(0, np.int32)),
        )
    # sort by (v, u); dedupe exact pairs
    key = tgt.astype(np.int64) * (graph.shape[0] + 1) + src
    order = np.argsort(key, kind="stable")
    key_s, tgt, src = key[order], tgt[order], src[order]
    first = np.ones(len(key_s), bool)
    first[1:] = key_s[1:] != key_s[:-1]
    tgt, src = tgt[first], src[first]
    # position within each target group -> free slot index
    newgrp = np.ones(len(tgt), bool)
    newgrp[1:] = tgt[1:] != tgt[:-1]
    starts = np.flatnonzero(newgrp)
    gidx = np.cumsum(newgrp) - 1
    pos = np.arange(len(tgt)) - starts[gidx]
    slot = degrees[tgt] + pos
    accept = slot < r
    graph[tgt[accept], slot[accept]] = src[accept]
    uniq, cnt = np.unique(tgt[accept], return_counts=True)
    degrees[uniq] += cnt.astype(np.int32)
    overflow = np.stack([tgt[~accept], src[~accept]], axis=1).astype(np.int32)
    accepted = (
        tgt[accept].astype(np.int32),
        slot[accept].astype(np.int32),
        src[accept].astype(np.int32),
    )
    return overflow, accepted


def build_graph(
    vectors: np.ndarray,
    config: VamanaConfig = VamanaConfig(),
    seed: int = 0,
    graph: Optional[np.ndarray] = None,
    verbose: bool = False,
    corpus_dev: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """Build the Vamana graph (lib.rs:287-324 flow, batched rounds).

    vectors: (N, D); rows >= config.query_breakpoint are OOD query
    vectors (appended after base data, generate_index_shard.rs:71-94).
    Returns adjacency (N, R) int32, -1 padded.

    corpus_dev: optional pre-uploaded device corpus (the output of
    _corpus_on_device(vectors, config.corpus_dtype)) — multi-pass
    callers upload once and reuse it, since the tunneled plugin retains
    host RSS per uploaded byte (BENCHMARKS.md leak bisect) and the
    corpus re-upload dominated the per-shard leak rate.
    """
    n, d = vectors.shape
    cfg = config
    rng = np.random.default_rng(seed)
    # 2*l hop budget: the beam visits <= l entries unless truncation
    # re-exposes previously visited nodes; the recall harness validates
    # the bound (and it also caps the visited-log pool size). Each hop
    # visits `expand` beam entries, so the budget divides by expand.
    max_steps = cfg.max_search_steps or -(-2 * cfg.l // cfg.build_expand)

    # reduced-width resident copy: the build is dominated by (B, E*R, D)
    # vector gathers; every halving of element width halves the HBM
    # traffic. All dots upcast to f32 at the MXU (preferred_element_type).
    vec_dev = (
        corpus_dev
        if corpus_dev is not None
        else _corpus_on_device(vectors, cfg.corpus_dtype)
    )
    if graph is None:
        graph = random_fill(n, cfg.r, seed)
    graph = np.asarray(graph, np.int32)
    degrees = np.full((n,), graph.shape[1], np.int32)
    med = medioid_dev(vec_dev, min(n, cfg.query_breakpoint))

    sigmas = rng.permutation(n).astype(np.int32)
    bp = jnp.int32(cfg.query_breakpoint)

    # the graph lives on device for the whole build; each round's row
    # updates are mirrored with scatters instead of re-uploading the
    # full (N, R) adjacency (25.6 MB/round at n=1e5 over this tunnel)
    graph_dev = jnp.asarray(graph)

    import os as _os
    import time as _time
    _prof = _os.environ.get("MSE_BUILD_PROFILE")
    _tot = {}
    def _mark(k, t0):
        if _prof:
            # sync via a 1-element host fetch: on the tunneled backend
            # block_until_ready returns early, and the fetch of a slice
            # enqueued NOW drains everything already on the device
            # stream (same methodology as bench.py)
            np.asarray(graph_dev[0, :1])
            _tot[k] = _tot.get(k, 0.0) + (_time.perf_counter() - t0)
        return _time.perf_counter()

    pending_overflow = []  # deferred (target, source) back-edge pairs
    rounds_since_flush = 0
    for round_start in range(0, n, cfg.batch_size):
        batch = sigmas[round_start : round_start + cfg.batch_size]
        b = len(batch)
        pad = cfg.batch_size - b
        batch_p = np.pad(batch, (0, pad), constant_values=0)

        _t0 = _time.perf_counter()
        queries = vec_dev[jnp.asarray(batch_p)]
        is_query_node = batch_p >= cfg.query_breakpoint

        # per-row base_only, exactly the reference's per-node flag
        # (lib.rs:298-299): query nodes search base vectors only; base
        # nodes see (and may link) query nodes, feeding RobustStitch
        pool_scores, pool_ids, _steps = _batched_greedy_search(
            vec_dev, graph_dev, queries, jnp.int32(med), bp,
            jnp.asarray(is_query_node),
            l=cfg.l, maxc=cfg.maxc, max_steps=max_steps,
            expand=cfg.build_expand,
        )
        if _prof:
            int(_steps)
        _t0 = _mark("search", _t0)

        # merge existing out-neighbours into the candidate pool
        # (lib.rs:301-304)
        existing = graph[batch_p]  # (B, R)
        evalid = existing >= 0
        esafe = np.where(evalid, existing, 0)
        evecs = vec_dev[jnp.asarray(esafe)]
        escores = jnp.einsum(
            "bd,brd->br", queries, evecs, preferred_element_type=jnp.float32
        )
        escores = jnp.where(jnp.asarray(evalid), escores, -jnp.inf)
        eids = jnp.where(jnp.asarray(evalid), jnp.asarray(esafe), 2**31 - 1)
        pool_ids, pool_scores = _merge_pool(
            pool_ids, pool_scores, eids, escores, cfg.maxc
        )

        saturate = jnp.asarray(
            np.logical_or(cfg.saturate_graph, is_query_node)
        )
        new_neigh_dev = _batched_robust_prune(
            vec_dev,
            jnp.asarray(batch_p),
            pool_ids,
            pool_scores,
            jnp.float32(cfg.alpha),
            jnp.float32(cfg.query_alpha),
            bp,
            saturate,
            r=cfg.r,
        )
        new_neigh = np.asarray(new_neigh_dev)[:b]
        _t0 = _mark("prune+dl", _t0)

        # host: install new adjacency + back-edges (lib.rs:311-322),
        # fully vectorised (the per-edge python loop cost ~0.4 s/round)
        graph[batch] = new_neigh  # prune output is -1-right-padded
        degrees[batch] = (new_neigh >= 0).astype(np.int32).sum(axis=1)
        overflow_nodes, accepted = _insert_back_edges(
            graph, degrees, batch, new_neigh, cfg.r
        )
        _t0 = _mark("host_backedges", _t0)

        # mirror on device: batch rows (already device-resident) + the
        # accepted back-edge scatter, padded to a fixed width so the
        # update compiles once (out-of-range rows drop)
        rows = np.full(cfg.batch_size, n, np.int32)
        rows[:b] = batch
        cap = cfg.batch_size * cfg.r
        tgt_p = np.full(cap, n, np.int32)
        slot_p = np.zeros(cap, np.int32)
        src_p = np.zeros(cap, np.int32)
        acc_t, acc_s, acc_u = accepted
        m = min(len(acc_t), cap)
        tgt_p[:m], slot_p[:m], src_p[:m] = acc_t[:m], acc_s[:m], acc_u[:m]
        graph_dev = _apply_graph_updates(
            graph_dev, jnp.asarray(rows), new_neigh_dev,
            jnp.asarray(tgt_p), jnp.asarray(slot_p), jnp.asarray(src_p),
        )
        _t0 = _mark("dev_scatter", _t0)

        # defer-and-batch: overflowing back-edge targets accumulate for
        # up to overflow_flush_rounds rounds, then re-prune as one
        # device batch (extras for the same hub merge across the window)
        if len(overflow_nodes):
            pending_overflow.append(overflow_nodes)
        rounds_since_flush += 1
        if pending_overflow and rounds_since_flush >= cfg.overflow_flush_rounds:
            graph_dev = _reprune_overflow(
                vec_dev, graph, degrees,
                np.concatenate(pending_overflow), cfg, bp, graph_dev,
            )
            pending_overflow.clear()
            rounds_since_flush = 0
        _t0 = _mark("overflow", _t0)
        if verbose and (round_start // cfg.batch_size) % 20 == 0:
            print(
                f"vamana round {round_start // cfg.batch_size}: "
                f"{round_start + b}/{n} nodes"
            )

    if pending_overflow:  # flush the tail of the deferral window
        graph_dev = _reprune_overflow(
            vec_dev, graph, degrees,
            np.concatenate(pending_overflow), cfg, bp, graph_dev,
        )
        pending_overflow.clear()
    if _prof:
        _tot.update(_OVF_STATS)
        print("build profile:", {k: round(v, 1) for k, v in _tot.items()})
        _OVF_STATS.update(narrow=0, wide=0, dropped=0)
    # device-mirror invariant (cheap at test scale; skipped for huge
    # builds where the download would cost more than it protects — the
    # host graph is the source of truth either way)
    if n <= 100_000:
        mirror = np.asarray(graph_dev)
        if not np.array_equal(mirror, graph):
            raise AssertionError(
                "device graph mirror diverged from host graph"
            )
    return graph


def _reprune_overflow(vec_dev, graph, degrees, overflow_pairs, cfg, bp,
                      graph_dev=None):
    """Batch re-prune nodes whose back-edge insertion overflowed R
    (lib.rs:313-318: merge neighbours + the new edge, robust_prune).

    overflow_pairs: (M, 2) int32 [target v, new source u]. When
    ``graph_dev`` is given, the repruned rows are mirrored onto it and
    the updated device array is returned.
    """
    INVALID = 2**31 - 1
    tgt = overflow_pairs[:, 0]
    src = overflow_pairs[:, 1]
    # group extras by target, capped at 64 per node (fixed prune width)
    key = tgt.astype(np.int64) * (graph.shape[0] + 1) + src
    order = np.argsort(key, kind="stable")
    key_s, tgt, src = key[order], tgt[order], src[order]
    first = np.ones(len(key_s), bool)
    first[1:] = key_s[1:] != key_s[:-1]
    tgt, src = tgt[first], src[first]
    newgrp = np.ones(len(tgt), bool)
    newgrp[1:] = tgt[1:] != tgt[:-1]
    starts = np.flatnonzero(newgrp)
    gidx = np.cumsum(newgrp) - 1
    pos = np.arange(len(tgt)) - starts[gidx]
    all_nodes = tgt[newgrp]
    extras = np.full((len(all_nodes), 64), INVALID, np.int32)
    keep = pos < 64
    extras[gidx[keep], pos[keep]] = src[keep]
    n_extras = np.bincount(gidx[keep], minlength=len(all_nodes))
    _OVF_STATS["dropped"] = _OVF_STATS.get("dropped", 0) + int((~keep).sum())

    # Candidate width is bucketed: nearly every overflow target receives
    # only a handful of new back-edges per round, so most nodes prune at
    # width r+8 (the (B,C,D) gather and the (B,C,C) pairwise prune both
    # scale with C — at r=64 the narrow bucket is 1.8x/3.2x smaller);
    # the rare hub nodes use the full r+64 shape. Batch size pads to a
    # power-of-two bucket (>=1024, <=8192) so the jitted prune compiles
    # a handful of times per build. Chunking at 1024 with a per-chunk
    # host download cost a tunnel round-trip PER CHUNK (the measured
    # 'overflow' phase was ~30% of the whole 20k build); one padded
    # dispatch + ONE download per round removes all but one round-trip.
    max_chunk = 8192
    out_chunks = []
    small = n_extras <= 8
    _OVF_STATS["narrow"] += int(small.sum())
    _OVF_STATS["wide"] += int((~small).sum())
    for ewidth, sel in ((8, np.flatnonzero(small)),
                        (64, np.flatnonzero(~small))):
        c = cfg.r + ewidth
        for start in range(0, len(sel), max_chunk):
            take = sel[start : start + max_chunk]
            nodes = all_nodes[take]
            b = len(nodes)
            b_min = 256 if ewidth == 64 else 1024
            b_pad = max(b_min, 1 << (b - 1).bit_length())
            rows = graph[nodes].copy()  # int32; INVALID fits
            rows[rows < 0] = INVALID
            # under deferral a target's row may have been rebuilt (its
            # own build round, or an earlier flush chunk) since the
            # overflow was recorded — mask extras already present so the
            # candidate list never carries duplicate ids
            ext = extras[take, :ewidth]
            stale = (rows[:, :, None] == ext[:, None, :]).any(axis=1)
            ext = np.where(stale, INVALID, ext)
            cand = np.full((b_pad, c), INVALID, np.int32)
            cand[:b] = np.concatenate([rows, ext], axis=1)
            nodes_pad = np.concatenate(
                [nodes, np.zeros(b_pad - b, np.int32)]
            ).astype(np.int32)

            new_rows_dev = _score_sort_prune(
                vec_dev,
                jnp.asarray(nodes_pad),
                jnp.asarray(cand, jnp.int32),
                jnp.float32(cfg.alpha),
                jnp.float32(cfg.query_alpha),
                bp,
                jnp.asarray(
                    np.logical_or(
                        cfg.saturate_graph,
                        nodes_pad >= cfg.query_breakpoint,
                    )
                ),
                r=cfg.r,
            )
            if graph_dev is not None:
                rows = np.full(b_pad, graph.shape[0], np.int32)  # pads drop
                rows[:b] = nodes
                graph_dev = graph_dev.at[jnp.asarray(rows)].set(
                    new_rows_dev, mode="drop"
                )
            out_chunks.append((nodes, b, new_rows_dev))

    for nodes, b, new_rows_dev in out_chunks:
        new_rows = np.asarray(new_rows_dev)[:b]
        graph[nodes] = new_rows  # -1-right-padded by the prune
        degrees[nodes] = (new_rows >= 0).astype(np.int32).sum(axis=1)
    return graph_dev


@jax.jit
def _apply_graph_updates(graph_dev, rows, row_vals, tgt, slot, src):
    """Mirror a round's host graph updates onto the device copy: replace
    the batch's rows, then scatter accepted back-edges. Out-of-range
    indices (fixed-width padding) drop."""
    graph_dev = graph_dev.at[rows].set(row_vals, mode="drop")
    return graph_dev.at[tgt, slot].set(src, mode="drop")


@functools.partial(jax.jit, static_argnames=("r",))
def _score_sort_prune(
    vec_dev, nodes, cand, alpha, query_alpha, bp, saturate, r: int
):
    """Score candidates against their node, sort best-first, prune —
    fused in one jit so intermediates never round-trip eagerly."""
    valid = cand != 2**31 - 1
    csafe = jnp.where(valid, cand, 0)
    pvecs = vec_dev[nodes]
    from ..ops.gather import gather_rows, use_pallas_gather

    if use_pallas_gather():
        cvecs = gather_rows(vec_dev, csafe)
    else:
        cvecs = vec_dev[csafe]
    scores = jnp.einsum(
        "bd,bcd->bc", pvecs, cvecs, preferred_element_type=jnp.float32
    )
    scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.lexsort((cand, -scores))
    cand = jnp.take_along_axis(cand, order, 1)
    scores = jnp.take_along_axis(scores, order, 1)
    return _batched_robust_prune(
        vec_dev, nodes, cand, scores, alpha, query_alpha, bp, saturate, r=r
    )


def robust_stitch(
    vectors: np.ndarray,
    graph: np.ndarray,
    config: VamanaConfig,
    _force_sequential: bool = False,
    corpus_dev: Optional[jnp.ndarray] = None,
) -> np.ndarray:
    """OOD-DiskANN RobustStitch (lib.rs:326-374): remove base->query
    edges; refill each former in-neighbour's spare slots with the query's
    best out-neighbours (scored against the in-neighbour, capped by
    max_add_per_stitch_iter).

    corpus_dev: optional device corpus to reuse (build-width, e.g.
    bf16) instead of uploading a fresh fp32 copy — the fp32 stitch
    upload was a leading per-shard leak contributor (BENCHMARKS.md
    leak bisect). Scores still accumulate in fp32 at the MXU; the
    reduced storage width can flip genuine near-tie refill orderings,
    which the recall harness bounds like every other build-width
    relaxation in this module."""
    n = graph.shape[0]
    bp = config.query_breakpoint
    if bp >= n:
        return graph
    graph = graph.copy()
    vec_dev = (
        corpus_dev
        if corpus_dev is not None
        else jnp.asarray(vectors, jnp.float32)
    )

    # collect and delete base->query edges (vectorised: the per-row
    # python compaction cost seconds per shard at 48k nodes)
    base_rows = graph[:bp]
    is_query_edge = base_rows >= bp
    b_idx, slot_idx = np.nonzero(is_query_edge)
    edge_q = base_rows[b_idx, slot_idx]
    # compact each base row to its kept (base-id) edges, -1 right-padded
    keep = np.logical_and(base_rows >= 0, ~is_query_edge)
    order = np.argsort(~keep, axis=1, kind="stable")
    graph[:bp] = np.where(
        np.take_along_axis(keep, order, 1),
        np.take_along_axis(base_rows, order, 1),
        -1,
    )

    degrees = (graph >= 0).sum(axis=1)

    if len(b_idx) == 0:
        return graph
    # (in_neighbour, query) pairs ordered by query id then base id —
    # the reference iterates queries and their in-edge lists in order
    porder = np.lexsort((b_idx, edge_q))
    in_ns = b_idx[porder].astype(np.int32)
    qs = edge_q[porder].astype(np.int32)
    pairs = in_ns  # count proxy
    qneigh = graph[qs]  # (P, R) query out-neighbours
    valid = qneigh >= 0
    qsafe = np.where(valid, qneigh, 0)
    # chunked scoring: the (P, R, D) gather at full P is O(10 GB) on
    # large shards
    scores = np.empty(qneigh.shape, np.float32)
    chunk = 8192
    for s0 in range(0, len(pairs), chunk):
        sl = slice(s0, min(len(pairs), s0 + chunk))
        scores[sl] = np.asarray(
            jnp.einsum(
                "pd,prd->pr",
                vec_dev[jnp.asarray(in_ns[sl])],
                vec_dev[jnp.asarray(qsafe[sl])],
                preferred_element_type=jnp.float32,
            )
        )
    scores[~valid] = -np.inf
    order = np.argsort(-scores, axis=1)

    # refill with base nodes only — re-adding query ids would recreate
    # the edges stitch just removed. The add loop carries sequential
    # per-in-neighbour state (degree, membership, per-pair budget); a
    # numpy vectorisation was built and measured SLOWER than the
    # interpreted loop on this host (int64-key isin/argsort machinery
    # 2-3x the loop cost), so the exact loop runs natively instead
    # (native/diskio.cpp stitch_refill), with this python fallback.
    cand_sorted = np.ascontiguousarray(
        np.take_along_axis(qneigh, order, axis=1), np.int32
    )  # (P, R) rank-ordered
    max_add = config.max_add_per_stitch_iter

    if not _force_sequential:
        from .native_io import native_stitch_refill

        if native_stitch_refill(
            graph, degrees, in_ns, cand_sorted, bp, max_add, config.r
        ):
            return graph

    for p_idx in range(len(in_ns)):
        in_n = in_ns[p_idx]
        added = 0
        deg = degrees[in_n]
        existing = set(graph[in_n, :deg].tolist())
        for cand in cand_sorted[p_idx]:
            if added >= max_add or deg >= config.r:
                break
            if cand < 0 or cand >= bp or cand in existing:
                continue
            graph[in_n, deg] = cand
            existing.add(cand)
            deg += 1
            added += 1
        degrees[in_n] = deg
    return graph


# ---------------------------------------------------------------------------
# query-time search over an in-memory graph
# ---------------------------------------------------------------------------


def search(
    vectors: np.ndarray,
    graph: np.ndarray,
    queries: np.ndarray,
    k: int,
    config: VamanaConfig,
    start: Optional[int] = None,
    expand: int = 4,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Batched greedy search returning top-k (scores, ids, steps).

    Serving mode: pool-free (the beam buffer IS the result set) with
    multi-node beam expansion per step.
    """
    if start is None:
        start = medioid(vectors[: min(len(vectors), config.query_breakpoint)])
    vec_dev = jnp.asarray(vectors, jnp.bfloat16)
    graph_dev = jnp.asarray(graph, jnp.int32)
    q = jnp.asarray(np.atleast_2d(queries), jnp.float32)
    l = max(config.l, k)
    max_steps = config.max_search_steps or 4 * l
    buf_scores, buf_ids, steps = _batched_greedy_search(
        vec_dev, graph_dev, q, jnp.int32(start),
        jnp.int32(config.query_breakpoint),
        jnp.ones((q.shape[0],), bool),  # serving never returns OOD nodes
        l=l, maxc=l, max_steps=max_steps,
        expand=expand, collect_pool=False,
    )
    return (
        np.asarray(buf_scores)[:, :k],
        np.asarray(buf_ids)[:, :k],
        int(steps),
    )
