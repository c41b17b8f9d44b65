"""MIPS search core: exact-oracle parity, tiling edge cases, dedup."""

import jax.numpy as jnp
import numpy as np

from meme_search_engine_tpu.index.flat import FlatIndex, IndexHandle
from meme_search_engine_tpu.ops.mips import dedup_matches, exact_scores, mips_topk


def _brute(corpus, queries, k):
    s = corpus.astype(np.float32) @ queries.astype(np.float32).T  # (N,B)
    order = np.argsort(-s, axis=0, kind="stable")[:k].T  # (B,k)
    return order


def test_mips_topk_matches_bruteforce(corpus_1k):
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, 128)).astype(np.float32)
    scores, idx = mips_topk(jnp.asarray(corpus_1k), jnp.asarray(q), 10, tile=256)
    expected = _brute(corpus_1k, q, 10)
    # recall@10 == 1.0 against the oracle (ties may permute)
    for b in range(4):
        assert set(np.asarray(idx)[b].tolist()) == set(expected[b].tolist())
    # scores descending + correct values
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)
    exact = np.asarray(exact_scores(jnp.asarray(corpus_1k), jnp.asarray(q)))
    for b in range(4):
        np.testing.assert_allclose(
            s[b], np.sort(exact[b])[::-1][:10], rtol=1e-3, atol=1e-3
        )


def test_mips_topk_non_multiple_tile(corpus_1k):
    """N=1000 not a multiple of tile=384: pad rows must never appear."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 128)).astype(np.float32)
    _, idx = mips_topk(jnp.asarray(corpus_1k), jnp.asarray(q), 50, tile=384)
    assert np.asarray(idx).max() < 1000


def test_mips_topk_k_larger_than_n():
    corpus = np.eye(8, 128, dtype=np.float16)
    q = np.zeros((1, 128), np.float32)
    q[0, 0] = 1.0
    scores, idx = mips_topk(jnp.asarray(corpus), jnp.asarray(q), 100, tile=256)
    assert scores.shape == (1, 8)
    assert int(np.asarray(idx)[0, 0]) == 0


def test_flat_index_build_and_search(corpus_1k):
    index = FlatIndex.build(corpus_1k, [f"f{i}" for i in range(1000)])
    q = corpus_1k[7:8].astype(np.float32)
    scores, idx = index.search(q, 5)
    assert idx[0, 0] == 7  # self-recall@1 on the exact vector
    assert scores[0, 0] > 0.99


def test_index_handle_swap(corpus_1k):
    h = IndexHandle()
    assert h.index is None
    a = FlatIndex.build(corpus_1k[:10], list(range(10)))
    b = FlatIndex.build(corpus_1k[:20], list(range(20)))
    h.swap(a)
    assert len(h.index) == 10
    old = h.swap(b)
    assert old is a and len(h.index) == 20


def test_dedup_matches():
    """Near-duplicates (cos>0.95) of a higher-ranked result are dropped
    (reference threshold: query_disk_index.rs:99)."""
    base = np.random.default_rng(3).standard_normal(64).astype(np.float32)
    base /= np.linalg.norm(base)
    near = base + 0.01 * np.random.default_rng(4).standard_normal(64).astype(np.float32)
    far = -base
    embs = jnp.asarray(np.stack([base, near, far]))
    scores = jnp.asarray([3.0, 2.0, 1.0])
    keep = np.asarray(dedup_matches(embs, scores, 0.95))
    assert keep.tolist() == [True, False, True]


def test_dedup_matches_greedy_chain():
    """Greedy retain (query_disk_index.rs:514-527): A>B>C with
    sim(A,B)>t, sim(B,C)>t, sim(A,C)<=t keeps C — C is only compared
    against KEPT items, and B was dropped."""
    a = np.zeros(8, np.float32)
    a[0] = 1.0
    # b is near a; c is near b but far from a
    theta_ab = 0.25  # cos ~ 0.969 > 0.95
    theta_ac = 0.50  # cos ~ 0.878 < 0.95
    b = np.array([np.cos(theta_ab), np.sin(theta_ab)] + [0] * 6, np.float32)
    c = np.array([np.cos(theta_ac), np.sin(theta_ac)] + [0] * 6, np.float32)
    assert float(a @ b) > 0.95 and float(b @ c) > 0.95 and float(a @ c) <= 0.95
    embs = jnp.asarray(np.stack([a, b, c]))
    keep = np.asarray(dedup_matches(embs, jnp.asarray([3.0, 2.0, 1.0]), 0.95))
    assert keep.tolist() == [True, False, True]


def test_streamed_mips_topk_matches_resident(corpus_1k):
    """Host-slab streaming (the >HBM eval path) is globally exact: same
    ids as a single resident-corpus top-k, across slab boundaries."""
    from meme_search_engine_tpu.ops.mips import streamed_mips_topk

    rng = np.random.default_rng(3)
    q = rng.standard_normal((5, 128)).astype(np.float32)
    _, ref_i = mips_topk(jnp.asarray(corpus_1k), jnp.asarray(q), 20, tile=256)

    def slabs():
        for s0 in range(0, 1000, 300):  # uneven final slab
            yield corpus_1k[s0 : s0 + 300], s0

    s, i = streamed_mips_topk(slabs(), q, 20, tile=128)
    for b in range(5):
        assert set(i[b].tolist()) == set(np.asarray(ref_i)[b].tolist())
    assert np.all(np.diff(s, axis=1) <= 1e-6)
