"""RaBitQ, scalar quantizer, balanced k-means."""

import numpy as np

from meme_search_engine_tpu.index.kmeans import (
    SPILL_K,
    assign_top_k,
    balanced_kmeans,
)
from meme_search_engine_tpu.index.rabitq import RaBitQ, train_rabitq
from meme_search_engine_tpu.index.scalar import (
    ScalarQuantizer,
    train_scalar_quantizer,
)


def _unit(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_rabitq_roundtrip_and_accuracy():
    rng = np.random.default_rng(0)
    x = _unit(rng, 256, 64)
    rq = train_rabitq(x, output_dims=64, seed=1)
    signs, dots, norms = rq.quantize(x)
    assert signs.shape == (256, 64) and signs.dtype == bool
    q = _unit(rng, 1, 64)[0]
    approx = rq.approx_dot(signs, dots, norms, q)
    exact = x @ q
    # 1-bit codes at full output_dims: strong rank correlation expected
    corr = np.corrcoef(approx, exact)[0, 1]
    assert corr > 0.7, corr

    rq2 = RaBitQ.from_msgpack(rq.to_msgpack())
    signs2, dots2, _ = rq2.quantize(x)
    np.testing.assert_array_equal(signs2, signs)
    np.testing.assert_allclose(dots2, dots, rtol=1e-5)

    packed = RaBitQ.pack_bits(signs)
    assert packed.shape == (256, 8)
    np.testing.assert_array_equal(RaBitQ.unpack_bits(packed, 64), signs)


def test_scalar_quantizer_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((512, 32)).astype(np.float32) * 0.1
    sq = train_scalar_quantizer(x)
    codes = sq.quantize(x)
    assert codes.dtype == np.uint8
    recon = sq.dequantize(codes)
    # quantile-clipped 8-bit: tight reconstruction in the bulk
    err = np.abs(recon - x[:, sq.permutation])
    assert np.quantile(err, 0.99) < (0.8 / 255) * 2  # ~2 steps

    sq2 = ScalarQuantizer.from_msgpack(sq.to_msgpack())
    np.testing.assert_array_equal(sq2.quantize(x), codes)


def test_scalar_integer_dot_monotone():
    """Integer dot must preserve ordering of true dots (it's used as a
    scoring proxy, scalar_quantize.py:130-146)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 32)).astype(np.float32) * 0.1
    sq = train_scalar_quantizer(x)
    codes = sq.quantize(x)
    q = codes[0:1]
    int_dots = sq.integer_dot(np.repeat(q, 64, 0), codes)
    true_dots = (sq.dequantize(q) @ sq.dequantize(codes).T)[0]
    rank_int = np.argsort(int_dots)
    rank_true = np.argsort(true_dots)
    from scipy.stats import spearmanr  # noqa — fallback below if missing

    tau = np.corrcoef(
        np.argsort(rank_int), np.argsort(rank_true)
    )[0, 1]
    assert tau > 0.95, tau


def test_balanced_kmeans_balance():
    rng = np.random.default_rng(3)
    x = _unit(rng, 2000, 16)
    k = 8
    centroids = balanced_kmeans(x, k, max_iter=150, seed=0, target_frac=0.3)
    assert centroids.shape == (k, 16)
    np.testing.assert_allclose(
        np.linalg.norm(centroids, axis=1), 1.0, rtol=1e-5
    )
    idx = np.asarray(assign_top_k(x, centroids))
    assert idx.shape == (2000, SPILL_K)
    # balance: worst top-1 cluster within 2.5x ideal (uniform data is easy)
    counts = np.bincount(idx[:, 0], minlength=k)
    assert counts.max() < 2.5 * (2000 / k), counts
    # spill assignments differ from primary
    assert np.all(idx[:, 0] != idx[:, 1])
