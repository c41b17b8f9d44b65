"""Quantizer stack: OPQ runtime parity vs numpy oracle, training sanity,
artifact round-trips (SURVEY SS4: quantizer-quality test layer)."""

import numpy as np
import pytest

from meme_search_engine_tpu.index.opq import ProductQuantizer, train_opq


def _oracle_pq(rng, d=64, c=16, dpc=8):
    centroids = rng.standard_normal((c, d)).astype(np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    return ProductQuantizer(
        centroids=centroids,
        transform=q.astype(np.float32),
        n_dims_per_code=dpc,
        n_dims=d,
    )


def _oracle_quantize(pq, x):
    xt = x @ pq.transform.T
    codes = np.zeros((x.shape[0], pq.n_chunks), np.uint8)
    for k in range(pq.n_chunks):
        lo, hi = k * pq.n_dims_per_code, (k + 1) * pq.n_dims_per_code
        sims = xt[:, lo:hi] @ pq.centroids[:, lo:hi].T
        codes[:, k] = np.argmax(sims, axis=1)
    return codes


def _oracle_adc(pq, query, codes):
    qt = query @ pq.transform.T
    lut = np.zeros((pq.n_chunks, pq.n_centroids), np.float32)
    for k in range(pq.n_chunks):
        lo, hi = k * pq.n_dims_per_code, (k + 1) * pq.n_dims_per_code
        lut[k] = pq.centroids[:, lo:hi] @ qt[lo:hi]
    return np.array(
        [sum(lut[k, codes[i, k]] for k in range(pq.n_chunks)) for i in range(len(codes))]
    )


def test_quantize_matches_oracle():
    rng = np.random.default_rng(0)
    pq = _oracle_pq(rng)
    x = rng.standard_normal((32, 64)).astype(np.float32)
    np.testing.assert_array_equal(pq.quantize(x), _oracle_quantize(pq, x))


def test_adc_matches_oracle():
    rng = np.random.default_rng(1)
    pq = _oracle_pq(rng)
    x = rng.standard_normal((32, 64)).astype(np.float32)
    codes = pq.quantize(x)
    q = rng.standard_normal(64).astype(np.float32)
    lut = pq.preprocess_query(q)
    got = pq.asymmetric_dot(lut, codes)
    want = _oracle_adc(pq, q, codes)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_adc_approximates_true_dot():
    """ADC score ~ q.x~ (reconstruction); ordering should correlate with
    the exact ordering (opq_test.py-style sanity)."""
    rng = np.random.default_rng(2)
    pq = _oracle_pq(rng, d=64, c=64, dpc=4)
    x = rng.standard_normal((256, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = rng.standard_normal(64).astype(np.float32)
    adc = pq.asymmetric_dot(pq.preprocess_query(q), pq.quantize(x))
    exact = x @ (q @ pq.transform.T @ pq.transform)  # == x @ q
    corr = np.corrcoef(adc, exact)[0, 1]
    assert corr > 0.5, corr


def test_msgpack_roundtrip():
    rng = np.random.default_rng(3)
    pq = _oracle_pq(rng)
    pq2 = ProductQuantizer.from_msgpack(pq.to_msgpack())
    np.testing.assert_allclose(pq2.centroids, pq.centroids, rtol=1e-6)
    np.testing.assert_allclose(pq2.transform, pq.transform, rtol=1e-6)
    assert pq2.n_dims_per_code == pq.n_dims_per_code
    x = rng.standard_normal((8, 64)).astype(np.float32)
    np.testing.assert_array_equal(pq2.quantize(x), pq.quantize(x))


def test_train_opq_reduces_query_error():
    """Trained OPQ beats an identity-rotation random-codebook baseline on
    the query-aware objective it optimises (aopq_train.py:31-33)."""
    rng = np.random.default_rng(4)
    # clustered synthetic data so quantization has structure to find
    centers = rng.standard_normal((8, 32)).astype(np.float32) * 2
    x = (
        centers[rng.integers(0, 8, 512)]
        + rng.standard_normal((512, 32)).astype(np.float32) * 0.3
    )
    queries = rng.standard_normal((64, 32)).astype(np.float32)

    pq = train_opq(
        x,
        queries,
        n_chunks=8,
        n_centroids=16,
        outer_iters=2,
        adam_iters=40,
        batch_size=512,
        query_batch_size=64,
        seed=0,
    )
    # orthonormality of learned rotation
    eye = pq.transform @ pq.transform.T
    np.testing.assert_allclose(eye, np.eye(32), atol=1e-3)

    def query_err(p):
        xt = x @ p.transform.T
        codes = _oracle_quantize(p, x)
        recon = np.zeros_like(xt)
        for k in range(p.n_chunks):
            lo, hi = k * p.n_dims_per_code, (k + 1) * p.n_dims_per_code
            recon[:, lo:hi] = p.centroids[codes[:, k], lo:hi]
        qt = queries @ p.transform.T
        return float(np.mean((qt @ (xt - recon).T) ** 2))

    base = ProductQuantizer(
        centroids=x[rng.permutation(512)[:16]].astype(np.float32),
        transform=np.eye(32, dtype=np.float32),
        n_dims_per_code=4,
        n_dims=32,
    )
    assert query_err(pq) < query_err(base), (query_err(pq), query_err(base))


def test_adc_batched_and_descriptor():
    import jax.numpy as jnp

    from meme_search_engine_tpu.ops.adc import (
        adc_scores_batched,
        descriptor_scores,
    )

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 16, (40, 8), dtype=np.uint8)
    luts = rng.standard_normal((3, 8, 16)).astype(np.float32)
    got = np.asarray(adc_scores_batched(jnp.asarray(codes), jnp.asarray(luts)))
    want = np.stack(
        [
            [sum(luts[b, m, codes[n, m]] for m in range(8)) for n in range(40)]
            for b in range(3)
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)

    # descriptor sliders: weight * 1/512 scaling (query_disk_index.rs:468)
    desc = rng.integers(0, 256, (40, 4), dtype=np.uint8)
    scales = np.array([1.0 / 512, 0, -0.5 / 512, 0], np.float32)
    ds = np.asarray(descriptor_scores(jnp.asarray(desc), jnp.asarray(scales)))
    np.testing.assert_allclose(ds, desc.astype(np.float32) @ scales, rtol=1e-5)


def test_adc_pallas_matches_xla_interpret():
    """Pallas gather-ADC kernel == one-hot reference (interpret mode)."""
    import jax.numpy as jnp

    from meme_search_engine_tpu.ops.adc import (
        adc_scores_batched,
        adc_scores_pallas,
    )

    rng = np.random.default_rng(9)
    codes = rng.integers(0, 256, (300, 16), dtype=np.uint8)
    luts = rng.standard_normal((3, 16, 256)).astype(np.float32)
    ref = np.asarray(adc_scores_batched(jnp.asarray(codes), jnp.asarray(luts)))
    got = np.asarray(
        adc_scores_pallas(jnp.asarray(codes), jnp.asarray(luts), interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
