"""ChainQ: Viterbi optimality vs exhaustive enumeration + training."""

import itertools

import numpy as np
import pytest

from meme_search_engine_tpu.index.chainq import (
    ChainQuantizer,
    train_chainq,
    viterbi_encode,
)


def _chain_codebooks(rng, m, h, d):
    """Codebooks whose supports overlap only between neighbours (the
    chain assumption: codebook i covers chunks i and i+1)."""
    dpc = d // m
    cb = np.zeros((m, h, d), np.float32)
    for i in range(m):
        lo = i * dpc
        hi = min(d, (i + 2) * dpc)
        cb[i, :, lo:hi] = rng.standard_normal((h, hi - lo))
    return cb


def test_viterbi_is_optimal():
    """DP result equals brute-force minimisation of ||x - sum c||^2 over
    all H^M code combinations."""
    rng = np.random.default_rng(0)
    m, h, d = 3, 4, 12
    cb = _chain_codebooks(rng, m, h, d)
    x = rng.standard_normal((16, d)).astype(np.float32)

    import jax.numpy as jnp

    codes = np.asarray(viterbi_encode(jnp.asarray(x), jnp.asarray(cb)))

    for n_i in range(16):
        best_cost, best = np.inf, None
        for combo in itertools.product(range(h), repeat=m):
            recon = sum(cb[i, combo[i]] for i in range(m))
            cost = np.sum((x[n_i] - recon) ** 2)
            if cost < best_cost:
                best_cost, best = cost, combo
        got_recon = sum(cb[i, codes[n_i, i]] for i in range(m))
        got_cost = np.sum((x[n_i] - got_recon) ** 2)
        assert got_cost <= best_cost + 1e-4, (n_i, got_cost, best_cost)


def test_train_chainq_and_roundtrip():
    rng = np.random.default_rng(1)
    d, m, h = 16, 4, 8
    x = rng.standard_normal((256, d)).astype(np.float32)
    cq = train_chainq(x, m, h, n_iters=3, seed=0)
    assert cq.codebooks.shape == (m, h, d)
    # transform stays orthonormal through Procrustes updates
    np.testing.assert_allclose(
        cq.transform @ cq.transform.T, np.eye(d), atol=1e-3
    )
    codes = cq.encode(x)
    assert codes.shape == (256, m) and codes.max() < h

    # reconstruction beats the zero baseline
    xt = x @ cq.transform.T
    recon = cq.reconstruct(codes)
    assert np.mean((recon - xt) ** 2) < np.mean(xt**2)

    # ADC-style LUT scoring approximates q . x~
    q = rng.standard_normal(d).astype(np.float32)
    lut = cq.preprocess_query(q)
    adc = lut[np.arange(m)[None, :], codes].sum(1)
    exact = recon @ (q @ cq.transform.T)
    assert np.corrcoef(adc, exact)[0, 1] > 0.99

    cq2 = ChainQuantizer.from_msgpack(cq.to_msgpack())
    np.testing.assert_array_equal(cq2.encode(x[:16]), codes[:16])
