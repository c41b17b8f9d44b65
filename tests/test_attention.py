"""Attention implementations: XLA reference vs Pallas fused (interpret
mode on CPU) vs blocked flash."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meme_search_engine_tpu.ops.attention import (
    flash_mha,
    fused_mha_pallas,
    mha,
    mha_xla,
)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    shape = (2, 24, 4, 16)  # (B, S, H, Dh)
    return tuple(
        jnp.asarray(rng.standard_normal(shape), jnp.float32) for _ in range(3)
    )


def test_pallas_matches_xla_interpret(qkv):
    q, k, v = qkv
    ref = np.asarray(mha_xla(q, k, v))
    for stable in ("row", "scalar", "none"):
        got = np.asarray(fused_mha_pallas(q, k, v, stable=stable, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_flash_matches_xla(qkv):
    q, k, v = qkv
    ref = np.asarray(mha_xla(q, k, v))
    got = np.asarray(flash_mha(q, k, v, block_q=8, block_k=8))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_mha_dispatch_cpu(qkv):
    """On CPU the dispatcher must take the XLA path."""
    q, k, v = qkv
    out = np.asarray(mha(q, k, v))
    np.testing.assert_allclose(out, np.asarray(mha_xla(q, k, v)), rtol=1e-5)


def test_causal_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 6, 2, 8)), jnp.float32)
    out = np.asarray(mha(q, q, q, causal=True))
    # position 0 attends only to itself: output == v[0]
    np.testing.assert_allclose(out[0, 0], np.asarray(q)[0, 0], rtol=1e-5)
