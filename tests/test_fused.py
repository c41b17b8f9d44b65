"""Unit parity tests for the fused LN/MLP Pallas kernels (ops/fused.py).

Interpret mode on CPU; reference is the naive fp32 composition the
kernels replace (models.siglip._layer_norm/_dense/_mlp numerics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meme_search_engine_tpu.ops.fused import (
    ln_matmul,
    ln_mlp_residual,
    matmul_residual,
)


def _ref_ln(x, g, b):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * g + b).astype(x.dtype)


def _mk(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.bfloat16) * 0.5


@pytest.mark.parametrize("resident", [False, True])
@pytest.mark.parametrize("nq", [1, 2])
def test_ln_mlp_residual_parity(resident, nq):
    b, sp, d, m = 2, 32, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = _mk(ks[0], b, sp, d)
    g = jnp.abs(_mk(ks[1], d)) + 0.5
    bb = _mk(ks[2], d)
    w1 = _mk(ks[3], d, m)
    b1 = _mk(ks[4], m)
    w2 = _mk(ks[5], m, d)
    b2 = _mk(ks[6], d)

    got = ln_mlp_residual(
        x, g, bb, w1, b1, w2, b2, nq=nq, mh=128,
        resident=resident, interpret=True,
    )

    xn = _ref_ln(x, g.astype(jnp.float32), bb.astype(jnp.float32))
    h = jnp.dot(xn, w1, preferred_element_type=jnp.float32) + b1.astype(
        jnp.float32
    )
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    want = (
        x.astype(jnp.float32)
        + jnp.dot(h, w2, preferred_element_type=jnp.float32)
        + b2.astype(jnp.float32)
    ).astype(x.dtype)

    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=0.05,
        atol=0.05,
    )


def test_ln_mlp_residual_resident_pads_hidden():
    # m not a multiple of mh: pad lanes must be exact no-ops
    b, sp, d, m = 1, 16, 128, 192
    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    x = _mk(ks[0], b, sp, d)
    g = jnp.ones((d,), jnp.bfloat16)
    bb = jnp.zeros((d,), jnp.bfloat16)
    w1 = _mk(ks[3], d, m)
    b1 = _mk(ks[4], m)
    w2 = _mk(ks[5], m, d)
    b2 = _mk(ks[6], d)
    got = ln_mlp_residual(
        x, g, bb, w1, b1, w2, b2, nq=1, mh=128, resident=True,
        interpret=True,
    )
    ref = ln_mlp_residual(
        x, g, bb, w1, b1, w2, b2, nq=1, mh=64, resident=False,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.02, atol=0.02,
    )


def test_ln_matmul_and_matmul_residual_parity():
    b, sp, d, n = 2, 16, 128, 256
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = _mk(ks[0], b, sp, d)
    g = jnp.abs(_mk(ks[1], d)) + 0.5
    bb = _mk(ks[2], d)
    w = _mk(ks[3], d, n)
    bias = _mk(ks[4], n)
    got = ln_matmul(x, g, bb, w, bias, nq=2, interpret=True)
    xn = _ref_ln(x, g.astype(jnp.float32), bb.astype(jnp.float32))
    want = (
        jnp.dot(xn, w, preferred_element_type=jnp.float32)
        + bias.astype(jnp.float32)
    ).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )

    res = _mk(ks[5], b, sp, d)
    w2 = _mk(ks[3], n, d)
    got2 = matmul_residual(got, w2, bb, res, nq=2, interpret=True)
    want2 = (
        jnp.dot(got, w2, preferred_element_type=jnp.float32)
        + bb.astype(jnp.float32)
        + res.astype(jnp.float32)
    ).astype(x.dtype)
    np.testing.assert_allclose(
        np.asarray(got2, np.float32), np.asarray(want2, np.float32),
        rtol=0.05, atol=0.05,
    )
