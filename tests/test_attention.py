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


def test_fat_vit_mha_interpret_matches_masked_xla():
    """fat_vit_mha with the const-column mask/partition tricks equals
    masked XLA attention on the valid rows (interpret mode)."""
    from meme_search_engine_tpu.ops.attention import (
        fat_layout_ok,
        fat_vit_mha,
        fat_width,
    )

    B, SP, NV, H, D = 2, 16, 11, 16, 7
    C = fat_width(D)
    assert fat_layout_ok(H, D, SP)
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, SP, H, D)).astype(np.float32)
    k = rng.standard_normal((B, SP, H, D)).astype(np.float32)
    v = rng.standard_normal((B, SP, H, D)).astype(np.float32)

    def fat(x, const_valid, const_pad, scale=1.0):
        f = np.zeros((B, SP, H, C), np.float32)
        f[:, :, :, :D] = x * scale
        f[:, :NV, :, D] = const_valid
        f[:, NV:, :, D] = const_pad
        return jnp.asarray(f.reshape(B, SP, H * C))

    qf = fat(q, 1.0, 1.0, scale=1.0 / D**0.5)
    # k fat layout: valid rows carry k features (const col 0); pad rows
    # are zero except -1e30 in the const col (the MXU-baked mask)
    kf_np = np.zeros((B, SP, H, C), np.float32)
    kf_np[:, :NV, :, :D] = k[:, :NV]
    kf_np[:, NV:, :, D] = -1e30
    kf = jnp.asarray(kf_np.reshape(B, SP, H * C))
    vf = fat(v, 1.0, 0.0)

    out = np.asarray(
        fat_vit_mha(qf, kf, vf, H, D, nq=2, interpret=True)
    ).reshape(B, SP, H, D)

    # masked XLA reference over valid keys only
    scores = np.einsum("bqhd,bkhd->bhqk", q, k[:, :NV]) / (D**0.5)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, v[:, :NV])
    np.testing.assert_allclose(out[:, :NV], ref[:, :NV], atol=2e-2)


def test_fat_vit_mha_packed_proj_matches_unfused(qkv=None):
    """The fused attention+o-projection+residual kernel equals the
    unfused composition (fat_vit_mha_packed -> @wo + bo + res) on the
    same packed input. The fused kernel measured SLOWER e2e (203 vs 218
    img/s) and is not on the hot path, but stays correct and available."""
    import jax.numpy as jnp

    from meme_search_engine_tpu.ops.attention import (
        fat_vit_mha_packed,
        fat_vit_mha_packed_proj,
        fat_width,
    )

    B, SP, H, D, DM, NQ = 2, 16, 4, 8, 24, 2
    C = fat_width(D)
    rng = np.random.default_rng(3)
    qkvf = np.zeros((B, SP, 3, H, C), np.float32)
    qkvf[..., :D] = rng.standard_normal((B, SP, 3, H, D))
    qkvf[:, :, 0, :, D] = 1.0  # q const column
    qkvf[:, :, 2, :, D] = 1.0  # v const column
    qkvf = jnp.asarray(qkvf.reshape(B, SP, 3 * H * C))
    wo = jnp.asarray(rng.standard_normal((H * D, DM)), jnp.float32)
    bo = jnp.asarray(rng.standard_normal(DM), jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, SP, DM)), jnp.float32)

    fused = np.asarray(
        fat_vit_mha_packed_proj(
            qkvf, wo, bo, res, H, D, nq=NQ, interpret=True
        )
    )
    attn = fat_vit_mha_packed(qkvf, H, D, nq=NQ, interpret=True)
    ref = np.asarray(attn @ wo + bo + res)
    np.testing.assert_allclose(fused, ref, atol=1e-4)
