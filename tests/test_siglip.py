"""SigLIP tower tests (tiny config; numeric invariants + shape contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meme_search_engine_tpu.models import siglip


@pytest.fixture(scope="module")
def tiny():
    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_encode_image_shape_and_norm(tiny):
    cfg, params = tiny
    imgs = np.random.default_rng(0).integers(
        0, 256, (3, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
    )
    emb = siglip.encode_image(params, jnp.asarray(imgs), cfg)
    assert emb.shape == (3, cfg.d_emb)
    assert emb.dtype == jnp.float32
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5
    )


def test_encode_image_resize_path(tiny):
    """Non-native-resolution input goes through in-graph resize."""
    cfg, params = tiny
    imgs = np.random.default_rng(1).integers(0, 256, (2, 50, 40, 3), dtype=np.uint8)
    emb = siglip.encode_image(params, jnp.asarray(imgs), cfg)
    assert emb.shape == (2, cfg.d_emb)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_encode_text_shape_and_norm(tiny):
    cfg, params = tiny
    toks = np.random.default_rng(0).integers(
        0, cfg.vocab_size, (4, cfg.text_len), dtype=np.int32
    )
    emb = siglip.encode_text(params, jnp.asarray(toks), cfg)
    assert emb.shape == (4, cfg.d_emb)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5
    )


def test_batch_independence(tiny):
    """Embedding of an item must not depend on batch composition
    (dynamic-batching server correctness; clip_server batches arbitrary
    requests together)."""
    cfg, params = tiny
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (4, cfg.image_size, cfg.image_size, 3), dtype=np.uint8)
    full = np.asarray(siglip.encode_image(params, jnp.asarray(imgs), cfg))
    solo = np.asarray(siglip.encode_image(params, jnp.asarray(imgs[1:2]), cfg))
    np.testing.assert_allclose(full[1], solo[0], rtol=3e-2, atol=3e-3)


def test_siglip_loss_finite_and_differentiable(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(
        rng.uniform(-1, 1, (2, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    toks = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (2, cfg.text_len)), jnp.int32
    )
    loss, grads = jax.value_and_grad(siglip.siglip_loss)(params, imgs, toks, cfg)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x.astype(jnp.float32)))),
        grads,
        0.0,
    )
    assert gnorm > 0


def test_param_count_so400m():
    """Full-size tree has ~877M params total (both towers; the ViT alone
    is ~428M as in the reference model card)."""
    cfg = siglip.SO400M_14_384
    # count analytically without materialising full params
    shapes = jax.eval_shape(lambda k: siglip.init_params(k, cfg), jax.random.PRNGKey(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 8.5e8 < n < 9.5e8


def test_fat_attention_path_matches_xla():
    """The production fat-layout attention path (padded rows, masked MAP
    pooling, MXU-baked mask/partition tricks) matches the XLA encoder
    numerically (interpret mode on CPU)."""
    import dataclasses

    cfg_fat = siglip.tiny_fat_test_config("fat_interpret")
    cfg_xla = dataclasses.replace(cfg_fat, attn_impl="xla")
    params = siglip.init_params(jax.random.PRNGKey(2), cfg_fat)
    imgs = np.random.default_rng(3).integers(
        0, 256, (2, cfg_fat.image_size, cfg_fat.image_size, 3), dtype=np.uint8
    )
    e_fat = np.asarray(siglip.encode_image(params, jnp.asarray(imgs), cfg_fat))
    e_xla = np.asarray(siglip.encode_image(params, jnp.asarray(imgs), cfg_xla))
    np.testing.assert_allclose(e_fat, e_xla, atol=5e-2)
    cos = (e_fat * e_xla).sum(-1)
    assert cos.min() > 0.999, cos


def test_fat_text_tower_matches_xla():
    """The fat-layout encoder path for the text tower (seq 64 is already
    row-aligned, no masking) matches the XLA encoder numerically."""
    import dataclasses

    cfg_fat = siglip.tiny_fat_test_config("fat_interpret")
    # make the TEXT tower fat-capable too (16 heads x fat_width(7)=8)
    cfg_fat = dataclasses.replace(
        cfg_fat, text_width=112, text_num_heads=16, text_len=16
    )
    cfg_xla = dataclasses.replace(cfg_fat, attn_impl="xla")
    params = siglip.init_params(jax.random.PRNGKey(4), cfg_fat)
    toks = np.random.default_rng(5).integers(
        0, cfg_fat.vocab_size, (3, cfg_fat.text_len)
    ).astype(np.int32)
    e_fat = np.asarray(siglip.encode_text(params, jnp.asarray(toks), cfg_fat))
    e_xla = np.asarray(siglip.encode_text(params, jnp.asarray(toks), cfg_xla))
    np.testing.assert_allclose(e_fat, e_xla, atol=5e-2)
    cos = (e_fat * e_xla).sum(-1)
    assert cos.min() > 0.999, cos
