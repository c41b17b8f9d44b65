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


def test_resize_path_embedding_parity(tiny):
    """SURVEY hard part 1: the client-side PIL resize (Hamming down /
    Lanczos up, common.rs:43-44) and the in-graph XLA bilinear+antialias
    resize must produce CLOSE embeddings for the same image, or the two
    ingest paths drift. Bound the delta on smooth (photo-like) content;
    pure noise images are the adversarial case for any resampler pair
    and are excluded by construction.

    Measured at tiny config: cos >= 0.99 for downscale (Hamming vs
    bilinear-antialias), cos >= 0.97 for upscale (Lanczos vs bilinear).
    At SO400M shapes on the real TPU the measured drift is <= 2.2e-4
    cosine (BENCHMARKS.md "Resize-path parity at SO400M shapes",
    round 4: cos min 0.99978 over down/upscale shapes)."""
    from meme_search_engine_tpu.serving.preprocess import resize_for_embed

    cfg, params = tiny
    r = cfg.image_size

    def smooth_image(h, w, seed):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        rng = np.random.default_rng(seed)
        img = np.zeros((h, w, 3), np.float32)
        for c in range(3):
            for _ in range(4):
                fy, fx = rng.uniform(0.5, 3.0, 2)
                ph = rng.uniform(0, 2 * np.pi)
                img[..., c] += np.sin(
                    2 * np.pi * (fy * yy / h + fx * xx / w) + ph
                )
        img -= img.min()
        img *= 255.0 / max(img.max(), 1e-6)
        return img.astype(np.uint8)

    for h, w, min_cos in ((r * 3 + 7, r * 2 + 3, 0.99), (r - 3, r - 5, 0.97)):
        img = smooth_image(h, w, seed=h)
        client = resize_for_embed(img, (r, r))[None]
        e_client = np.asarray(
            siglip.encode_image(
                params, jnp.asarray(client), cfg, preprocessed=False
            )
        )[0]
        e_graph = np.asarray(
            siglip.encode_image(params, jnp.asarray(img[None]), cfg)
        )[0]
        cos = float(e_client @ e_graph)
        assert cos >= min_cos, (h, w, cos)


def test_encoder_text_fused_matches_xla():
    """The fused short-sequence text encoder (_encoder_text: row-view
    resident kernels + hpp-batched attention) matches the plain XLA
    encoder numerically (interpret mode on CPU)."""
    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(6), cfg)
    blocks = params["txt"]["blocks"]
    rng = np.random.default_rng(7)
    dt = blocks["ln1"]["g"].dtype
    x = jnp.asarray(
        rng.standard_normal((2, cfg.text_len, cfg.text_width)), dt
    )
    ref = np.asarray(
        siglip._encoder(x, blocks, cfg.text_num_heads), np.float32
    )
    fused = np.asarray(
        siglip._encoder_text(
            x, blocks, cfg.text_num_heads, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(fused, ref, atol=5e-2)
    # odd batch too (row view falls back to 8-row blocks, hpp to 2)
    x3 = jnp.asarray(
        rng.standard_normal((3, cfg.text_len, cfg.text_width)), dt
    )
    ref3 = np.asarray(
        siglip._encoder(x3, blocks, cfg.text_num_heads), np.float32
    )
    fused3 = np.asarray(
        siglip._encoder_text(
            x3, blocks, cfg.text_num_heads, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(fused3, ref3, atol=5e-2)


def test_encoder_text_fused_knob_combos_match_xla(monkeypatch):
    """Every routable sub-block combo (fused QKV/o/MLP, row-view and
    nq knobs) is numerically identical to the XLA encoder — the knobs
    only change blocking, never math."""
    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(8), cfg)
    blocks = params["txt"]["blocks"]
    rng = np.random.default_rng(9)
    dt = blocks["ln1"]["g"].dtype
    x = jnp.asarray(
        rng.standard_normal((2, cfg.text_len, cfg.text_width)), dt
    )
    ref = np.asarray(
        siglip._encoder(x, blocks, cfg.text_num_heads), np.float32
    )
    monkeypatch.setenv("MSE_TEXT_RQ", "16")
    monkeypatch.setenv("MSE_TEXT_NQ", "2")
    monkeypatch.setenv("MSE_TEXT_QKV", "fused")
    monkeypatch.setenv("MSE_TEXT_O", "fused")
    fused = np.asarray(
        siglip._encoder_text(
            x, blocks, cfg.text_num_heads, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(fused, ref, atol=5e-2)
    # an invalid rq/nq pair falls back instead of asserting
    monkeypatch.setenv("MSE_TEXT_RQ", "24")
    monkeypatch.setenv("MSE_TEXT_NQ", "5")
    fused2 = np.asarray(
        siglip._encoder_text(
            x, blocks, cfg.text_num_heads, interpret=True
        ),
        np.float32,
    )
    np.testing.assert_allclose(fused2, ref, atol=5e-2)
