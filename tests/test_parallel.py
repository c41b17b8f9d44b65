"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meme_search_engine_tpu.parallel import mesh as meshlib
from meme_search_engine_tpu.parallel.sharded import (
    ShardedFlatIndex,
    sharded_mips_topk,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return meshlib.make_mesh(8, model_parallel=1)


@pytest.fixture(scope="module")
def mesh4x2():
    return meshlib.make_mesh(8, model_parallel=2)


def test_sharded_search_matches_single_chip(mesh8, corpus_1k):
    from meme_search_engine_tpu.ops.mips import mips_topk

    rng = np.random.default_rng(5)
    q = rng.standard_normal((3, 128)).astype(np.float32)
    # pad corpus to multiple of 8 shards
    corpus = np.concatenate([corpus_1k, np.zeros((24, 128), np.float16)])
    sharding = jax.sharding.NamedSharding(
        mesh8, jax.sharding.PartitionSpec(meshlib.DATA, None)
    )
    dev_corpus = jax.device_put(jnp.asarray(corpus), sharding)
    s_sh, i_sh = sharded_mips_topk(dev_corpus, jnp.asarray(q), 20, mesh8, tile=128)
    s_ref, i_ref = mips_topk(jnp.asarray(corpus), jnp.asarray(q), 20, tile=256)
    for b in range(3):
        assert set(np.asarray(i_sh)[b].tolist()) == set(
            np.asarray(i_ref)[b].tolist()
        )
    np.testing.assert_allclose(np.asarray(s_sh), np.asarray(s_ref), rtol=1e-4)


def test_sharded_index_wrapper(mesh8, corpus_1k):
    idx = ShardedFlatIndex(corpus_1k, mesh8, tile=128)
    q = corpus_1k[42:43].astype(np.float32)
    s, i = idx.search(q, 5)
    assert i[0, 0] == 42
    assert i.max() < 1000  # pad sentinels excluded


def test_siglip_tp_dp_train_step(mesh4x2):
    """Full train step with real dp+tp shardings compiles and runs."""
    import optax

    from meme_search_engine_tpu.models import siglip
    from meme_search_engine_tpu.parallel.train import (
        make_train_state,
        make_train_step,
    )

    cfg = siglip.tiny_test_config()
    params, optimizer, opt_state = make_train_state(
        jax.random.PRNGKey(0), cfg, mesh4x2
    )
    step = make_train_step(cfg, mesh4x2, optimizer)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1, 1, (8, cfg.image_size, cfg.image_size, 3)), jnp.float32
    )
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, cfg.text_len)), jnp.int32)
    params2, opt_state2, loss = step(params, opt_state, images, tokens)
    assert np.isfinite(float(loss))
    # params actually updated
    delta = jax.tree.reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x.astype(jnp.float32)))),
        jax.tree.map(lambda a, b: a - b, params, params2),
        0.0,
    )
    assert delta > 0
    # tp sharding is real: fc1 kernel is split over the model axis
    fc1 = params2["img"]["blocks"]["mlp"]["fc1"]["w"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(
        None, None, meshlib.MODEL
    )


def test_encode_under_mesh_matches_single_device(mesh4x2):
    """Tensor-parallel inference returns the same embeddings."""
    from meme_search_engine_tpu.models import siglip
    from meme_search_engine_tpu.parallel.mesh import shard_params

    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(1), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(1).integers(
            0, 256, (4, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
        )
    )
    ref = np.asarray(siglip.encode_image(params, imgs, cfg))
    sharded = shard_params(params, mesh4x2)
    out = np.asarray(siglip.encode_image(sharded, imgs, cfg))
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_checkpoint_roundtrip(mesh4x2, tmp_path):
    """Sharded train state save/restore (orbax)."""
    from meme_search_engine_tpu.models import siglip
    from meme_search_engine_tpu.parallel.checkpoint import (
        restore_train_state,
        save_train_state,
    )
    from meme_search_engine_tpu.parallel.train import make_train_state

    cfg = siglip.tiny_test_config()
    params, opt, opt_state = make_train_state(
        jax.random.PRNGKey(3), cfg, mesh4x2
    )
    save_train_state(str(tmp_path / "ckpt"), params, opt_state, step=50)
    p2, os2, step = restore_train_state(
        str(tmp_path / "ckpt"), params, opt_state
    )
    assert step == 50
    a = params["img"]["patch_embed"]["w"]
    b = p2["img"]["patch_embed"]["w"]
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )
    # restored arrays keep their mesh sharding
    assert b.sharding.spec == a.sharding.spec


def test_engine_multichip_dp(mesh8):
    """Engine with a mesh shards request batches over the data axis and
    matches single-device outputs."""
    from meme_search_engine_tpu.models import siglip
    from meme_search_engine_tpu.serving.engine import EmbeddingEngine

    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    single = EmbeddingEngine(params, cfg, max_batch=16)
    multi = EmbeddingEngine(params, cfg, max_batch=16, mesh=mesh8)
    rng = np.random.default_rng(0)
    imgs = rng.integers(
        0, 256, (16, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
    )
    np.testing.assert_allclose(
        multi.embed_image_arrays(imgs),
        single.embed_image_arrays(imgs),
        rtol=2e-2, atol=2e-3,
    )
    texts = ["a", "b c", "d e f"]
    np.testing.assert_allclose(
        multi.embed_texts(texts), single.embed_texts(texts), rtol=2e-2, atol=2e-3
    )
