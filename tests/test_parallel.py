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


def test_sharded_search_perdevice_flops_scale(corpus_1k):
    """SPMD scaling evidence without multi-chip hardware: the compiled
    per-device FLOP count of the corpus-sharded search must drop ~1/n as
    the mesh grows (each chip scans only its corpus slice; only k
    candidates per shard cross the interconnect). Validates the P7/P8
    scaling pattern (SURVEY SS2.10) analytically on the CPU mesh."""
    corpus = np.concatenate([corpus_1k, np.zeros((24, 128), np.float16)])
    q = np.random.default_rng(0).standard_normal((4, 128)).astype(np.float32)

    argbytes = {}
    for n in (1, 2, 4, 8):
        mesh = meshlib.make_mesh(n, model_parallel=1)
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(meshlib.DATA, None)
        )
        dev_corpus = jax.device_put(jnp.asarray(corpus), sharding)
        compiled = (
            sharded_mips_topk.lower(
                dev_corpus, jnp.asarray(q), 20, mesh, tile=128
            ).compile()
        )
        # each device holds 1/n of the corpus slice...
        assert dev_corpus.addressable_shards[0].data.shape[0] == corpus.shape[0] // n
        argbytes[n] = compiled.memory_analysis().argument_size_in_bytes
        # ...and the merge is a collective, not replicated work
        if n > 1:
            assert "all-gather" in compiled.as_text()

    # per-device inputs (dominated by the corpus slice) scale ~1/n
    assert argbytes[8] < argbytes[1] / 4, argbytes
    assert argbytes[2] < argbytes[1] / 1.6, argbytes


def test_two_process_distributed_psum(tmp_path):
    """Multi-host (DCN) smoke test: two OS processes, each owning its own
    CPU devices, form one JAX distributed system and agree on a global
    psum — the communication pattern of the multi-pod path (SURVEY
    SS2.10 P7: dp pods over DCN)."""
    import subprocess
    import sys

    prog = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
pid = int(sys.argv[1])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:29517", num_processes=2, process_id=pid
)
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
import numpy as np
assert jax.device_count() == 4 and jax.process_count() == 2
mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
@jax.jit
def gsum(x):
    return jax.shard_map(
        lambda v: jax.lax.psum(v, "data"), mesh=mesh,
        in_specs=P("data"), out_specs=P(), check_vma=False,
    )(x)
local = jnp.arange(4, dtype=jnp.float32)
sharding = jax.sharding.NamedSharding(mesh, P("data"))
arr = jax.make_array_from_process_local_data(sharding, np.arange(4, dtype=np.float32)[2*pid:2*pid+2], (4,))
out = gsum(arr)
from jax.experimental import multihost_utils
val = np.asarray(multihost_utils.process_allgather(out, tiled=True))
assert float(val.ravel()[0]) == 6.0, val
print("OK", pid)
"""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", prog, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=120)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "OK" in out


def test_engine_perdevice_flops_scale():
    """dp scaling evidence for the EMBEDDING path (the search path has
    the analogous test above): at fixed global batch, the per-device
    compiled FLOPs of both towers drop ~1/n with mesh size. The full
    curve (incl. wall time on the shared-core CPU mesh) is
    tools_profile_engine_scaling.py / BENCHMARKS.md."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from meme_search_engine_tpu.models import siglip

    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    imgs = np.random.default_rng(0).integers(
        0, 256, (16, cfg.image_size, cfg.image_size, 3), dtype=np.uint8
    )
    flops = {}
    for n in (1, 4):
        m = meshlib.make_mesh(n, model_parallel=1)
        rep = NamedSharding(m, P())
        p_dev = jax.device_put(params, jax.tree.map(lambda _: rep, params))
        b_dev = jax.device_put(
            jnp.asarray(imgs), NamedSharding(m, P(meshlib.DATA))
        )
        compiled = (
            jax.jit(lambda pp, bb: siglip.encode_image(pp, bb, cfg))
            .lower(p_dev, b_dev)
            .compile()
        )
        flops[n] = compiled.cost_analysis()["flops"]
    assert flops[4] < flops[1] / 3.2, flops
