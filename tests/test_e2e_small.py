"""End-to-end small-scale slice: ingest -> index -> HTTP query API.

Covers the reference's minimum product loop (SURVEY SS7 phase 2):
a folder of images is ingested with a tiny SigLIP, the flat index is
built and served, and the JSON/msgpack wire contracts round-trip.
"""

import asyncio
import io
import json

import msgpack
import numpy as np
import pytest

from meme_search_engine_tpu.utils.fp16 import decode_fp16_buffer


def _make_library(tmp_path, n=6):
    from PIL import Image

    lib = tmp_path / "memes"
    lib.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(lib / f"img{i}.png")
    return lib


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from meme_search_engine_tpu.ingest.pipeline import IngestService

    tmp_path = tmp_path_factory.mktemp("e2e")
    lib = _make_library(tmp_path)
    config = {
        "files": str(lib),
        "db_path": str(tmp_path / "state.db"),
        "thumbs_path": str(tmp_path / "thumbs"),
        "enable_thumbs": True,
        "tiny_model": True,
        "max_batch_size": 4,
    }

    async def build():
        svc = await IngestService.create(config)
        status = await svc.reload()
        return svc, status

    svc, status = asyncio.new_event_loop().run_until_complete(build())
    return svc, status, tmp_path


def test_ingest_builds_index(service):
    svc, status, _ = service
    assert "indexed 6 items" in status
    assert len(svc.handle.index) == 6


def test_ingest_idempotent(service):
    svc, _, _ = service

    async def again():
        return await svc.ingest()

    stats = asyncio.new_event_loop().run_until_complete(again())
    assert stats.embedded == 0 and stats.deleted == 0


def test_thumbnails_written(service):
    svc, _, tmp_path = service
    thumbs = list((tmp_path / "thumbs").iterdir())
    assert len(thumbs) >= 6  # at least one format per image


def test_query_api_roundtrip(service):
    svc, _, _ = service
    from aiohttp.test_utils import TestClient, TestServer

    from meme_search_engine_tpu.serving.query_server import make_app

    async def run():
        app = make_app(
            svc.handle,
            svc.embedder,
            predefined=svc.predefined_embeddings,
            formats=svc.formats,
            extensions=svc.extensions,
        )
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # FrontendInit (common.rs:176-181)
            resp = await client.get("/")
            init = await resp.json()
            assert init["n_total"] == 6
            assert init["d_emb"] == svc.embedder.config.embedding_size

            # text query
            resp = await client.post(
                "/", json={"terms": [{"text": "a cat"}], "k": 3}
            )
            body = await resp.json()
            assert len(body["matches"]) == 3
            score, fname, thumb_key, mask, dims = body["matches"][0][:5]
            assert isinstance(score, float) and fname.startswith("img")
            assert isinstance(mask, int) and dims == [48, 64]
            assert body["formats"] == svc.formats

            # negative-weight + raw-embedding fusion must flip ranking
            d = svc.embedder.config.embedding_size
            base = await client.post(
                "/", json={"terms": [{"text": "a cat"}], "k": 6}
            )
            base_top = (await base.json())["matches"][0][1]
            flipped = await client.post(
                "/",
                json={"terms": [{"text": "a cat", "weight": -1.0}], "k": 6},
            )
            flip_matches = (await flipped.json())["matches"]
            assert flip_matches[-1][1] == base_top
        finally:
            await client.close()

    asyncio.run(run())


def test_clip_server_wire_contract(service):
    """msgpack embedding API parity (clip_server.py:151-191)."""
    svc, _, _ = service
    from aiohttp.test_utils import TestClient, TestServer
    from PIL import Image

    from meme_search_engine_tpu.serving.clip_server import make_app

    engine = svc.embedder.engine  # InProcessEmbedder in tiny mode

    async def run():
        app = make_app(engine, {"max_batch_size": 4, "model_name": "tiny"})
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            resp = await client.get("/config")
            cfg = msgpack.unpackb(await resp.read(), raw=False)
            assert cfg["embedding_size"] == engine.cfg.d_emb
            assert cfg["batch"] == 4

            resp = await client.get("/")
            assert resp.status == 204

            buf = io.BytesIO()
            Image.new("RGB", (30, 30), (255, 0, 0)).save(buf, "PNG")
            resp = await client.post(
                "/", data=msgpack.packb({"images": [buf.getvalue()]})
            )
            assert resp.status == 200
            out = msgpack.unpackb(await resp.read(), raw=False)
            emb = decode_fp16_buffer(out[0])
            assert emb.shape == (engine.cfg.d_emb,)
            np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-2)

            resp = await client.post(
                "/", data=msgpack.packb({"text": ["hello world"]})
            )
            assert resp.status == 200
            out = msgpack.unpackb(await resp.read(), raw=False)
            assert decode_fp16_buffer(out[0]).shape == (engine.cfg.d_emb,)

            # oversized batch -> 500 with error string
            resp = await client.post(
                "/", data=msgpack.packb({"text": ["x"] * 99})
            )
            assert resp.status == 500

            resp = await client.get("/metrics")
            assert resp.status in (200, 501)
        finally:
            await client.close()

    asyncio.run(run())


def test_pow2_buckets():
    """Greedy pow2 batch decomposition (clip_accursed.py:77-91 pattern)."""
    from meme_search_engine_tpu.serving.engine import pow2_buckets

    assert pow2_buckets(1, 128) == [1]
    assert pow2_buckets(128, 128) == [128]
    assert pow2_buckets(100, 128) == [64, 32, 4]
    assert pow2_buckets(300, 128) == [128, 128, 32, 8, 4]
    assert sum(pow2_buckets(77, 16)) == 77
    assert max(pow2_buckets(77, 16)) <= 16


def test_engine_bucketing_consistency(service):
    """Bucketed split must give identical embeddings to one batch."""
    svc, _, _ = service
    engine = svc.embedder.engine
    rng = np.random.default_rng(9)
    r = engine.cfg.image_size
    imgs = rng.integers(0, 256, (5, r, r, 3), dtype=np.uint8)  # 5 -> 4+1
    full = engine.embed_image_arrays(imgs)
    parts = np.concatenate(
        [engine.embed_image_arrays(imgs[:4]), engine.embed_image_arrays(imgs[4:])]
    )
    np.testing.assert_allclose(full, parts, rtol=1e-4, atol=1e-5)
