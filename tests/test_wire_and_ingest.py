"""Wire codecs, filename codec, thumbnailer, DB staging."""

import numpy as np
import pytest

from meme_search_engine_tpu.ingest import filename as fncodec
from meme_search_engine_tpu.ingest.db import IngestDB
from meme_search_engine_tpu.ingest.thumbnailer import (
    IMAGE_FORMATS,
    fnv1a64,
    format_bitmask,
    generate_thumbnails,
    thumbnail_hash_key,
)
from meme_search_engine_tpu.serving.wire import (
    QueryTerm,
    fuse_terms,
    parse_query_request,
)
from meme_search_engine_tpu.utils.fp16 import (
    decode_fp16_buffer,
    encode_fp16_buffer,
)


def test_fp16_roundtrip():
    v = np.array([0.5, -1.25, 3.0], np.float32)
    out = decode_fp16_buffer(encode_fp16_buffer(v))
    np.testing.assert_array_equal(out, v)
    # wire format is little-endian fp16: 0.5 == 0x3800
    assert encode_fp16_buffer(np.array([0.5]))[:2] == b"\x00\x38"


def test_filename_codec_roundtrip():
    a = fncodec.Actual("memes/cat.png")
    assert fncodec.decode_filename(fncodec.encode_filename(a)) == a
    v = fncodec.VideoFrame("memes/clip.mp4", 3)
    enc = fncodec.encode_filename(v)
    assert enc[0] == 0  # NUL prefix marks video frames (main.rs:167-199)
    assert fncodec.decode_filename(enc) == v
    assert fncodec.container_of(v) == "memes/clip.mp4"


def test_fnv1a64_known_vector():
    # standard FNV-1a test vectors
    assert fnv1a64(b"") == 0xCBF29CE484222325
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C


def test_thumbnail_hash_key_stable():
    k1 = thumbnail_hash_key(fncodec.Actual("x/y.png"))
    k2 = thumbnail_hash_key(fncodec.Actual("x/y.png"))
    assert k1 == k2 and "=" not in k1 and "/" not in k1 and "+" not in k1


def test_generate_thumbnails():
    from PIL import Image

    img = Image.new("RGB", (1000, 500), (200, 30, 40))
    out = generate_thumbnails(
        fncodec.Actual("t.png"), img, original_filesize=10**9
    )
    assert "jpegl" in out and "jpeg256kb" in out
    name, data = out["jpegl"]
    assert name.endswith("jpegl.jpg") and len(data) > 0
    # jpeg256kb respects the size budget (main.rs:300-321)
    assert len(out["jpeg256kb"][1]) <= 256_000


def test_format_bitmask():
    fmts = sorted(IMAGE_FORMATS) + ["VIDEO"]
    mask = format_bitmask(["jpegl", "VIDEO"], fmts)
    assert mask & (1 << fmts.index("jpegl"))
    assert mask & (1 << fmts.index("VIDEO"))
    assert not mask & (1 << fmts.index("jpegh"))


def test_db_staging_idempotent(tmp_path):
    db = IngestDB(str(tmp_path / "t.db"))
    fn = fncodec.encode_filename(fncodec.Actual("a.png"))
    rec = db.stage_file(fn, 1_000_000, want_ocr=False, want_thumbs=True)
    assert rec.needs_embed and rec.needs_thumbnail
    db.write_embedding(fn, np.ones(16, np.float32))
    db.write_thumbnails(fn, {"jpegl": "xjpegl.jpg"})
    db.commit()
    rec = db.stage_file(fn, 1_000_000, want_ocr=False, want_thumbs=True)
    assert not rec.needs_embed and not rec.needs_thumbnail
    # newer mtime retriggers all stages (main.rs:722-744)
    rec = db.stage_file(fn, 10**18, want_ocr=False, want_thumbs=True)
    assert rec.needs_embed and rec.needs_thumbnail
    rows = list(db.iter_indexable())
    assert len(rows) == 1 and rows[0][1].shape == (16,)


def test_predefined_embeddings_roundtrip(tmp_path):
    db = IngestDB(str(tmp_path / "t.db"))
    db.set_predefined_embedding("Meme", np.arange(8, dtype=np.float32))
    got = db.predefined_embeddings()
    np.testing.assert_allclose(got["Meme"], np.arange(8), rtol=1e-3)


def test_fuse_terms_weighted_sum():
    d = 8

    def embed_text(texts):
        return np.stack([np.full(d, float(len(t))) for t in texts])

    def embed_images(imgs):
        return np.stack([np.ones(d) for _ in imgs])

    import base64

    terms = [
        QueryTerm(text="ab", weight=2.0),          # 2 * [2.0]*8
        QueryTerm(embedding=[1.0] * d, weight=-1.0),  # negative weight
        QueryTerm(predefined_embedding="Meme", weight=0.5),
        QueryTerm(image=base64.b64encode(b"fake").decode(), weight=3.0),
    ]
    total = fuse_terms(
        terms,
        d,
        embed_text=embed_text,
        embed_images=embed_images,
        predefined_embeddings={"Meme": np.full(d, 4.0)},
    )
    np.testing.assert_allclose(total, np.full(d, 4.0 - 1.0 + 2.0 + 3.0))


def test_parse_query_request():
    req = parse_query_request(
        {
            "terms": [{"text": "cat", "weight": 0.5}, {"embedding": [1, 2]}],
            "k": 10,
            "include_video": True,
        }
    )
    assert req.k == 10 and req.include_video
    assert req.terms[0].text == "cat" and req.terms[1].embedding == [1, 2]


def test_ocr_chunking():
    from PIL import Image

    from meme_search_engine_tpu.ingest.ocr import chunk_image, scan_chunks

    img = Image.new("RGB", (100, 2500))
    chunks = chunk_image(img)
    assert [c[0] for c in chunks] == [0, 1024, 2048]
    assert chunks[-1][1].height == 2500 - 2048

    def fake_backend(png):
        return [("word", (1.0, 2.0, 3.0, 4.0))]

    segs = scan_chunks(img, fake_backend)
    # y offsets corrected per strip
    assert [s[1][1] for s in segs] == [2.0, 1026.0, 2050.0]


def test_ocr_fts_search(tmp_path):
    """FTS5 OCR text search kept in sync by triggers (mse.py:131-158)."""
    db = IngestDB(str(tmp_path / "fts.db"))
    fn1 = fncodec.encode_filename(fncodec.Actual("a.png"))
    fn2 = fncodec.encode_filename(fncodec.Actual("b.png"))
    db.stage_file(fn1, 1, want_ocr=True, want_thumbs=False)
    db.stage_file(fn2, 1, want_ocr=True, want_thumbs=False)
    db.write_ocr(fn1, "hello distributed systems", b"[]")
    db.write_ocr(fn2, "cat picture", b"[]")
    db.commit()
    hits = db.search_ocr_text("distributed")
    assert [h[0] for h in hits] == [fn1]
    assert db.search_ocr_text("cat") == [(fn2, hits[0][1])] or len(
        db.search_ocr_text("cat")
    ) == 1


def test_ocr_fts_reocr_and_delete(tmp_path):
    """Re-OCR replaces (not duplicates) FTS rows; deleting the file row
    purges them (the v4 trigger migration)."""
    db = IngestDB(str(tmp_path / "fts2.db"))
    fn = fncodec.encode_filename(fncodec.Actual("x.png"))
    db.stage_file(fn, 1, want_ocr=True, want_thumbs=False)
    db.write_ocr(fn, "first pass text", b"[]")
    db.write_ocr(fn, "second pass text", b"[]")
    db.commit()
    assert db.search_ocr_text("first") == []
    hits = db.search_ocr_text("second")
    assert [h[0] for h in hits] == [fn]
    rows = db.conn.execute(
        "SELECT COUNT(*) FROM ocr_fts WHERE filename = ?", (fn,)
    ).fetchone()[0]
    assert rows == 1
    db.delete_file(fn)
    db.commit()
    assert db.search_ocr_text("second") == []


def test_video_frame_extraction_e2e(tmp_path):
    """Real video decode through the OpenCV backend: write an mp4 with
    three visually distinct scenes, extract frames with the reference
    filtergraph semantics (thumbnail-per-interval + scene>0.05 select,
    video_reader.rs:28-39), and require one frame per scene."""
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    from meme_search_engine_tpu.ingest import video

    assert video.video_available()
    path = str(tmp_path / "scenes.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    assert w.isOpened()
    rng = np.random.default_rng(0)
    scenes = [
        np.full((48, 64, 3), col, np.uint8)
        + rng.integers(0, 20, (48, 64, 3), dtype=np.uint8)
        for col in ((200, 30, 30), (30, 200, 30), (30, 30, 200))
    ]
    for scene in scenes:
        for _ in range(12):
            w.write(scene[..., ::-1])  # RGB -> BGR
    w.release()

    frames = list(video.extract_frames(path, interval_s=1.0))
    # one representative frame per scene (first always kept)
    assert len(frames) == 3, len(frames)
    for f, scene in zip(frames, scenes):
        assert f.shape == (48, 64, 3)
        # dominant channel matches the scene colour
        assert np.argmax(f.mean(axis=(0, 1))) == np.argmax(
            scene.mean(axis=(0, 1))
        )
    # static video -> only the first frame survives the scene gate
    path2 = str(tmp_path / "static.mp4")
    w = cv2.VideoWriter(path2, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for _ in range(30):
        w.write(scenes[0][..., ::-1])
    w.release()
    assert len(list(video.extract_frames(path2, interval_s=1.0))) == 1

    # max_dim downscale path
    frames = list(
        video.extract_frames(path, interval_s=1.0, max_dim=32)
    )
    assert frames and max(frames[0].shape[:2]) <= 32


def test_lens_response_parser_fixture():
    """_parse_lens_response against a reconstructed AF_initDataCallback
    payload with the reference's exact structure (ocr.rs:50-133):
    segments at data[3][4][0][0], regions at data[2][3][0] gated on
    element 11 == "text:*", fraction coords rationalized to pixels."""
    import os

    from meme_search_engine_tpu.ingest.ocr import _parse_lens_response

    html = open(
        os.path.join(os.path.dirname(__file__), "fixtures", "lens_response.html")
    ).read()
    segs = _parse_lens_response(html, 800, 600)
    assert [t for t, _ in segs] == [
        "TOP TEXT OF THE MEME",
        "don't panic",
        'he said "bottom text"',
    ]
    # rationalize_coords_format1: x=(cx-w/2)*W, y=(cy-h/2)*H, w=w*W, h=h*H
    assert segs[0][1] == (
        round((0.5 - 0.8 / 2) * 800),
        round((0.1 - 0.05 / 2) * 600),
        round(0.8 * 800),
        round(0.05 * 600),
    )
    assert segs[1][1] == (round((0.25 - 0.15) * 800), round((0.3 - 0.02) * 600),
                          round(0.3 * 800), round(0.04 * 600))
    # the "image:logo-0" region is skipped; segment 2 zips with the
    # THIRD text region
    assert segs[2][1][2] == round(0.4 * 800)

    # error payloads and pages without a ds:1 callback parse to []
    err = html.replace(
        "hash: '2', data:", "hash: '2', errorHasStatus: true, data:", 1
    )
    assert _parse_lens_response(err, 800, 600) == []
    assert _parse_lens_response("<html>nope</html>", 800, 600) == []


def test_search_batcher_fuses_concurrent_dispatches():
    """SearchBatcher must (a) coalesce queries that arrive while a
    dispatch is in flight into one device call, (b) return each caller
    its own exact top-k rows (pow2 pad on batch and k sliced away),
    (c) hand back the index snapshot it searched."""
    import asyncio

    from meme_search_engine_tpu.index.flat import FlatIndex, IndexHandle
    from meme_search_engine_tpu.ingest.filename import Actual
    from meme_search_engine_tpu.serving.query_server import SearchBatcher

    rng = np.random.default_rng(0)
    n, d = 256, 32
    vecs = rng.standard_normal((n, d)).astype(np.float16)
    index = FlatIndex.build(vecs, [Actual(f"f{i}") for i in range(n)])

    calls = []
    real_search = index.search

    def counting_search(queries, k):
        calls.append((len(queries), k))
        return real_search(queries, k)

    index.search = counting_search
    batcher = SearchBatcher(IndexHandle(index))

    qs = rng.standard_normal((12, d)).astype(np.float32)
    ks = [5, 20, 3, 20, 7, 20, 5, 3, 20, 7, 5, 3]

    async def run():
        return await asyncio.gather(
            *[batcher.search(qs[i], ks[i]) for i in range(12)]
        )

    results = asyncio.new_event_loop().run_until_complete(run())

    # far fewer dispatches than queries (first arrival may dispatch
    # alone; everything queued behind it must ride one batch)
    assert len(calls) < 12, calls
    # every batch row count and k is a power of two
    for b, k in calls:
        assert b & (b - 1) == 0, calls
        assert k & (k - 1) == 0, calls
    # exact per-query results at each caller's own k
    oracle = qs @ vecs.astype(np.float32).T
    for i, (s, idx, snap) in enumerate(results):
        assert snap is index
        assert s.shape == (ks[i],) and idx.shape == (ks[i],)
        want = np.argsort(-oracle[i])[: ks[i]]
        assert set(idx.tolist()) == set(want.tolist())


def test_search_batcher_pipelines_two_inflight():
    """With max_inflight=2, a slow in-flight dispatch must not block a
    second batch from dispatching concurrently — and every caller still
    gets its own exact rows."""
    import asyncio
    import threading
    import time as _time

    from meme_search_engine_tpu.index.flat import FlatIndex, IndexHandle
    from meme_search_engine_tpu.ingest.filename import Actual
    from meme_search_engine_tpu.serving.query_server import SearchBatcher

    rng = np.random.default_rng(1)
    n, d = 128, 16
    vecs = rng.standard_normal((n, d)).astype(np.float16)
    index = FlatIndex.build(vecs, [Actual(f"f{i}") for i in range(n)])

    concurrent = {"now": 0, "max": 0}
    lock = threading.Lock()
    real_search = index.search

    def slow_search(queries, k):
        with lock:
            concurrent["now"] += 1
            concurrent["max"] = max(concurrent["max"], concurrent["now"])
        _time.sleep(0.05)  # a tunnel-scale round-trip
        try:
            return real_search(queries, k)
        finally:
            with lock:
                concurrent["now"] -= 1

    index.search = slow_search
    batcher = SearchBatcher(IndexHandle(index), max_batch=2, max_inflight=2)

    qs = rng.standard_normal((8, d)).astype(np.float32)

    async def run():
        return await asyncio.gather(
            *[batcher.search(qs[i], 5) for i in range(8)]
        )

    results = asyncio.new_event_loop().run_until_complete(run())
    # max_batch=2 forces 4 batches; with 2 runners at least two must
    # have overlapped in time
    assert concurrent["max"] == 2, concurrent
    oracle = qs @ vecs.astype(np.float32).T
    for i, (s, idx, snap) in enumerate(results):
        assert snap is index
        want = np.argsort(-oracle[i])[:5]
        assert set(idx.tolist()) == set(want.tolist())


def test_search_batcher_resolves_waiters_on_any_drain_error():
    """An exception anywhere in the drain loop (not just inside the
    executor call) must resolve every dequeued waiter with the error —
    a dead drain task with dequeued futures would hang those HTTP
    requests until client timeout — and later batches must still work."""
    import asyncio

    from meme_search_engine_tpu.index.flat import FlatIndex, IndexHandle
    from meme_search_engine_tpu.ingest.filename import Actual
    from meme_search_engine_tpu.serving.query_server import SearchBatcher

    rng = np.random.default_rng(2)
    n, d = 64, 16
    vecs = rng.standard_normal((n, d)).astype(np.float16)
    index = FlatIndex.build(vecs, [Actual(f"f{i}") for i in range(n)])
    batcher = SearchBatcher(IndexHandle(index))

    good = rng.standard_normal((d,)).astype(np.float32)
    bad = rng.standard_normal((d + 3,)).astype(np.float32)  # poisons np.stack

    async def run():
        # same batch: one good + one shape-poisoned query
        r = await asyncio.gather(
            batcher.search(good, 5),
            batcher.search(bad, 5),
            return_exceptions=True,
        )
        # both resolved (no hang); at least the bad one is an error
        assert all(x is not None for x in r)
        assert any(isinstance(x, Exception) for x in r)
        # the batcher survives: a fresh query succeeds
        s, idx, snap = await asyncio.wait_for(batcher.search(good, 5), 10.0)
        assert snap is index and idx.shape == (5,)

    asyncio.new_event_loop().run_until_complete(run())
