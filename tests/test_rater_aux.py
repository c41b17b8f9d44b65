"""Rater evaluation, crawler paging, scorer pipeline, SAE tools."""

import json

import jax
import numpy as np
import pytest

from meme_search_engine_tpu.models.score_model import (
    ScoreModelConfig,
    init_ensemble,
)
from meme_search_engine_tpu.rater.evaluate import (
    auroc,
    loss_curves,
    pairwise_auroc,
    percentile_sheet,
    roc_curve,
)


def test_auroc_perfect_and_random():
    labels = np.array([1, 1, 1, 0, 0, 0], bool)
    scores = np.array([3.0, 2.5, 2.0, 1.0, 0.5, 0.1])
    assert auroc(labels, scores) == pytest.approx(1.0)
    assert auroc(labels, -scores) == pytest.approx(0.0)
    fpr, tpr = roc_curve(labels, scores)
    assert fpr[-1] == 1.0 and tpr[-1] == 1.0


def test_pairwise_auroc():
    scores = np.array([5.0, 3.0, 1.0])
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2)]
    prefers = [True, True, False, True]  # consistent with score order
    assert pairwise_auroc(scores, pairs, prefers) == pytest.approx(1.0)


def test_percentile_sheet():
    names = [f"m{i}.png" for i in range(100)]
    scores = np.arange(100, dtype=np.float32)
    html = percentile_sheet(names, scores, per_bucket=3)
    assert html.startswith("<!doctype") and "p50" in html and "<img" in html


def test_loss_curves(tmp_path):
    p = tmp_path / "log.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"step": 0, "loss": 1.0, "val_loss": 1.1}) + "\n")
        f.write(json.dumps({"step": 1, "loss": 0.5}) + "\n")
    curves = loss_curves(str(p))
    assert curves["loss"] == [1.0, 0.5] and curves["val_loss"] == [1.1]


def test_crawler_paging_and_ratelimit():
    from meme_search_engine_tpu.rater.crawler import crawl_multireddit

    pages = {
        None: {"data": {"children": [{"data": {"id": "a"}}], "after": "t3_x"}},
        "t3_x": {"data": {"children": [{"data": {"id": "b"}}], "after": None}},
    }
    calls = {"n": 0, "slept": 0}

    def fetch(url):
        calls["n"] += 1
        if calls["n"] == 1:
            return 429, {"retry-after": "1"}, b""
        after = None
        if "after=" in url:
            after = url.split("after=")[1].split("&")[0]
        return 200, {"x-ratelimit-remaining": "50"}, json.dumps(pages[after]).encode()

    posts = list(
        crawl_multireddit(
            "u", "memes", fetch=fetch, sleep=lambda s: calls.__setitem__("slept", s)
        )
    )
    assert [p["id"] for p in posts] == ["a", "b"]
    assert calls["slept"] == 1.0  # respected retry-after


def test_meme_pipeline_filter():
    from meme_search_engine_tpu.rater.meme_pipeline import (
        filter_candidates,
        near_duplicates,
    )

    cfg = ScoreModelConfig(d_emb=16, n_hidden=1, n_ensemble=4, output_channels=1)
    params = init_ensemble(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((10, 16)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    library = np.concatenate([embs[:2], rng.standard_normal((5, 16))])
    library /= np.linalg.norm(library, axis=1, keepdims=True)

    dups = near_duplicates(embs, library)
    assert dups[0] and dups[1] and not dups[5:].any()

    urls = [f"u{i}" for i in range(10)]
    accepted = filter_candidates(
        urls, embs, params, library, score_threshold=-np.inf
    )
    accepted_urls = {c.url for c in accepted}
    assert "u0" not in accepted_urls and "u1" not in accepted_urls
    assert len(accepted) == 8
    # sorted by score descending
    scores = [c.score for c in accepted]
    assert scores == sorted(scores, reverse=True)


def test_sae_tools(tmp_path):
    from meme_search_engine_tpu.models.sae import SAEConfig, init_sae
    from meme_search_engine_tpu.models.sae_tools import (
        exemplar_sheet_html,
        feature_exemplars,
        open_embeddings_memmap,
        shuffle_embeddings_file,
    )

    rng = np.random.default_rng(1)
    data = rng.standard_normal((100, 8)).astype(np.float16)
    p_in = str(tmp_path / "e.bin")
    p_out = str(tmp_path / "s.bin")
    data.tofile(p_in)
    mm = open_embeddings_memmap(p_in, 8)
    assert mm.shape == (100, 8)
    shuffle_embeddings_file(p_in, p_out, 8, chunk=32, seed=0)
    shuffled = open_embeddings_memmap(p_out, 8)
    assert shuffled.shape == (100, 8)
    assert not np.array_equal(np.asarray(shuffled), np.asarray(mm))
    # same multiset of rows
    assert sorted(map(tuple, np.asarray(shuffled).tolist())) == sorted(
        map(tuple, np.asarray(mm).tolist())
    )

    cfg = SAEConfig(d_emb=8, d_hidden=16, top_k=4)
    params = init_sae(jax.random.PRNGKey(0), cfg)

    def search_fn(emb, k):
        return [(1.0 - 0.1 * i, f"img{i}.png") for i in range(k)]

    ex = feature_exemplars(params, search_fn, [0, 3], k=4)
    assert set(ex.keys()) == {0, 3}
    html = exemplar_sheet_html(ex, image_prefix="/thumb/")
    assert "feature 0 (positive)" in html and "/thumb/img0.png" in html


def test_rater_server_app(tmp_path):
    """Label UI endpoints (rater_server.py parity)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from meme_search_engine_tpu.rater.data import RatingsDB
    from meme_search_engine_tpu.rater.server import make_app

    db = RatingsDB(str(tmp_path / "r.db"))
    rng = np.random.default_rng(2)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    from PIL import Image

    for i in range(3):
        db.add_file(f"m{i}.png", rng.standard_normal(8))
        Image.new("RGB", (10, 10)).save(img_dir / f"m{i}.png")
    db.push_queue([("m0.png", "m1.png")])

    async def run():
        client = TestClient(TestServer(make_app(db, str(img_dir))))
        await client.start_server()
        try:
            resp = await client.get("/")
            text = await resp.text()
            assert "m0.png" in text and "m1.png" in text
            resp = await client.post(
                "/rate",
                json={"m1": "m0.png", "m2": "m1.png", "axis": "meme", "rating": "1+"},
            )
            assert resp.status == 200
            resp = await client.get("/image/m2.png")
            assert resp.status == 200
        finally:
            await client.close()

    asyncio.run(run())
    pairs, targets, names = db.pairs()
    assert ("m0.png", "m1.png") in names
