"""Scraper URL triage + NDJSON reader (offline-testable parts)."""

import io
import json

import numpy as np
import pytest

from meme_search_engine_tpu.pipeline.scraper import (
    iter_reddit_dump,
    needs_html_extraction,
    triage_url,
)


def test_triage_rejects_non_images():
    assert triage_url("https://www.reddit.com/r/foo/comments/x") is None
    assert triage_url("https://example.com/page.html") is None
    assert triage_url("https://vimeo.com/12345") is None
    assert triage_url("https://i.imgur.com/abc.gifv") is None
    assert triage_url("https://example.com/nothing-here") is None


def test_triage_accepts_and_rewrites():
    # direct image accepted, http upgraded
    assert (
        triage_url("http://i.example.com/a.jpg")
        == "https://i.example.com/a.jpg"
    )
    # bare imgur page -> direct file
    assert (
        triage_url("https://imgur.com/aBcD123")
        == "https://i.imgur.com/aBcD123.jpg"
    )
    # youtube watch link -> thumbnail API
    out = triage_url("https://youtu.be/dQw4w9WgXcQ")
    assert out == "https://i.ytimg.com/vi/dQw4w9WgXcQ/maxresdefault.jpg"
    # html entity unescape
    assert "&amp;" not in triage_url("https://cdn.example.com/a.png?x=1&amp;y=2")


def test_html_extraction_hosts():
    assert needs_html_extraction("https://imgur.com/a/abc123") is not None
    assert needs_html_extraction("https://imgur.com/gallery/abc") is not None
    assert needs_html_extraction("https://i.imgur.com/abc.jpg") is None


def test_iter_reddit_dump(tmp_path):
    import zstandard

    rows = [
        {"url": "https://i.example.com/a.jpg", "title": "x", "author": "u",
         "subreddit": "memes", "id": "1", "created_utc": 100, "over_18": False},
        {"url": "https://i.example.com/b.jpg", "title": "y", "author": "[deleted]",
         "subreddit": "memes", "id": "2", "created_utc": "101", "over_18": False},
        {"url": "https://i.example.com/c.jpg", "title": "z", "author": "v",
         "subreddit": "memes", "id": "3", "created_utc": 102.5, "over_18": True},
        {"url": "https://i.example.com/d.jpg", "title": "w", "author": "t",
         "subreddit": None, "id": "4", "created_utc": "103"},
    ]
    raw = "\n".join(json.dumps(r) for r in rows).encode()
    # author [deleted] row is pre-filtered at the line level
    path = tmp_path / "sub.zst"
    path.write_bytes(zstandard.ZstdCompressor().compress(raw))

    entries = list(iter_reddit_dump(str(path)))
    ids = [e["id"] for e in entries]
    assert "1" in ids and "4" in ids
    assert "2" not in ids  # deleted author
    assert "3" not in ids  # over_18
    e4 = next(e for e in entries if e["id"] == "4")
    assert e4["timestamp"] == 103 and e4["subreddit"] == ""
