"""Reddit-dump scraper (reference: src/reddit_dump.rs).

Reads zstd NDJSON Reddit submission dumps, filters/rewrites media URLs
(imgur/youtube thumbnail extraction included), fetches images with high
concurrency, embeds them through the embedding service in batches, and
writes ProcessedEntry dump files — resuming from the newest timestamp in
the highest-sequence-numbered existing output (reddit_dump.rs:269-355).

Concurrency model parity (reddit_dump.rs:379-489): bounded fetch
fan-out (512 in the reference), CPU-count decoders, 3 embedding batches
in flight — here as asyncio semaphores + executor pools. Network access
is required for fetching; the URL filtering/rewriting layer and the
NDJSON reader are pure and unit-testable offline.
"""

from __future__ import annotations

import asyncio
import io
import json
import os
import re
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Set, Tuple

import numpy as np

from .dump import DumpWriter, OriginalImageMetadata, ProcessedEntry, latest_timestamp

try:
    from prometheus_client import Counter

    _FETCHED = Counter("mse_scrape_images_fetched", "images fetched")
    _PROCESSED = Counter("mse_scrape_images_processed", "images processed")
    _ENTRIES = Counter("mse_scrape_entries_processed", "entries processed")
    _FAILED = Counter("mse_scrape_images_failed", "images failed")
    _DISCARDED = Counter("mse_scrape_discarded", "images discarded by hash")
    _HAVE_PROM = True
except Exception:  # pragma: no cover
    _HAVE_PROM = False


# URL triage (reddit_dump.rs:58-124 behaviour: drop obvious non-images,
# require an image-ish signal, rewrite indirect hosts to direct files)
_IGNORE = re.compile(
    r"(//(www\.)?reddit\.com/[^g])|(\.html?)|(\.php)|(\?articleid=)"
    r"|(\.aspx?)|(\.xml)|(/rss/)|(//vimeo\.com)|(//v\.redd\.it)"
    r"|(\.gifv$)|(youtube\.com/user/)"
)
_MUST_CONTAIN = re.compile(
    r"jpe?g|png|webp|\.gif|=gif|bmp|tiff|avif|imgur|image|//i\.|img"
    r"|cdn\.|media\.|/i/|/media|youtu\.be|youtube\.com|reddit\.com/gallery/",
    re.IGNORECASE,
)
_REWRITES: List[Tuple[re.Pattern, str]] = [
    (re.compile(r"imgur\.com/([A-Za-z0-9]+),"), r"imgur.com/\1"),
    (re.compile(r"//(?:www\.|m\.)?imgur\.com/([A-Za-z0-9]+)$"), r"//i.imgur.com/\1.jpg"),
    (re.compile(r"^http://"), "https://"),
    (re.compile(r"//youtu\.be/(.*)"), r"//youtube.com/watch?v=\1"),
    (re.compile(r"//[a-z]+\.youtube\.com/(.*)"), r"//youtube.com/\1"),
    (
        re.compile(r"//youtube\.com/embed/([A-Za-z0-9_-]+)"),
        r"//i.ytimg.com/vi/\1/maxresdefault.jpg",
    ),
    (
        re.compile(r"//youtube\.com/(?:.*)v=([A-Za-z0-9_-]+)(?:.*)"),
        r"//i.ytimg.com/vi/\1/maxresdefault.jpg",
    ),
    (re.compile(r"&amp;"), "&"),
]
# hosts whose pages need HTML meta extraction to find the real image
_HTML_EXTRACT = [
    (
        re.compile(r"//imgur\.com/(a|gallery)/[A-Za-z0-9]+"),
        re.compile(r'<meta name="twitter:image"[^>]*content="([^"]+)"'),
    ),
]
ACCEPTABLE_MIME: Set[str] = {
    "image/png",
    "image/webp",
    "image/avif",
    "image/jpeg",
    "image/gif",
    "image/apng",
    "image/bmp",
    "image/tiff",
}


def triage_url(url: str) -> Optional[str]:
    """Filter + rewrite a submission URL; None = skip."""
    if _IGNORE.search(url):
        return None
    if not _MUST_CONTAIN.search(url):
        return None
    for pattern, repl in _REWRITES:
        url = pattern.sub(repl, url)
    return url


def needs_html_extraction(url: str):
    for pattern, meta_re in _HTML_EXTRACT:
        if pattern.search(url):
            return meta_re
    return None


def iter_reddit_dump(path: str) -> Iterator[dict]:
    """zstd NDJSON submissions -> parsed entries worth fetching
    (reddit_dump.rs:137-181 process_file)."""
    import zstandard

    with open(path, "rb") as f:
        reader = zstandard.ZstdDecompressor(max_window_size=2**31).stream_reader(f)
        text = io.TextIOWrapper(reader, encoding="utf-8", errors="replace")
        for line in text:
            line = line.strip()
            if not line or "\x00" in line:
                continue
            # cheap pre-filters before JSON parse (OBJECT_HACKY_IGNORE)
            if '"author":"[deleted]"' in line or '"promoted":true' in line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if obj.get("over_18"):
                continue
            if obj.get("author") == "[deleted]" or obj.get("promoted"):
                continue
            url = obj.get("url")
            if not url:
                continue
            ts = obj.get("created_utc", 0)
            try:
                ts = int(float(ts))
            except (TypeError, ValueError):
                continue
            yield {
                "url": url,
                "title": obj.get("title", ""),
                "author": obj.get("author") or "",
                "subreddit": obj.get("subreddit") or "",
                "id": obj.get("id", ""),
                "timestamp": ts,
            }


@dataclass
class ScraperConfig:
    """reddit_dump.rs:324-334 hardcodes this struct in source; we take
    JSON."""

    input_files: List[str] = field(default_factory=list)
    output_dir: str = "dumps"
    clip_server: str = "http://localhost:1708"
    max_fetch_concurrency: int = 512
    embed_batches_in_flight: int = 3
    max_file_size: int = 16 * 1024 * 1024
    discard_hashes: Set[int] = field(default_factory=set)
    seq_start: int = 1
    timeout_s: float = 30.0


async def fetch_image(
    session, url: str, cfg: ScraperConfig
) -> Optional[Tuple[bytes, str, str]]:
    """-> (bytes, mime, final_url); follows one HTML-extraction hop for
    gallery hosts (reddit_dump.rs:197-250 fetch_file)."""
    meta_re = needs_html_extraction(url)
    try:
        if meta_re is not None:
            async with session.get(url, timeout=cfg.timeout_s) as resp:
                html = await resp.text()
            m = meta_re.search(html)
            if not m:
                return None
            url = m.group(1)
        async with session.get(url, timeout=cfg.timeout_s) as resp:
            if resp.status != 200:
                return None
            mime = resp.headers.get("Content-Type", "").split(";")[0]
            if mime and mime not in ACCEPTABLE_MIME:
                return None
            data = await resp.content.read(cfg.max_file_size + 1)
            if len(data) > cfg.max_file_size:
                return None
            return data, mime, str(resp.url)
    except Exception:  # noqa: BLE001 — fetch failures are counted, not fatal
        return None


async def scrape(cfg: ScraperConfig, embedder=None) -> int:
    """Run the scrape; returns the number of entries written.

    ``embedder`` defaults to a RemoteEmbedder on cfg.clip_server.
    """
    import aiohttp

    from ..serving.client import RemoteEmbedder
    from ..tools.content_hash import content_hash

    os.makedirs(cfg.output_dir, exist_ok=True)
    resume_ts = latest_timestamp(cfg.output_dir) or 0
    if resume_ts:
        print(f"resuming after timestamp {resume_ts}")

    if embedder is None:
        embedder = RemoteEmbedder(cfg.clip_server)
        await embedder.connect()

    out_path = os.path.join(
        cfg.output_dir, f"{cfg.seq_start:09d}.dump.zst"
    )
    writer = DumpWriter(out_path)
    written = 0
    fetch_sem = asyncio.Semaphore(cfg.max_fetch_concurrency)
    embed_sem = asyncio.Semaphore(cfg.embed_batches_in_flight)
    batch: List[Tuple[dict, bytes, str, str]] = []
    batch_lock = asyncio.Lock()
    write_lock = asyncio.Lock()

    async def flush(items):
        nonlocal written
        async with embed_sem:
            try:
                embs = await embedder.embed_image_bytes(
                    [b for _e, b, _m, _u in items]
                )
            except Exception as e:  # noqa: BLE001
                print(f"embed batch failed: {e}")
                return
            async with write_lock:
                for (entry, data, mime, final_url), emb in zip(items, embs):
                    writer.write(
                        ProcessedEntry(
                            url=entry["url"],
                            id=entry["id"],
                            title=entry["title"],
                            subreddit=entry["subreddit"],
                            author=entry["author"],
                            timestamp=entry["timestamp"],
                            embedding=np.asarray(emb, np.float32),
                            metadata=OriginalImageMetadata(
                                mime_type=mime,
                                original_file_size=len(data),
                                dimension=(0, 0),
                                final_url=final_url,
                            ),
                        )
                    )
                    written += 1
                    if _HAVE_PROM:
                        _PROCESSED.inc()

    async with aiohttp.ClientSession(
        headers={"User-Agent": "meme-search-tpu-scraper/0.1"}
    ) as session:

        async def handle(entry):
            nonlocal batch
            if _HAVE_PROM:
                _ENTRIES.inc()
            if entry["timestamp"] <= resume_ts:
                return
            url = triage_url(entry["url"])
            if url is None:
                return
            entry = dict(entry, url=url)
            async with fetch_sem:
                fetched = await fetch_image(session, url, cfg)
            if fetched is None:
                if _HAVE_PROM:
                    _FAILED.inc()
                return
            data, mime, final_url = fetched
            if _HAVE_PROM:
                _FETCHED.inc()
            if content_hash(data) in cfg.discard_hashes:
                if _HAVE_PROM:
                    _DISCARDED.inc()
                return
            async with batch_lock:
                batch.append((entry, data, mime, final_url))
                if len(batch) >= embedder.config.batch:
                    items, batch = batch, []
                    asyncio.ensure_future(flush(items))

        tasks = []
        for path in cfg.input_files:
            for entry in iter_reddit_dump(path):
                tasks.append(asyncio.ensure_future(handle(entry)))
                if len(tasks) >= cfg.max_fetch_concurrency * 2:
                    await asyncio.gather(*tasks)
                    tasks = []
        if tasks:
            await asyncio.gather(*tasks)
        if batch:
            await flush(batch)

    writer.close()
    print(f"wrote {written} entries to {out_path}")
    return written


def main(argv=None):
    import sys

    argv = argv if argv is not None else sys.argv[1:]
    with open(argv[0]) as f:
        raw = json.load(f)
    cfg = ScraperConfig(
        input_files=raw["input_files"],
        output_dir=raw.get("output_dir", "dumps"),
        clip_server=raw.get("clip_server", "http://localhost:1708"),
        max_fetch_concurrency=raw.get("max_fetch_concurrency", 512),
        discard_hashes=set(raw.get("discard_hashes", [])),
        seq_start=raw.get("seq_start", 1),
    )
    asyncio.run(scrape(cfg))


if __name__ == "__main__":
    main()
