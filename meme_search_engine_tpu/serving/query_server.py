"""Small-scale search backend: JSON/HTTP query API over the flat index.

Reference counterpart: src/main.rs:898-1095 (axum service over FAISS).
Endpoints:
  GET  /         FrontendInit {n_total, predefined_embedding_names, d_emb}
  POST /         QueryRequest -> QueryResult (wire.py; common.rs:176-209)
  POST /reload   trigger reingest + index rebuild (main.rs:1058-1079)
  GET  /metrics  Prometheus text

Query execution (main.rs:936-965):
  1. fuse terms into one embedding (weighted text/image/raw/predefined,
     negative weights allowed) — embedding batches go to the embedding
     engine, raw vectors sum host-side;
  2. top-k MIPS scan on the TPU (k default 1000, main.rs:952);
  3. collapse video frames to one hit per container (main.rs:906-917);
  4. emit (score, filename, thumb-hash-key, format bitmask, dims).
"""

from __future__ import annotations

import asyncio
import base64
import json
import sys
from typing import Dict, List, Optional

import numpy as np

from ..index.flat import FlatIndex, IndexHandle
from ..ingest.filename import Actual, VideoFrame, container_of, decode_filename
from .wire import (
    FrontendInit,
    QueryRequest,
    QueryResult,
    frontend_init_to_json,
    parse_query_request,
    query_result_to_json,
)

try:
    from prometheus_client import REGISTRY, Counter, Histogram, generate_latest

    _QUERIES = Counter("mse_queries", "queries executed")
    _TERMS = Counter("mse_terms", "terms used in queries, by type", ["type"])
    _QTIME = Histogram("mse_query_time", "query execution time")
    _HAVE_PROM = True
except Exception:  # pragma: no cover
    _HAVE_PROM = False

DEFAULT_K = 1000  # reference default search k (main.rs:952)


async def fuse_query_terms(
    req: QueryRequest,
    embedder,
    d_emb: int,
    predefined: Dict[str, np.ndarray],
) -> np.ndarray:
    """Async weighted fusion (common.rs:215-274 semantics)."""
    total = np.zeros((d_emb,), dtype=np.float32)
    image_batch, image_w, text_batch, text_w = [], [], [], []

    for term in req.terms:
        w = 1.0 if term.weight is None else float(term.weight)
        if term.image is not None:
            if _HAVE_PROM:
                _TERMS.labels("image").inc()
            image_batch.append(base64.b64decode(term.image))
            image_w.append(w)
        if term.text is not None:
            if _HAVE_PROM:
                _TERMS.labels("text").inc()
            text_batch.append(term.text)
            text_w.append(w)
        if term.embedding is not None:
            if _HAVE_PROM:
                _TERMS.labels("embedding").inc()
            total += np.asarray(term.embedding, dtype=np.float32) * w
        if term.predefined_embedding is not None:
            emb = predefined.get(term.predefined_embedding)
            if emb is not None:
                total += np.asarray(emb, dtype=np.float32) * w

    if image_batch:
        embs = await embedder.embed_image_bytes(image_batch)
        total += np.einsum("nd,n->d", embs, np.asarray(image_w, np.float32))
    if text_batch:
        embs = await embedder.embed_texts(text_batch)
        total += np.einsum("nd,n->d", embs, np.asarray(text_w, np.float32))
    return total


def execute_query(
    index: FlatIndex, query: np.ndarray, req: QueryRequest
) -> QueryResult:
    """Search + video-frame dedup + result formatting."""
    k = req.k or DEFAULT_K
    scores, idx = index.search(query[None, :], min(k, len(index)))
    scores, idx = scores[0], idx[0]

    matches: List[tuple] = []
    seen_containers: Dict[str, int] = {}
    for s, i in zip(scores.tolist(), idx.tolist()):
        fname = index.filenames[i]
        if isinstance(fname, (bytes, bytearray)):
            fname = decode_filename(bytes(fname))
        elif isinstance(fname, str):
            fname = Actual(fname)
        is_video = isinstance(fname, VideoFrame)
        if is_video and not req.include_video:
            continue
        container = container_of(fname)
        if container in seen_containers:
            continue  # one hit per video container (main.rs:906-917)
        seen_containers[container] = len(matches)

        code = (
            int(index.format_codes[i]) if index.format_codes is not None else 0
        )
        meta = index.metadata[i] if index.metadata is not None else None
        dims = tuple(meta[:2]) if meta else None
        from ..ingest.thumbnailer import thumbnail_hash_key

        display = container if is_video else fname.path
        matches.append((float(s), display, thumbnail_hash_key(display), code, dims))
        if len(matches) >= k:
            break

    return QueryResult(matches=matches)


def make_app(
    handle: IndexHandle,
    embedder,
    *,
    predefined: Optional[Dict[str, np.ndarray]] = None,
    reload_fn=None,
    formats: Optional[List[str]] = None,
    extensions: Optional[Dict[str, str]] = None,
):
    from aiohttp import web

    predefined = predefined or {}
    formats = formats or []
    extensions = extensions or {}
    reload_lock = asyncio.Lock()

    def _cors(resp):
        resp.headers["Access-Control-Allow-Origin"] = "*"
        resp.headers["Access-Control-Allow-Headers"] = "*"
        return resp

    async def frontend_init(_request):
        index = handle.index
        init = FrontendInit(
            n_total=len(index) if index else 0,
            predefined_embedding_names=sorted(predefined.keys()),
            d_emb=embedder.config.embedding_size,
        )
        return _cors(web.json_response(frontend_init_to_json(init)))

    async def query(request):
        if _HAVE_PROM:
            _QUERIES.inc()
        req = parse_query_request(await request.json())
        index = handle.index
        if index is None or len(index) == 0:
            return _cors(
                web.json_response(
                    query_result_to_json(
                        QueryResult(matches=[], formats=formats, extensions=extensions)
                    )
                )
            )
        qvec = await fuse_query_terms(
            req, embedder, embedder.config.embedding_size, predefined
        )
        result = await asyncio.get_event_loop().run_in_executor(
            None, execute_query, index, qvec, req
        )
        result.formats = formats
        result.extensions = extensions
        return _cors(web.json_response(query_result_to_json(result)))

    async def reload(_request):
        if reload_fn is None:
            return _cors(web.json_response({"status": "no ingest configured"}))
        async with reload_lock:  # one reingest at a time (main.rs:1058-1079)
            status = await reload_fn()
        return _cors(web.json_response({"status": status or "done"}))

    async def metrics(_request):
        if _HAVE_PROM:
            return web.Response(body=generate_latest(REGISTRY))
        return web.Response(status=501)

    async def telemetry(_request):
        # frontend beacons; the small backend just acknowledges them
        return _cors(web.Response(status=204))

    async def options(_request):
        return _cors(web.Response(status=204))

    app = web.Application(client_max_size=2**26)
    app.router.add_get("/", frontend_init)
    app.router.add_post("/", query)
    app.router.add_post("/reload", reload)
    app.router.add_post("/telemetry", telemetry)
    app.router.add_get("/metrics", metrics)
    app.router.add_route("OPTIONS", "/", options)
    return app


def main(argv=None):
    """Combined small-scale service: ingest + index + query API.

    Config (JSON file as argv[1], reference mse_config.json style):
      {"port", "files": dir, "db_path", "clip_server": url | null,
       "enable_thumbs", "enable_ocr", "no_run_server": bool}
    With "clip_server": null an in-process engine is created.
    """
    from aiohttp import web

    argv = argv if argv is not None else sys.argv[1:]
    with open(argv[0]) as f:
        config = json.load(f)

    async def start():
        from ..ingest.pipeline import IngestService

        service = await IngestService.create(config)
        await service.reload()
        if config.get("no_run_server"):
            return None
        app = make_app(
            service.handle,
            service.embedder,
            predefined=service.predefined_embeddings,
            reload_fn=service.reload,
            formats=service.formats,
            extensions=service.extensions,
        )
        if config.get("serve_frontend", True):
            from .frontend import attach_frontend

            attach_frontend(
                app,
                memes_dir=config.get("files"),
                thumbs_dir=config.get("thumbs_path"),
                friendly_terms=config.get("friendly_mode_default_terms"),
            )
        return app

    loop = asyncio.new_event_loop()
    app = loop.run_until_complete(start())
    if app is not None:
        web.run_app(app, port=int(config.get("port", 1707)), loop=loop)


if __name__ == "__main__":
    main()
