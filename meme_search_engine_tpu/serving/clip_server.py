"""Embedding service: HTTP + msgpack, wire-compatible with the reference.

API (reference: clip_server.py:151-191):
  POST /        msgpack {"images": [bytes...]} | {"text": [str...]}
                -> 200 msgpack [fp16-LE bytes, ...] | 500 msgpack "err"
  GET  /config  msgpack {model, batch, image_size, embedding_size}
  GET  /        204 (health)
  GET  /metrics Prometheus text

Pipeline: asyncio handlers -> host decode pool (CPU) -> single inference
worker thread owning the TPU stream -> response. The reference runs one
preprocessing thread and one inference thread over bounded queues
(clip_server.py:125-146); here decode is a sized thread pool (it is the
CPU hot loop, SURVEY SS3.1) while inference stays single-threaded for
deterministic device occupancy.

Run: ``python -m meme_search_engine_tpu.serving.clip_server config.json``
Config keys: port, device, max_batch_size, model_name, checkpoint
(optional HF safetensors), tokenizer (optional tokenizer.json).
"""

from __future__ import annotations

import asyncio
import json
import queue
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import msgpack
import numpy as np

from ..utils.fp16 import encode_fp16_buffer
from .preprocess import decode_and_resize

try:
    from prometheus_client import (
        REGISTRY,
        Counter,
        Histogram,
        generate_latest,
    )

    _ITEMS = Counter(
        "modelserver_total_items",
        "Items run through model server",
        ["model", "modality"],
    )
    _BATCHES = Counter(
        "modelserver_batchcount", "Inference batches run", ["model"]
    )
    _INFTIME = Histogram(
        "modelserver_inftime",
        "Time running inference",
        ["model", "batch_size"],
    )
    _HAVE_PROM = True
except Exception:  # pragma: no cover
    _HAVE_PROM = False


class InferenceWorker:
    """Single thread owning device inference, fed by a bounded queue."""

    def __init__(self, engine, model_name: str = "siglip", qsize: int = 10):
        self.engine = engine
        self.model_name = model_name
        self._q: "queue.Queue" = queue.Queue(qsize)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            kind, payload, callback = item
            try:
                t0 = time.perf_counter()
                if kind == "image":
                    out = self.engine.embed_image_arrays(payload)
                else:
                    out = self.engine.embed_texts(payload)
                if _HAVE_PROM:
                    _ITEMS.labels(self.model_name, kind).inc(len(payload))
                    _BATCHES.labels(self.model_name).inc()
                    _INFTIME.labels(self.model_name, len(payload)).observe(
                        time.perf_counter() - t0
                    )
                callback(True, out)
            except Exception as e:  # noqa: BLE001 — report to client
                callback(False, str(e))

    def submit(self, kind, payload, callback):
        self._q.put((kind, payload, callback))

    def stop(self):
        self._q.put(None)


def make_app(engine, config: dict):
    """Build the aiohttp application around an EmbeddingEngine."""
    from aiohttp import web

    max_batch = int(config.get("max_batch_size", 128))
    model_name = config.get("model_name", "siglip-so400m/14@384")
    image_size = (engine.cfg.image_size, engine.cfg.image_size)
    decode_pool = ThreadPoolExecutor(
        max_workers=int(config.get("decode_threads", 8))
    )
    worker = InferenceWorker(engine, model_name)

    async def run_inference(request):
        loop = asyncio.get_event_loop()
        body = msgpack.unpackb(await request.read(), raw=False)
        texts: Optional[List[str]] = body.get("text")
        images: Optional[List[bytes]] = body.get("images")

        try:
            if images:
                if len(images) > max_batch:
                    raise ValueError(f"max batch size is {max_batch}")
                arrays = await asyncio.gather(
                    *[
                        loop.run_in_executor(
                            decode_pool, decode_and_resize, img, image_size
                        )
                        for img in images
                    ]
                )
                payload, kind = np.stack(arrays), "image"
            elif texts:
                if len(texts) > max_batch:
                    raise ValueError(f"max batch size is {max_batch}")
                payload, kind = list(texts), "text"
            else:
                raise ValueError("images or text required")
        except Exception as e:  # noqa: BLE001
            return web.Response(
                body=msgpack.packb(str(e)),
                status=500,
                content_type="application/msgpack",
            )

        event = asyncio.Event()
        result = {}

        def callback(ok, value):
            result["ok"], result["value"] = ok, value
            loop.call_soon_threadsafe(event.set)

        worker.submit(kind, payload, callback)
        await event.wait()

        if result["ok"]:
            body_data = [encode_fp16_buffer(v) for v in result["value"]]
            return web.Response(
                body=msgpack.packb(body_data),
                status=200,
                content_type="application/msgpack",
            )
        return web.Response(
            body=msgpack.packb(result["value"]),
            status=500,
            content_type="application/msgpack",
        )

    async def config_handler(_request):
        return web.Response(
            body=msgpack.packb(
                {
                    "model": model_name,
                    "batch": max_batch,
                    "image_size": list(image_size),
                    "embedding_size": engine.cfg.d_emb,
                }
            ),
            status=200,
            content_type="application/msgpack",
        )

    async def health(_request):
        return web.Response(status=204)

    async def metrics(_request):
        if _HAVE_PROM:
            return web.Response(body=generate_latest(REGISTRY))
        return web.Response(status=501)

    app = web.Application(client_max_size=2**26)
    app.router.add_post("/", run_inference)
    app.router.add_get("/config", config_handler)
    app.router.add_get("/", health)
    app.router.add_get("/metrics", metrics)
    app["worker"] = worker
    return app


def main(argv=None):
    import jax

    from ..models import siglip
    from .engine import EmbeddingEngine

    argv = argv if argv is not None else sys.argv[1:]
    with open(argv[0]) as f:
        config = json.load(f)

    # "platform": "cpu" pins the JAX backend (the TPU plugin overrides
    # the JAX_PLATFORMS env var on hosts where it is installed, so a
    # config knob is the only way to run this binary CPU-side there)
    if config.get("platform"):
        jax.config.update("jax_platforms", config["platform"])

    # model selection rides model_name, as in the reference's config
    # (clip_server_config.json "model"); "tiny" serves the random-init
    # test geometry for dev/CI hosts without a checkpoint or the HBM
    # for SO400M
    if config.get("model_name", "").startswith("tiny"):
        cfg = siglip.tiny_test_config()
    else:
        cfg = siglip.SO400M_14_384
    ckpt = config.get("checkpoint")
    if ckpt:
        params = siglip.load_hf_siglip(ckpt, cfg)
    else:
        print(
            "WARNING: no checkpoint configured; serving random-init weights",
            file=sys.stderr,
        )
        params = siglip.init_params(jax.random.PRNGKey(0), cfg)

    engine = EmbeddingEngine(
        params,
        cfg,
        max_batch=int(config.get("max_batch_size", 128)),
        tokenizer_path=config.get("tokenizer"),
    )
    if config.get("warmup", True):
        engine.warmup()

    from aiohttp import web

    app = make_app(engine, config)
    print("Ready")
    web.run_app(app, port=int(config.get("port", 1708)))


if __name__ == "__main__":
    main()
