"""Per-stage cost profile of the small-backend wire path (VERDICT r4 #4).

The serving load test (BENCHMARKS.md: 67 QPS/core, p50 288 ms at
concurrency 20) measures the full wire path; this script decomposes one
query into its stages, timed in isolation on this host, so the
optimisation target is measured rather than guessed:

  1. client-side body serialisation (perf_test.py does emb.tolist() +
     aiohttp json=)
  2. server json.loads of the ~25 KB body
  3. parse_query_request (wire.py)
  4. fuse_query_terms (numpy)
  5. index.search B=1 k=20 (device dispatch over the tunnel)
  6. execute_query marshal loop (filename decode, dedup, hash keys)
  7. query_result_to_json + json.dumps of the response
  8. end-to-end through a live aiohttp server, concurrency 1 and 20
     (the residual over 1-7 is aiohttp + asyncio + loopback cost)

Run: python tools_profile_wire.py [--n 1e5]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time

import numpy as np


def timeit(fn, n=50, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=1152)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--load-n", type=int, default=400)
    args = ap.parse_args()

    from meme_search_engine_tpu.index.flat import FlatIndex, IndexHandle
    from meme_search_engine_tpu.ingest.filename import Actual
    from meme_search_engine_tpu.serving.query_server import (
        execute_query,
        fuse_query_terms,
        make_app,
    )
    from meme_search_engine_tpu.serving.wire import (
        parse_query_request,
        query_result_to_json,
    )

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((args.n, args.d)).astype(np.float16)
    vecs /= np.linalg.norm(vecs.astype(np.float32), axis=1, keepdims=True)
    index = FlatIndex.build(
        vecs, [Actual(f"img{i}.png") for i in range(args.n)]
    )

    emb = rng.standard_normal(args.d).astype(np.float32)
    emb /= np.linalg.norm(emb)
    body_obj = {"terms": [{"embedding": emb.tolist()}], "k": args.k}
    body = json.dumps(body_obj)
    print(f"body bytes: {len(body)}")

    report = {}
    report["client_serialise_ms"] = timeit(
        lambda: json.dumps({"terms": [{"embedding": emb.tolist()}], "k": args.k})
    )
    report["server_json_loads_ms"] = timeit(lambda: json.loads(body))
    parsed = json.loads(body)
    report["parse_query_request_ms"] = timeit(lambda: parse_query_request(parsed))
    req = parse_query_request(parsed)

    class _Emb:
        class config:
            embedding_size = args.d

    loop = asyncio.new_event_loop()
    report["fuse_terms_ms"] = timeit(
        lambda: loop.run_until_complete(
            fuse_query_terms(req, _Emb(), args.d, {})
        )
    )
    qvec = loop.run_until_complete(fuse_query_terms(req, _Emb(), args.d, {}))

    report["index_search_b1_ms"] = timeit(
        lambda: index.search(qvec[None, :], args.k), n=100
    )
    report["execute_query_ms"] = timeit(
        lambda: execute_query(index, qvec, req), n=100
    )
    res = execute_query(index, qvec, req)
    res.formats, res.extensions = ["jpegl"], {"jpegl": "jpg"}
    report["result_to_json_ms"] = timeit(
        lambda: json.dumps(query_result_to_json(res))
    )

    # ---- end-to-end through a live server on a loopback port ----
    from aiohttp import web
    from aiohttp.test_utils import TestClient, TestServer

    app = make_app(
        IndexHandle(index), _Emb(), formats=["jpegl"], extensions={"jpegl": "jpg"}
    )

    async def load(concurrency, n):
        server = TestServer(app)
        client = TestClient(server)
        await client.start_server()
        sem = asyncio.Semaphore(concurrency)
        lats = []

        async def one():
            e = rng.standard_normal(args.d).astype(np.float32)
            b = {"terms": [{"embedding": e.tolist()}], "k": args.k}
            async with sem:
                t0 = time.perf_counter()
                resp = await client.post("/", json=b)
                await resp.read()
                lats.append(time.perf_counter() - t0)

        # warmup
        await asyncio.gather(*[one() for _ in range(8)])
        lats.clear()
        t0 = time.perf_counter()
        await asyncio.gather(*[one() for _ in range(n)])
        wall = time.perf_counter() - t0
        await client.close()
        return {
            "qps": round(n / wall, 1),
            "p50_ms": round(float(np.percentile(np.asarray(lats) * 1e3, 50)), 1),
            "p95_ms": round(float(np.percentile(np.asarray(lats) * 1e3, 95)), 1),
        }

    report["e2e_c1"] = loop.run_until_complete(load(1, args.load_n // 2))
    report["e2e_c20"] = loop.run_until_complete(load(20, args.load_n))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
