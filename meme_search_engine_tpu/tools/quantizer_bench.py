"""Quantizer quality benchmark (reference: faiss_bench_quantizer.py +
diskann/opq_test.py).

Compares our codecs (OPQ, RaBitQ, scalar u8) on reconstruction error,
encode throughput and approx-vs-exact rank agreement; optionally also
benchmarks FAISS codecs if faiss is importable (it is not baked into
this environment — gated).

Usage:
  python -m meme_search_engine_tpu.tools.quantizer_bench \
      [--vectors x.bin --queries q.bin --d-emb 1152] [--n 20000]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def rank_agreement(approx: np.ndarray, exact: np.ndarray, k: int = 20) -> float:
    """Fraction of true top-k recovered by approx top-k (opq_test.py:37-45
    flavour)."""
    ta = set(np.argsort(-approx)[:k].tolist())
    te = set(np.argsort(-exact)[:k].tolist())
    return len(ta & te) / k


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors")
    ap.add_argument("--queries")
    ap.add_argument("--d-emb", type=int, default=1152)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args(argv)

    if args.vectors:
        x = (
            np.fromfile(args.vectors, np.float16)
            .reshape(-1, args.d_emb)[: args.n]
            .astype(np.float32)
        )
        q = (
            np.fromfile(args.queries, np.float16)
            .reshape(-1, args.d_emb)[:64]
            .astype(np.float32)
        )
    else:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((args.n, args.d_emb)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        q = rng.standard_normal((64, args.d_emb)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

    exact = x @ q.T  # (N, B)
    results = {}

    # OPQ
    from ..index.opq import train_opq

    pq = train_opq(
        x[: min(len(x), 50_000)],
        q,
        outer_iters=3,
        adam_iters=60,
        verbose=False,
    )
    t0 = time.perf_counter()
    codes = pq.quantize(x)
    enc_t = time.perf_counter() - t0
    agree = np.mean(
        [
            rank_agreement(
                pq.asymmetric_dot(pq.preprocess_query(q[b]), codes),
                exact[:, b],
                args.k,
            )
            for b in range(len(q))
        ]
    )
    results["opq_64x256"] = {
        "encode_vecs_per_s": round(len(x) / enc_t, 0),
        "bytes_per_vec": pq.n_chunks,
        f"rank_agreement@{args.k}": round(float(agree), 4),
    }

    # RaBitQ
    from ..index.rabitq import train_rabitq

    rq = train_rabitq(x, output_dims=512)
    t0 = time.perf_counter()
    signs, dots, norms = rq.quantize(x)
    enc_t = time.perf_counter() - t0
    agree = np.mean(
        [
            rank_agreement(
                rq.approx_dot(signs, dots, norms, q[b]), exact[:, b], args.k
            )
            for b in range(len(q))
        ]
    )
    results["rabitq_512"] = {
        "encode_vecs_per_s": round(len(x) / enc_t, 0),
        "bytes_per_vec": 512 // 8 + 8,
        f"rank_agreement@{args.k}": round(float(agree), 4),
    }

    # scalar u8
    from ..index.scalar import train_scalar_quantizer

    sq = train_scalar_quantizer(x)
    t0 = time.perf_counter()
    codes = sq.quantize(x)
    enc_t = time.perf_counter() - t0
    recon = sq.dequantize(codes)
    agree = np.mean(
        [
            rank_agreement(recon @ q[b][sq.permutation], exact[:, b], args.k)
            for b in range(len(q))
        ]
    )
    results["scalar_u8"] = {
        "encode_vecs_per_s": round(len(x) / enc_t, 0),
        "bytes_per_vec": x.shape[1],
        f"rank_agreement@{args.k}": round(float(agree), 4),
    }

    # optional FAISS comparison (faiss_bench_quantizer.py parity)
    try:
        import faiss  # noqa

        d = x.shape[1]
        for name, factory in [("faiss_pq64", f"PQ64x8"), ("faiss_opq64", f"OPQ64,PQ64x8")]:
            idx = faiss.index_factory(d, factory, faiss.METRIC_INNER_PRODUCT)
            t0 = time.perf_counter()
            idx.train(x)
            idx.add(x)
            results[name] = {"train_add_s": round(time.perf_counter() - t0, 2)}
    except ImportError:
        results["faiss"] = "not available"

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
