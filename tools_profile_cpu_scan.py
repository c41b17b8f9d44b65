"""Measured CPU brute-scan baseline for the flat-MIPS tables (VERDICT r4 #3).

The reference's small-scale search is a FAISS SQ-fp16 inner-product
scan (src/main.rs:821-827): vectors stored fp16, decoded to fp32 on
the fly (F16C), exact top-k per query. faiss is absent in this
environment, so this measures the same semantics with the two CPU
engines that ARE here — torch-2.x (1 thread) and numpy — on the same
corpus shapes and query protocol as the BENCHMARKS.md MIPS tables
(1e5/1e6 x 1152, fp16 storage, k=1000 and k=20, B=1 per query and a
B=64 batched variant as the generous upper bound).

Run on a QUIET host (the 1-core box serves nothing else during the
measurement); prints one JSON report.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench(fn, iters=None, min_s=2.0):
    fn()  # warm
    t0 = time.perf_counter()
    n = 0
    while True:
        fn()
        n += 1
        dt = time.perf_counter() - t0
        if (iters and n >= iters) or (not iters and dt > min_s):
            return dt / n


def main():
    import torch

    torch.set_num_threads(1)
    report = {"torch_threads": torch.get_num_threads()}

    rng = np.random.default_rng(0)
    d = 1152
    for n in (100_000, 1_000_000):
        corpus16 = rng.standard_normal((n, d)).astype(np.float16)
        corpus16 /= np.linalg.norm(
            corpus16.astype(np.float32), axis=1, keepdims=True
        ).astype(np.float16)
        q = rng.standard_normal((64, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)

        t_c16 = torch.from_numpy(corpus16)  # fp16 storage, like SQ-fp16
        t_q = torch.from_numpy(q)
        t_q16 = t_q.half()

        rows = {}

        # FAISS SQ-fp16 semantics: fp16 storage, fp32 accumulate.
        # torch CPU promotes half@float via .float() decode — same
        # decode-on-scan the reference pays, so time it inside.
        def one_query_k(k):
            def run():
                s = torch.mv(t_c16.float(), t_q[0])
                torch.topk(s, k)
            return run

        # decode outside the loop = fp32-resident upper bound (2x RAM)
        t_c32 = t_c16.float()

        def one_query_f32(k):
            def run():
                s = torch.mv(t_c32, t_q[0])
                torch.topk(s, k)
            return run

        # pure-fp16 accumulate path (torch half matmul on CPU)
        def one_query_f16(k):
            def run():
                s = torch.mv(t_c16, t_q16[0])
                torch.topk(s.float(), k)
            return run

        def batched64(k):
            def run():
                s = t_q @ t_c32.T
                torch.topk(s, k, dim=1)
            return run

        for k in (20, 1000):
            if n > 100_000 and k == 20:
                pass
            t = bench(one_query_k(k), iters=3 if n > 100_000 else None)
            rows[f"torch_fp16_decode_B1_k{k}_qps"] = round(1.0 / t, 2)
            t = bench(one_query_f32(k), iters=5 if n > 100_000 else None)
            rows[f"torch_fp32_resident_B1_k{k}_qps"] = round(1.0 / t, 2)
        t = bench(one_query_f16(1000), iters=3 if n > 100_000 else None)
        rows["torch_fp16_accum_B1_k1000_qps"] = round(1.0 / t, 2)
        t = bench(batched64(1000), iters=2 if n > 100_000 else None)
        rows["torch_fp32_B64_k1000_qps"] = round(64.0 / t, 2)

        # numpy: fp32-resident single query (BLAS sgemv)
        c32np = corpus16.astype(np.float32)

        def np_one():
            s = c32np @ q[0]
            np.argpartition(s, -1000)[-1000:]

        t = bench(np_one, iters=5 if n > 100_000 else None)
        rows["numpy_fp32_B1_k1000_qps"] = round(1.0 / t, 2)

        report[f"n{n}"] = rows
        print(json.dumps({f"n{n}": rows}), flush=True)
        del corpus16, t_c16, t_c32, c32np

    print(json.dumps(report))


if __name__ == "__main__":
    main()
