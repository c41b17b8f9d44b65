"""Audit host->device upload bytes of a real (mini) shard build.

The leak bisect (tools_repro_tunnel_leak_bisect.py) established that
the tunneled TPU plugin retains host RSS ~1:1 with uploaded bytes,
independent of host-buffer reuse; downloads and dispatches are free.
This audit instruments the two upload entry points the build uses
(jnp.asarray / jax.device_put on numpy arrays), runs a production-
geometry build at small n, and reports uploaded bytes grouped by
(shape, dtype) next to the process RSS growth — so (a) the leak rate
is explained by a measured byte count rather than inferred, and (b)
the biggest upload sites are named for reduction work.

Run inside a tpu_lease window:  python tools_audit_build_uploads.py [n]
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return -1


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    import jax

    if "--cpu" in sys.argv:
        # the upload-byte map is backend-independent; CPU runs it
        # without stealing chip time (the RSS-slope correlation is the
        # only part that needs the real plugin)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from meme_search_engine_tpu.index import vamana

    up_bytes = Counter()
    up_calls = Counter()

    def record(x):
        if isinstance(x, np.ndarray):
            key = (x.dtype.str, x.shape)
            up_bytes[key] += x.nbytes
            up_calls[key] += 1

    orig_asarray = jnp.asarray
    orig_device_put = jax.device_put

    def asarray(x, *a, **k):
        record(x)
        return orig_asarray(x, *a, **k)

    def device_put(x, *a, **k):
        jax.tree_util.tree_map(record, x)
        return orig_device_put(x, *a, **k)

    jnp.asarray = asarray
    jax.device_put = device_put
    vamana.jnp.asarray = asarray  # same module object, but be explicit

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, 1152)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    cfg = vamana.VamanaConfig(
        r=32, l=96, maxc=375, batch_size=1024, build_expand=4
    )
    rss0 = rss_kb()
    if "--shard" in sys.argv:
        # the full production per-shard path (build_shard semantics:
        # corpus upload shared across passes + stitch + medioid) at the
        # 1e7 run's geometry: 2 passes? no — scale_bench runs 1 pass +
        # stitch; OOD query vectors appended to exercise stitch
        queries = rng.standard_normal((256, 1152)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        allv = np.concatenate([vecs, queries])
        scfg = vamana.VamanaConfig(
            r=32, l=96, maxc=375, batch_size=1024, build_expand=4,
            query_breakpoint=n,
        )
        corpus_dev = vamana._corpus_on_device(allv, scfg.corpus_dtype)
        graph = vamana.build_graph(allv, scfg, corpus_dev=corpus_dev)
        graph = vamana.robust_stitch(
            allv, graph, scfg, corpus_dev=corpus_dev
        )
        vamana.medioid_dev(corpus_dev, n)
        graph = graph[:n]
    else:
        graph = vamana.build_graph(vecs, cfg)
    rss1 = rss_kb()

    total_up = sum(up_bytes.values())
    print(f"n={n} rss {rss0} -> {rss1} KB (delta {rss1 - rss0} KB)")
    print(f"uploads: {sum(up_calls.values())} calls, "
          f"{total_up / 1024:.0f} KB total, "
          f"{total_up / 1024 / n:.2f} KB/record")
    print(f"rss delta per record: {(rss1 - rss0) / n:.2f} KB/record")
    print("top upload sites by bytes:")
    for key, b in up_bytes.most_common(12):
        print(f"  {key[0]:>4s} {str(key[1]):>18s}: {b / 1024:9.0f} KB "
              f"in {up_calls[key]} calls")
    # degree sanity so the audited build is a real one
    deg = (np.asarray(graph) >= 0).sum(1)
    print(f"degrees: mean {deg.mean():.1f} max {deg.max()}")


if __name__ == "__main__":
    main()
