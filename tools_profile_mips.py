"""Decompose mips_topk cost: HBM stream vs matmul dtype vs top-k selection.

Motivation: ops/mips.py claims the XLA tiled scan "runs at
HBM-bandwidth roofline"; BENCHMARKS.md records 2.1 ms for B=64/k=20 at
1e5 (230 MB corpus => ~110 GB/s effective, well under the ~800 GB/s
HBM peak). This profile separates the scan's three costs so the claim
can be replaced with a measured breakdown:

  1. stream+matmul only (fp32 upcast, per-tile max — no sort)
  2. stream+matmul only (bf16 corpus x bf16 queries — MXU native)
  3. full mips_topk (adds per-tile lax.top_k + running merge)

Run on the real TPU (idle chip): python tools_profile_mips.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from meme_search_engine_tpu.ops.mips import mips_topk

D = 1152
rng = np.random.default_rng(0)


def sync(x):
    return float(jax.tree.leaves(x)[0].ravel()[0])


def timeit(fn, *args, n=10):
    sync(fn(*args))
    t0 = time.perf_counter(); sync(fn(*args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    sync(out)
    tn = time.perf_counter() - t0
    return (tn - t1) / (n - 1) * 1000


@functools.partial(jax.jit, static_argnames=("tile", "in_dtype"))
def scan_max_only(corpus, queries, tile: int = 16384, in_dtype: str = "f32"):
    """The scan WITHOUT selection: per-tile scores -> running row max.
    Upper-bounds achievable scan speed for any exact top-k built on it."""
    n, d = corpus.shape
    pad = (-n) % tile
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    tiles = corpus.reshape(-1, tile, d)
    if in_dtype == "bf16":
        q = queries.astype(jnp.bfloat16)
        cast = jnp.bfloat16
    else:
        q = queries.astype(jnp.float32)
        cast = jnp.float32

    def step(best, tile_vecs):
        s = jnp.einsum(
            "td,bd->bt", tile_vecs.astype(cast), q,
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(best, s.max(axis=1)), None

    init = jnp.full((queries.shape[0],), -jnp.inf, jnp.float32)
    best, _ = jax.lax.scan(step, init, tiles)
    return best


for n in (100_000, 1_000_000):
    corpus = jnp.asarray(
        rng.standard_normal((n, D)).astype(np.float16)
    )
    qs = jnp.asarray(rng.standard_normal((64, D)).astype(np.float32))
    gb = n * D * 2 / 1e9
    t_f32 = timeit(lambda c, q: scan_max_only(c, q, in_dtype="f32"), corpus, qs)
    t_bf16 = timeit(lambda c, q: scan_max_only(c, q, in_dtype="bf16"), corpus, qs)
    t_k20 = timeit(lambda c, q: mips_topk(c, q, 20), corpus, qs)
    t_k1000 = timeit(lambda c, q: mips_topk(c, q, 1000), corpus, qs)
    print(
        f"N={n}: stream+matmul f32 {t_f32:.2f} ms ({gb / t_f32 * 1e3:.0f} GB/s) | "
        f"bf16 {t_bf16:.2f} ms ({gb / t_bf16 * 1e3:.0f} GB/s) | "
        f"topk k=20 {t_k20:.2f} ms | k=1000 {t_k1000:.2f} ms",
        flush=True,
    )
