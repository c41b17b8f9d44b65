"""Pipelined row-gather kernel for graph traversal on TPU.

The Vamana build is gather-bound: every hop reads (B, K) scattered
corpus rows — (B*K, D) bf16 ≈ 150-900 MB per dispatch — and XLA lowers
``vectors[idx]`` to a generic gather measured at ~34-39 GB/s effective
on this v5e (tools_profile_ops.py / BENCHMARKS.md), an order of
magnitude under HBM.

Approach: Mosaic's software pipeline itself performs the gather. The
corpus is viewed as (N, D/128, 128) so a single logical row is a legal
block shape, and the kernel takes G=128 in_specs over the SAME corpus
array, each with a scalar-prefetched ``index_map`` that points at one
gathered row for the current grid step (idx is the scalar-prefetch
operand). The pipeline double-buffers all G row copies across grid
steps — the DMA overlap falls out of the standard pallas pipeline
instead of hand-rolled semaphore code, and per-row copies are exactly
the hardware's native scattered-read path.

Manual per-row ``make_async_copy`` was tried first and rejected:
Mosaic requires HBM slices to align to the (8, 128) tile, so a
(1, D) row slice of a 2D corpus cannot be DMA'd directly.

Consumers (greedy-search hop scoring lib.rs:183-211, robust-prune pair
matrix lib.rs:227-285) run as plain XLA einsums over the densely
gathered block — those are MXU/bandwidth-friendly once the gather is
fast.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["gather_rows", "use_pallas_gather"]


def use_pallas_gather() -> bool:
    """Opt-in (MSE_PALLAS_GATHER=1): measured on v5e, this kernel LOSES
    to XLA's generic gather at the build's hop shape — 7.38 ms vs
    2.96 ms for (512, 128) rows of 1152 bf16 (20 vs 51 GB/s effective)
    — because the pipeline pays per-block overhead on every single-row
    block, and the scalar-prefetch idx array exceeds the 1 MB SMEM at
    the prune shape (512 x 750). Kept as the documented negative
    result + a base for a future manual-DMA variant; the hot path uses
    XLA gathers."""
    return (
        jax.default_backend() == "tpu"
        and os.environ.get("MSE_PALLAS_GATHER", "0") == "1"
    )

_GROUP = 128  # rows fetched per grid step (= in_spec count)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_flat(vectors3, idx_flat, *, interpret: bool = False):
    """(N, S, 128) x (M,) i32 -> (M, S*128); M % _GROUP == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, sub, lanes = vectors3.shape
    d = sub * lanes
    m = idx_flat.shape[0]
    g = _GROUP
    assert m % g == 0, m

    def kernel(idx_ref, *refs):
        out_ref = refs[-1]
        parts = [refs[j][0].reshape(1, d) for j in range(g)]
        out_ref[:] = jnp.concatenate(parts, axis=0)

    def mk_index_map(j):
        def index_map(step, idx_ref):
            return (idx_ref[step * g + j], 0, 0)

        return index_map

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // g,),
        in_specs=[
            pl.BlockSpec((1, sub, lanes), mk_index_map(j)) for j in range(g)
        ],
        out_specs=pl.BlockSpec((g, d), lambda step, idx_ref: (step, 0)),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), vectors3.dtype),
        interpret=interpret,
    )(idx_flat, *([vectors3] * g))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(
    vectors: jax.Array, idx: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """(N, D) x (B, K) i32 -> (B, K, D) fast row gather.

    Requires D % 128 == 0. Ids must be in-range (mask INVALID to 0 in
    the caller, as the XLA path does).
    """
    b, k = idx.shape
    n, d = vectors.shape
    assert d % 128 == 0, d
    m = b * k
    g = _GROUP
    pad = (-m) % g
    idx_flat = jnp.concatenate(
        [idx.reshape(-1), jnp.zeros((pad,), idx.dtype)]
    )
    out = _gather_flat(
        vectors.reshape(n, d // 128, 128), idx_flat, interpret=interpret
    )
    return out[:m].reshape(b, k, d)
