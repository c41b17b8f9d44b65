"""Asymmetric distance computation (ADC) over PQ codes, TPU-style.

The reference's hot loop sums per-chunk LUT entries in scalar code
(diskann/src/vector.rs:387-405 asymmetric_dot_product; fp32 accumulation
is load-bearing for quality — see the comment at vector.rs:401-403, we
keep fp32 too). On TPU, table lookups become MXU work: codes expand to
one-hot rows and the LUT sum is a single matmul — trading 256x FLOP
inflation for full MXU throughput, which beats gather-based lowering for
batched queries.

Also implements the descriptor-column dot: quality-model CDF bytes act
as extra vector components weighted by slider scales
(query_disk_index.rs:128-142, scales = weight * 1/512, :463-473).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["adc_scores", "adc_scores_batched", "descriptor_scores"]


@jax.jit
def adc_scores(codes: jax.Array, lut: jax.Array) -> jax.Array:
    """Single-query ADC: (N, M) u8 codes x (M, C) f32 LUT -> (N,) f32."""
    return adc_scores_batched(codes, lut[None])[0]


@jax.jit
def adc_scores_batched(codes: jax.Array, luts: jax.Array) -> jax.Array:
    """Batched ADC: (N, M) u8 codes x (B, M, C) f32 LUTs -> (B, N) f32.

    One-hot-matmul formulation: scores[b, n] = sum_m LUT[b, m, codes[n, m]]
    = OneHot(codes) (N, M*C) @ LUT[b] flat (M*C). All FLOPs land on the
    MXU; the codes matrix (the real HBM traffic, 64 B/vector at the
    reference's geometry) is read once for the whole query batch.
    """
    n, m = codes.shape
    b, m2, c = luts.shape
    assert m == m2, (m, m2)
    # fp32 throughout: quantized-score quality degrades measurably with
    # low-precision accumulation (the reference hit this with integer
    # accumulation, vector.rs:401-403; bf16 LUTs show the same effect)
    onehot = jax.nn.one_hot(codes.astype(jnp.int32), c, dtype=jnp.float32)
    return jnp.einsum(
        "nmc,bmc->bn",
        onehot,
        luts.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


@jax.jit
def descriptor_scores(desc_codes: jax.Array, scales: jax.Array) -> jax.Array:
    """(N, K) u8 CDF descriptor bytes x (K,) f32 scales -> (N,) f32.

    "Effectively an extra part of the vector to dot product"
    (query_disk_index.rs:133-142).
    """
    return jnp.dot(
        desc_codes.astype(jnp.float32),
        scales.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
