"""Fused LayerNorm + projection kernel for the SigLIP towers.

The reference hand-builds its inference graph with AITemplate
(aitemplate/model.py:26-123) precisely to fuse normalisation into the
surrounding GEMMs; this is the TPU equivalent. XLA *can* fuse a
LayerNorm prologue into a matmul, but the fusion degrades its MXU
schedule (measured on one v5e at SigLIP shapes: XLA ln+qkv-matmul
8.1 ms vs 5.7 ms for the matmul alone). This kernel keeps the weight
matrix resident in VMEM (constant block over the grid), streams row
blocks of the activation, and computes the LayerNorm on the fly in
fp32: 8.1 ms -> 4.7 ms per SigLIP layer for the fat-QKV projection.

Used for the image tower's QKV projection (ops/attention.py fat
layout). The MLP's fc1+gelu stays in XLA, which wins there (6.4 vs
8.0 ms measured — the 9.9 MB resident fc1 weight squeezes VMEM too
hard for good double-buffering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ln_matmul", "matmul_residual"]


def _ln_mm_kernel(
    x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, act, k_mask
):
    xb = x_ref[0].astype(jnp.float32)  # (SQ, DIN)
    mu = jnp.mean(xb, axis=1, keepdims=True)
    xc = xb - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = (
        xc * jax.lax.rsqrt(var + 1e-6) * g_ref[0] + b_ref[0]
    ).astype(jnp.bfloat16)
    y = jnp.dot(xn, w_ref[:], preferred_element_type=jnp.float32)
    y = y + bias_ref[0]
    if act == "gelu":
        y = jax.nn.gelu(y, approximate=True)
    o_ref[0] = y.astype(o_ref.dtype)
    if k_mask is not None:
        # packed fat-QKV epilogue: overwrite the K section's pad rows
        # with [0.., -1e30 at each head's const column] so the attention
        # kernel's MXU-baked mask sees them — written here in VMEM so the
        # host graph needs no update op on the 700 MB packed array
        import jax.experimental.pallas as pl

        n_valid, n_heads, c, d = k_mask
        sq = x_ref.shape[1]
        hc = n_heads * c
        row0 = pl.program_id(1) * sq

        @pl.when(row0 + sq > n_valid)
        def _():
            lanes = jax.lax.broadcasted_iota(
                jnp.int32, (sq, hc), 1
            )
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (sq, hc), 0) + row0
            )
            const = jnp.where(
                lanes % c == d, jnp.float32(-1e30), 0.0
            ).astype(o_ref.dtype)
            sec = o_ref[0, :, hc : 2 * hc]
            o_ref[0, :, hc : 2 * hc] = jnp.where(
                rows >= n_valid, const, sec
            )


@functools.partial(
    jax.jit, static_argnames=("act", "nq", "interpret", "k_mask")
)
def ln_matmul(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    act: str | None = None,
    nq: int = 4,
    interpret: bool = False,
    k_mask: tuple | None = None,
) -> jax.Array:
    """act(LayerNorm(x) @ w + bias) with w resident in VMEM.

    x: (B, SP, DIN) with SP % nq == 0 and (SP/nq) % 8 == 0;
    gamma/beta: (DIN,); w: (DIN, N); bias: (N,). Returns (B, SP, N)
    in x.dtype. LayerNorm statistics and the matmul accumulate in fp32
    (same numerics as models.siglip._layer_norm + _dense).

    ``k_mask=(n_valid, n_heads, c, d)``: packed fat-QKV mode — rows
    >= n_valid of the output's K section (cols [H*C, 2*H*C)) are
    overwritten with the attention pad-mask constant in-kernel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sp, din = x.shape
    n = w.shape[1]
    assert sp % nq == 0 and (sp // nq) % 8 == 0, (sp, nq)
    sq = sp // nq
    return pl.pallas_call(
        functools.partial(_ln_mm_kernel, act=act, k_mask=k_mask),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, sq, din), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((1, din), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, din), lambda bb, qq: (0, 0)),
            pl.BlockSpec((din, n), lambda bb, qq: (0, 0)),  # resident
            pl.BlockSpec((1, n), lambda bb, qq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sq, n), lambda bb, qq: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        x,
        gamma.astype(jnp.float32)[None],
        beta.astype(jnp.float32)[None],
        w,
        bias.astype(jnp.float32)[None],
    )


def _mm_res_kernel(x_ref, w_ref, bias_ref, r_ref, o_ref):
    y = jnp.dot(x_ref[0], w_ref[:], preferred_element_type=jnp.float32)
    y = y + bias_ref[0] + r_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nq", "interpret"))
def matmul_residual(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    res: jax.Array,
    nq: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """res + x @ w + bias with w resident in VMEM (fp32 accumulate).

    Fuses a projection's residual add into its epilogue so the residual
    stream is read once in-kernel instead of via a separate HBM pass.
    Used for the image tower's attention output projection (w is
    1152x1152 = 2.7 MB resident; the 9.9 MB fc2 weight measured slower
    than XLA here, so fc2 stays in XLA).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sp, din = x.shape
    n = w.shape[1]
    assert sp % nq == 0 and (sp // nq) % 8 == 0, (sp, nq)
    sq = sp // nq
    return pl.pallas_call(
        _mm_res_kernel,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, sq, din), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((din, n), lambda bb, qq: (0, 0)),  # resident
            pl.BlockSpec((1, n), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, sq, n), lambda bb, qq: (bb, qq, 0)),
        ],
        out_specs=pl.BlockSpec((1, sq, n), lambda bb, qq: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x, w, bias.astype(jnp.float32)[None], res)
