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
layout). The MLP sub-block runs through ``ln_mlp_residual`` below —
an early ln_matmul-style fc1 fusion LOST to XLA (6.4 vs 8.0 ms: the
9.9 MB fc1 weight alone squeezed double-buffering), but fusing the
WHOLE MLP with both weights resident and the gelu intermediate blocked
in VMEM wins decisively (11.3 ms and no per-row-block weight
re-streaming; BENCHMARKS.md MLP geometry sweep).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ln_matmul", "matmul_residual", "ln_mlp_residual"]


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


def _ln_mlp_res_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, mh
):
    """Resident-weights variant: w1/w2 live whole in VMEM (constant
    blocks over the grid — fetched from HBM once, not per row block);
    the gelu intermediate is produced in ``mh``-wide slices that never
    leave VMEM."""
    xb = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(xb, axis=1, keepdims=True)
    xc = xb - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = (
        xc * jax.lax.rsqrt(var + 1e-6) * g_ref[0] + b_ref[0]
    ).astype(x_ref.dtype)
    m = w1_ref.shape[1]
    acc = xb  # residual folded into the fp32 accumulator
    for i in range(m // mh):
        h = (
            jnp.dot(
                xn,
                w1_ref[:, i * mh : (i + 1) * mh],
                preferred_element_type=jnp.float32,
            )
            + b1_ref[0, i * mh : (i + 1) * mh]
        )
        h = jax.nn.gelu(h, approximate=True).astype(x_ref.dtype)
        acc = acc + jnp.dot(
            h,
            w2_ref[i * mh : (i + 1) * mh, :],
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = (acc + b2_ref[0]).astype(o_ref.dtype)


def _ln_mlp_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    xn_ref, acc_ref, *, nh
):
    import jax.experimental.pallas as pl

    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        xb = x_ref[0].astype(jnp.float32)
        mu = jnp.mean(xb, axis=1, keepdims=True)
        xc = xb - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
        xn_ref[...] = (
            xc * jax.lax.rsqrt(var + 1e-6) * g_ref[0] + b_ref[0]
        ).astype(xn_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = (
        jnp.dot(xn_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[0]
    )
    h = jax.nn.gelu(h, approximate=True).astype(xn_ref.dtype)
    acc_ref[...] += jnp.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(i == nh - 1)
    def _():
        o_ref[0] = (
            acc_ref[...] + b2_ref[0] + x_ref[0].astype(jnp.float32)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("nq", "mh", "resident", "interpret")
)
def ln_mlp_residual(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    nq: int = 1,
    mh: int = 256,
    resident: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x + gelu(LayerNorm(x) @ w1 + b1) @ w2 + b2, fully fused.

    The whole pre-LN transformer MLP sub-block in one Pallas kernel: the
    (B, SP, M) gelu intermediate never exists in HBM (XLA materialises it
    between the two matmuls — 810 MB each way per SigLIP layer at
    B=128), and the LayerNorm costs no separate fp32 HBM pass. The
    hidden dimension is blocked into ``mh``-wide slices streamed over an
    accumulation grid axis: per step fc1 produces an (SQ, mh) gelu slab
    in VMEM and fc2 immediately contracts it into the fp32 accumulator.
    Weight re-streaming across row blocks stays hidden under the MXU
    (measured: 12.6 ms -> ~9.5 ms per SigLIP layer; MLP at ~88% of the
    bare-matmul roofline). Equivalent hand-fusion in the reference:
    AITemplate's fused gelu/add linears (aitemplate/model.py:52-80).

    x: (B, SP, D); w1: (D, M); w2: (M, D). M is zero-padded to a
    multiple of ``mh`` (gelu(0)=0 makes pad lanes exact no-ops).
    Returns (B, SP, D) in x.dtype with fp32 accumulation throughout.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sp, d = x.shape
    m = w1.shape[1]
    assert sp % nq == 0 and (sp // nq) % 8 == 0, (sp, nq)
    sq = sp // nq
    mh = min(mh, ((m + 127) // 128) * 128)
    mpad = ((m + mh - 1) // mh) * mh
    nh = mpad // mh
    if mpad != m:
        w1 = jnp.pad(w1, ((0, 0), (0, mpad - m)))
        b1 = jnp.pad(b1, (0, mpad - m))
        w2 = jnp.pad(w2, ((0, mpad - m), (0, 0)))
    if resident:
        # both weights whole in VMEM (w1+w2 = 2*D*Mpad bytes — 19.8 MB
        # at SO400M bf16; fits v5e VMEM with room for the row block):
        # fetched once for the whole grid instead of per row block.
        return pl.pallas_call(
            functools.partial(_ln_mlp_res_kernel, mh=mh),
            grid=(b, nq),
            in_specs=[
                pl.BlockSpec((1, sq, d), lambda bb, qq: (bb, qq, 0)),
                pl.BlockSpec((1, d), lambda bb, qq: (0, 0)),
                pl.BlockSpec((1, d), lambda bb, qq: (0, 0)),
                pl.BlockSpec((d, mpad), lambda bb, qq: (0, 0)),
                pl.BlockSpec((1, mpad), lambda bb, qq: (0, 0)),
                pl.BlockSpec((mpad, d), lambda bb, qq: (0, 0)),
                pl.BlockSpec((1, d), lambda bb, qq: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, sq, d), lambda bb, qq: (bb, qq, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")
            ),
            interpret=interpret,
        )(
            x,
            gamma.astype(jnp.float32)[None],
            beta.astype(jnp.float32)[None],
            w1,
            b1.astype(jnp.float32)[None],
            w2,
            b2.astype(jnp.float32)[None],
        )
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, nh=nh),
        grid=(b, nq, nh),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda bb, qq, ih: (bb, qq, 0)),
            pl.BlockSpec((1, d), lambda bb, qq, ih: (0, 0)),
            pl.BlockSpec((1, d), lambda bb, qq, ih: (0, 0)),
            pl.BlockSpec((d, mh), lambda bb, qq, ih: (0, ih)),
            pl.BlockSpec((1, mh), lambda bb, qq, ih: (0, ih)),
            pl.BlockSpec((mh, d), lambda bb, qq, ih: (ih, 0)),
            pl.BlockSpec((1, d), lambda bb, qq, ih: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, sq, d), lambda bb, qq, ih: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((sq, d), x.dtype),
            pltpu.VMEM((sq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(
        x,
        gamma.astype(jnp.float32)[None],
        beta.astype(jnp.float32)[None],
        w1,
        b1.astype(jnp.float32)[None],
        w2,
        b2.astype(jnp.float32)[None],
    )
