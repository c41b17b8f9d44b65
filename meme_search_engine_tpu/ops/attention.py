"""Multi-head attention for the SigLIP towers.

The reference runs attention through PyTorch SDPA / AITemplate's
mem-efficient CUDA kernels (aitemplate/model.py:26-44). On TPU the
equivalent is an XLA-fused batched matmul chain with fp32 softmax — XLA
fuses the scale/softmax elementwise work into the surrounding matmuls,
and at seq=729 the score matrix tiles comfortably through VMEM. A Pallas
flash-attention path exists for the long-sequence / memory-bound regime.

Shapes follow (batch, seq, heads, head_dim) throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["mha", "mha_xla", "fused_mha_pallas", "flash_mha",
           "fat_vit_mha", "fat_width", "fat_layout_ok"]


def mha(q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = False) -> jax.Array:
    """Scaled dot-product attention — dispatches to the Pallas fused
    kernel on TPU (scores never touch HBM), XLA elsewhere.

    q, k, v: (B, S, H, Dh). Returns (B, Sq, H, Dh) in q.dtype.
    """
    sq, sk = q.shape[1], k.shape[1]
    if (
        not causal
        and jax.default_backend() == "tpu"
        and sq == sk
        and sq > 1
        and sq <= 2048
    ):
        import os

        b, h = q.shape[0], q.shape[2]
        hpp = int(os.environ.get("MSE_MHA_HPP", "0")) or None
        if hpp and (b * h) % hpp:
            hpp = None
        return fused_mha_pallas(q, k, v, hpp=hpp)
    return mha_xla(q, k, v, causal=causal)


def mha_xla(q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = False) -> jax.Array:
    """Reference XLA attention, fp32 accumulation/softmax.

    q, k, v: (B, S, H, Dh). Returns (B, Sq, H, Dh) in q.dtype.
    """
    dh = q.shape[-1]
    scale = 1.0 / (dh**0.5)
    # (B, H, Sq, Sk) scores in fp32 for a numerically stable softmax.
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    scores = scores * scale
    if causal:
        sq, sk = scores.shape[-2], scores.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _fused_attention_kernel(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, hpp: int, stable: str
):
    """A few (batch, head) slices' full attention entirely in VMEM.

    At ViT scale (S=729) the whole S x S score matrix fits on-chip
    (736x736 fp32 = 2.2 MB), so instead of a streaming flash kernel we
    do one QK^T MXU pass, an in-VMEM softmax, and one AV pass — HBM sees
    only q/k/v in and o out. This is the hot win over the XLA path,
    which round-trips ~2 GB/layer of score tensors through HBM
    (measured: 38.8 ms -> 9.3 ms per ViT layer's attention at bs=128).

    Softmax tricks (each saves a full VPU pass over the S x S block):
    - division by the partition deferred to the (S, Dh) output;
    - ``stable="scalar"`` subtracts one global max (softmax is invariant
      to any constant shift, so this is exact) instead of a per-row max.
    """
    for j in range(hpp):
        q = q_ref[j]  # (S, Dp)
        k = k_ref[j]
        v = v_ref[j]
        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),  # q @ k.T
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        if stable == "row":
            p = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
        elif stable == "scalar":
            p = jnp.exp(s - jnp.max(s))
        else:
            p = jnp.exp(s)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        from jax.experimental import pallas as pl

        o_ref[j] = (o * pl.reciprocal(l, approx=False)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("stable", "interpret", "hpp"))
def fused_mha_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    stable: str = "scalar",
    interpret: bool = False,
    hpp: int | None = None,
) -> jax.Array:
    """Pallas fused non-causal attention for (B, S, H, Dh) inputs.

    Head dim pads to the 128-lane width (zero K-padding is exact for
    QK^T; zero V-padding yields zero columns which are sliced off).
    Grid = one program per ``hpp`` (batch, head) slices; Pallas
    double-buffers the per-head DMAs against the MXU automatically.
    ``hpp`` defaults to 2 (the measured image-tower optimum at S=729);
    at short sequence the per-program work is tiny and larger ``hpp``
    amortises program/DMA overhead over more heads (swept at S=64 in
    tools_profile_text_stages.py).
    """
    from jax.experimental import pallas as pl

    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    # Mosaic pads sub-128 minor dims in VMEM itself; padding in HBM here
    # would add 3 full q/k/v copy passes for zero kernel-time gain
    # (measured identical at Dh=72)
    dp = d if d % 8 == 0 else ((d + 7) // 8) * 8
    if hpp is None:
        hpp = 2 if (b * h) % 2 == 0 else 1
    assert (b * h) % hpp == 0, (b, h, hpp)

    def to_bh(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, s, d)
        if dp != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, dp - d)))
        return x

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    out = pl.pallas_call(
        functools.partial(
            _fused_attention_kernel, scale=scale, hpp=hpp, stable=stable
        ),
        grid=(b * h // hpp,),
        in_specs=[
            pl.BlockSpec((hpp, s, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((hpp, s, dp), lambda i: (i, 0, 0)),
            pl.BlockSpec((hpp, s, dp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((hpp, s, dp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s, dp), q.dtype),
        interpret=interpret,
    )(qb, kb, vb)

    out = out[:, :, :d].reshape(b, h, s, d)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_mha(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Blocked (flash) attention via lax.scan over key blocks.

    Keeps the (Sq, Sk) score matrix out of HBM; useful when S is large.
    Same signature/semantics as :func:`mha` (non-causal).
    """
    b, sq, h, dh = q.shape
    sk = k.shape[1]
    scale = 1.0 / (dh**0.5)

    qf = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale  # (B,H,Sq,Dh)
    kf = jnp.swapaxes(k, 1, 2).astype(jnp.float32)
    vf = jnp.swapaxes(v, 1, 2).astype(jnp.float32)

    pad_k = (-sk) % block_k
    if pad_k:
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    nk = kf.shape[2] // block_k
    kf = kf.reshape(b, h, nk, block_k, dh)
    vf = vf.reshape(b, h, nk, block_k, dh)
    kv_mask = (jnp.arange(nk * block_k) < sk).reshape(nk, block_k)

    def step(carry, kv):
        m, l, acc = carry
        kb, vb, maskb = kv
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kb)
        s = jnp.where(maskb[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])
        correction = jnp.exp(m - m_new)
        l_new = l * correction + p.sum(axis=-1)
        acc_new = acc * correction[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vb
        )
        return (m_new, l_new, acc_new), None

    m0 = jnp.full((b, h, sq), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, sq), dtype=jnp.float32)
    acc0 = jnp.zeros((b, h, sq, dh), dtype=jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        step,
        (m0, l0, acc0),
        (
            jnp.moveaxis(kf, 2, 0),
            jnp.moveaxis(vf, 2, 0),
            kv_mask,
        ),
    )
    out = acc / l[..., None]
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


# ---------------------------------------------------------------------------
# Fat-layout ViT attention (the production image-tower kernel)
# ---------------------------------------------------------------------------
#
# Measured on one v5e at SigLIP shapes (B=128, S=729->736, H=16, Dh=72):
# the per-(batch,head) kernel above is DMA-bound — its (S, 72) blocks DMA
# 144-byte rows at ~140 GB/s (a pure copy kernel costs 6.1 of its 9.4 ms).
# This kernel instead takes q/k/v in a "fat" head-major layout
# (B, SP, H*C) with C = head_dim padded to a multiple of 8 plus one
# constant column, so every DMA row is H*C*2 = 2560 contiguous bytes, and
# three softmax passes ride the MXU for free:
#
# - scale 1/sqrt(d) is folded into the q projection weights;
# - the key-padding mask is an extra feature: q's const column is 1 and
#   k's const column is 0 on valid rows / -1e30 on pad rows, so QK^T
#   emits masked scores directly (exact, no VPU where-pass);
# - v's const column is 1, so the PV matmul's extra output column IS the
#   softmax partition sum (no VPU reduction).
#
# VPU work per head: one row-max pass + one exp pass — the structural
# minimum for a numerically stable softmax. 9.4 ms -> 3.4 ms per ViT
# layer (33 -> 91 TF/s).


def fat_width(head_dim: int) -> int:
    """Per-head fat width: head_dim + const column, padded to 8 lanes."""
    return ((head_dim + 1 + 7) // 8) * 8


def fat_layout_ok(n_heads: int, head_dim: int, sp: int) -> bool:
    """Whether (n_heads, head_dim, padded seq) qualifies for the fat
    kernel: Pallas block widths must be 128-multiples and row blocks
    8-multiples."""
    return (n_heads * fat_width(head_dim)) % 128 == 0 and sp % 16 == 0


def _fat_vit_kernel(q_ref, k_ref, v_ref, o_ref, *, h, c, d):
    qb = q_ref[0]  # (SQ, H*C) — q pre-scaled, const col = 1
    kb = k_ref[0]  # (SP, H*C) — const col 0 (valid) / -1e30 (pad rows)
    vb = v_ref[0]  # (SP, H*C) — const col 1 (partition-sum column)
    for hh in range(h):
        qh = qb[:, hh * c : (hh + 1) * c]
        kh = kb[:, hh * c : (hh + 1) * c]
        vh = vb[:, hh * c : (hh + 1) * c]
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # masked scores: pad keys are -1e30 via the const feature
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m).astype(jnp.bfloat16)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        l = o[:, d : d + 1]  # partition sum from v's ones column
        from jax.experimental import pallas as pl

        o_ref[0, :, hh * d : (hh + 1) * d] = (
            o[:, :d] * pl.reciprocal(l, approx=False)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "head_dim", "nq", "interpret")
)
def fat_vit_mha(
    qf: jax.Array,
    kf: jax.Array,
    vf: jax.Array,
    n_heads: int,
    head_dim: int,
    *,
    nq: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """Fat-layout attention: (B, SP, H*C) q/k/v -> (B, SP, H*head_dim).

    Inputs must follow the fat-layout contract (see module comment);
    :func:`meme_search_engine_tpu.models.siglip` emits it directly from
    the QKV projection weights. ``nq`` splits queries into row blocks
    (k/v blocks stay resident across them).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sp, hc = qf.shape
    c = fat_width(head_dim)
    assert hc == n_heads * c, (hc, n_heads, c)
    assert sp % nq == 0 and (sp // nq) % 8 == 0, (sp, nq)
    sq = sp // nq
    return pl.pallas_call(
        functools.partial(_fat_vit_kernel, h=n_heads, c=c, d=head_dim),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, sq, hc), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((1, sp, hc), lambda bb, qq: (bb, 0, 0)),
            pl.BlockSpec((1, sp, hc), lambda bb, qq: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, sq, n_heads * head_dim), lambda bb, qq: (bb, qq, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, sp, n_heads * head_dim), qf.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qf, kf, vf)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "head_dim", "nq", "interpret")
)
def fat_vit_mha_packed(
    qkvf: jax.Array,
    n_heads: int,
    head_dim: int,
    *,
    nq: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """:func:`fat_vit_mha` over one packed (B, SP, 3*H*C) array
    [qf | kf | vf] — the fused LN+QKV projection's output is consumed
    directly; the kernel reads the three sections as block views, so
    q/k/v never exist as separate HBM arrays."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sp, hc3 = qkvf.shape
    c = fat_width(head_dim)
    hc = n_heads * c
    assert hc3 == 3 * hc, (hc3, n_heads, c)
    assert sp % nq == 0 and (sp // nq) % 8 == 0, (sp, nq)
    sq = sp // nq
    return pl.pallas_call(
        functools.partial(_fat_vit_kernel, h=n_heads, c=c, d=head_dim),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, sq, hc), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((1, sp, hc), lambda bb, qq: (bb, 0, 1)),
            pl.BlockSpec((1, sp, hc), lambda bb, qq: (bb, 0, 2)),
        ],
        out_specs=pl.BlockSpec(
            (1, sq, n_heads * head_dim), lambda bb, qq: (bb, qq, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, sp, n_heads * head_dim), qkvf.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qkvf, qkvf, qkvf)


def _fat_vit_proj_kernel(
    q_ref, k_ref, v_ref, wo_ref, bo_ref, res_ref, o_ref, attn_ref,
    *, h, c, d
):
    """Fat attention + output projection + residual in one kernel.

    Per-head attention accumulates into a VMEM scratch; the epilogue is
    one (SQ, H*D) @ (H*D, H*D) MXU matmul with the residual folded in —
    the separate o-projection HBM pass disappears, and its MXU work
    overlaps the per-head VPU softmax passes.
    """
    from jax.experimental import pallas as pl

    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    for hh in range(h):
        qh = qb[:, hh * c : (hh + 1) * c]
        kh = kb[:, hh * c : (hh + 1) * c]
        vh = vb[:, hh * c : (hh + 1) * c]
        sc = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(sc, axis=1, keepdims=True)
        p = jnp.exp(sc - m).astype(jnp.bfloat16)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        l = o[:, d : d + 1]
        attn_ref[:, hh * d : (hh + 1) * d] = (
            o[:, :d] * pl.reciprocal(l, approx=False)
        ).astype(attn_ref.dtype)
    y = jnp.dot(attn_ref[...], wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = (
        y + bo_ref[0] + res_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_heads", "head_dim", "nq", "interpret")
)
def fat_vit_mha_packed_proj(
    qkvf: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    res: jax.Array,
    n_heads: int,
    head_dim: int,
    *,
    nq: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """res + fat_attention(qkvf) @ wo + bo, fused.

    qkvf: packed (B, SP, 3*H*C); wo: (H*head_dim, DM); bo: (DM,);
    res: (B, SP, DM). Returns (B, SP, DM) in res.dtype.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sp, hc3 = qkvf.shape
    c = fat_width(head_dim)
    hc = n_heads * c
    hd = n_heads * head_dim
    dm = wo.shape[1]
    assert hc3 == 3 * hc, (hc3, n_heads, c)
    assert wo.shape[0] == hd, (wo.shape, hd)
    assert sp % nq == 0 and (sp // nq) % 8 == 0, (sp, nq)
    sq = sp // nq
    return pl.pallas_call(
        functools.partial(_fat_vit_proj_kernel, h=n_heads, c=c, d=head_dim),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, sq, hc), lambda bb, qq: (bb, qq, 0)),
            pl.BlockSpec((1, sp, hc), lambda bb, qq: (bb, 0, 1)),
            pl.BlockSpec((1, sp, hc), lambda bb, qq: (bb, 0, 2)),
            pl.BlockSpec((hd, dm), lambda bb, qq: (0, 0)),  # resident
            pl.BlockSpec((1, dm), lambda bb, qq: (0, 0)),
            pl.BlockSpec((1, sq, dm), lambda bb, qq: (bb, qq, 0)),
        ],
        out_specs=pl.BlockSpec((1, sq, dm), lambda bb, qq: (bb, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, sp, dm), res.dtype),
        scratch_shapes=[pltpu.VMEM((sq, hd), qkvf.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qkvf, qkvf, qkvf, wo, bo.astype(jnp.float32)[None], res)
