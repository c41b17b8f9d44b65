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

__all__ = ["mha", "flash_mha"]


def mha(q: jax.Array, k: jax.Array, v: jax.Array, *, causal: bool = False) -> jax.Array:
    """Scaled dot-product attention, fp32 accumulation/softmax.

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
