"""ChainQ: chain (residual/LSQ-style) quantization with Viterbi encoding.

Capability parity with diskann/chainq.py (experimental in the reference,
unused downstream): M codebooks of H entries over the full dimension,
where codebook supports overlap only between neighbours, so the exact
joint assignment minimising ||x - sum_m c_m||^2 decomposes into a chain
and dynamic programming (Viterbi) finds it:

  unary[m, h]  = -2 <c_mh, x> + ||c_mh||^2        (chainq.py:22)
  binary[m, h, h'] = 2 <c_mh, c_(m+1)h'>          (chainq.py:23-25)

The JAX build runs the DP as one ``lax.scan`` over the M steps with all
N vectors in lockstep (each step is an (N, H, H) min-reduction computed
from MXU matmuls), and alternates encode <-> orthogonal Procrustes
transform updates like the reference's training loop (chainq.py:113-138).
Artifact format matches ``chainq.msgpack`` (chainq.py:158-164).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ChainQuantizer", "viterbi_encode", "train_chainq"]


@functools.partial(jax.jit, static_argnames=())
def viterbi_encode(vectors: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Optimal chain codes: (N, D) x (M, H, D) -> (N, M) int32.

    Exact when codebook supports overlap only between adjacent codebooks
    (the chain assumption; chainq.py:10-54).
    """
    n, d = vectors.shape
    m, h, d2 = codebooks.shape
    assert d == d2

    # unary[m]: (N, H) = ||c||^2 - 2 c.x  (x.x constant dropped)
    unary = -2.0 * jnp.einsum(
        "mhd,nd->mnh", codebooks, vectors, preferred_element_type=jnp.float32
    ) + jnp.sum(jnp.square(codebooks), axis=2)[:, None, :]
    # binary[m]: (H, H') = 2 c_m . c_(m+1)
    binary = 2.0 * jnp.einsum(
        "mhd,mgd->mhg",
        codebooks[:-1],
        codebooks[1:],
        preferred_element_type=jnp.float32,
    )

    def forward(carry, inp):
        min_cost = carry  # (N, H) best cost ending at state h of step m
        unary_m, binary_m = inp  # (N, H), (H, H')
        total = min_cost[:, :, None] + binary_m[None, :, :]  # (N, H, H')
        best_prev = jnp.argmin(total, axis=1)  # (N, H')
        new_cost = jnp.min(total, axis=1) + unary_m
        return new_cost, best_prev

    init = unary[0]
    min_cost, back = jax.lax.scan(
        forward, init, (unary[1:], binary)
    )  # back: (M-1, N, H)

    last = jnp.argmin(min_cost, axis=1)  # (N,)

    def backward(code_next, back_m):
        code = jnp.take_along_axis(back_m, code_next[:, None], axis=1)[:, 0]
        return code, code

    _, codes_rev = jax.lax.scan(backward, last, back, reverse=True)
    codes = jnp.concatenate([codes_rev, last[None]], axis=0)  # (M, N)
    return codes.T.astype(jnp.int32)


@dataclasses.dataclass
class ChainQuantizer:
    codebooks: np.ndarray  # (M, H, D)
    transform: np.ndarray  # (D, D)
    n_dims: int
    n_dims_per_code: int

    def encode(self, vectors: np.ndarray) -> np.ndarray:
        xt = np.asarray(vectors, np.float32) @ self.transform.T
        return np.asarray(
            viterbi_encode(jnp.asarray(xt), jnp.asarray(self.codebooks))
        )

    def reconstruct(self, codes: np.ndarray) -> np.ndarray:
        """Codes -> transformed-space reconstruction (chainq.py:123-126)."""
        out = np.zeros((len(codes), self.n_dims), np.float32)
        for m_i in range(self.codebooks.shape[0]):
            out += self.codebooks[m_i, codes[:, m_i]]
        return out

    def preprocess_query(self, query: np.ndarray) -> np.ndarray:
        """LUT (M, H): per-codebook dot with the rotated query — ADC then
        sums LUT entries exactly like PQ."""
        qt = np.asarray(query, np.float32) @ self.transform.T
        return np.einsum("mhd,d->mh", self.codebooks, qt)

    def to_msgpack(self) -> bytes:
        import msgpack

        return msgpack.packb(
            {
                "codebooks": self.codebooks.astype(np.float32)
                .flatten()
                .tolist(),
                "transform": self.transform.astype(np.float32)
                .flatten()
                .tolist(),
                "n_dims": self.n_dims,
                "n_dims_per_code": self.n_dims_per_code,
            }
        )

    @classmethod
    def from_msgpack(cls, data: bytes) -> "ChainQuantizer":
        import msgpack

        d = msgpack.unpackb(data, raw=False)
        n_dims = d["n_dims"]
        m = n_dims // d["n_dims_per_code"]
        codebooks = np.asarray(d["codebooks"], np.float32).reshape(
            m, -1, n_dims
        )
        return cls(
            codebooks=codebooks,
            transform=np.asarray(d["transform"], np.float32).reshape(
                n_dims, n_dims
            ),
            n_dims=n_dims,
            n_dims_per_code=d["n_dims_per_code"],
        )


def train_chainq(
    vectors: np.ndarray,
    n_codebooks: int,
    n_entries: int,
    *,
    init_transform: Optional[np.ndarray] = None,
    init_centroids: Optional[np.ndarray] = None,
    n_iters: int = 10,
    seed: int = 0,
) -> ChainQuantizer:
    """Alternate Viterbi encode / Procrustes transform update
    (chainq.py:113-138). Codebooks init from per-chunk centroid slices
    (chainq.py:146-151) or k-means++-ish random rows.
    """
    x = np.asarray(vectors, np.float32)
    n, d = x.shape
    m, h = n_codebooks, n_entries
    dpc = d // m
    rng = np.random.default_rng(seed)

    transform = (
        np.asarray(init_transform, np.float32)
        if init_transform is not None
        else np.eye(d, dtype=np.float32)
    )
    codebooks = np.zeros((m, h, d), np.float32)
    if init_centroids is None:
        init_centroids = x[rng.permutation(n)[:h]] @ transform.T
    for dim in range(d):
        codebooks[dim // dpc, :, dim] = init_centroids[:, dim]

    cb_dev = jnp.asarray(codebooks)
    x_dev = jnp.asarray(x)

    @jax.jit
    def iterate(cb, transform):
        xt = jnp.dot(x_dev, transform.T, preferred_element_type=jnp.float32)
        codes = viterbi_encode(xt, cb)
        quantized = jnp.sum(
            cb[jnp.arange(m)[None, :], codes], axis=1
        )  # (N, D)
        err = jnp.mean(jnp.abs(quantized - xt))
        # orthogonal Procrustes on transform (chainq.py:130-135)
        res = jnp.dot(xt.T, quantized, preferred_element_type=jnp.float32)
        u, _s, vt = jnp.linalg.svd(res)
        # convention: rotate with x @ T.T; chain uses T = (U V^T)^T-form
        new_t = jnp.dot(u, vt).T @ transform
        return cb, new_t, err

    t_dev = jnp.asarray(transform)
    for _i in range(n_iters):
        cb_dev, t_dev, err = iterate(cb_dev, t_dev)

    return ChainQuantizer(
        codebooks=np.asarray(cb_dev),
        transform=np.asarray(t_dev),
        n_dims=d,
        n_dims_per_code=dpc,
    )
