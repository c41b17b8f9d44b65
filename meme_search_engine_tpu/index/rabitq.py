"""RaBitQ-style 1-bit quantization (https://arxiv.org/abs/2405.12497).

Capability parity with diskann/rabitq.py: vectors are mean-centered and
unit-normalised, rotated by a random orthonormal projection P
(output_dims x n_dims, default 512), and stored as sign bits plus an
exact-dot correction factor <o_bar, o>; the approximate inner product
reconstructs as norm * (o_bar . Pq) * dot + mean . q (rabitq.py:30-48).
Artifact layout matches ``rabitq.msgpack`` (rabitq.py:62-68).

TPU shape: the sign matrix is kept as +-1 bf16 in HBM, so scoring a
query against N codes is one MXU matmul; bit-packing is provided for
disk storage.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RaBitQ", "train_rabitq"]


@dataclasses.dataclass
class RaBitQ:
    mean: np.ndarray  # (D,)
    transform: np.ndarray  # (output_dims, D) rows of a random ortho matrix
    output_dims: int
    n_dims: int

    @property
    def scale(self) -> float:
        return 1.0 / math.sqrt(self.output_dims)

    # -- artifact -----------------------------------------------------------

    def to_msgpack(self) -> bytes:
        import msgpack

        return msgpack.packb(
            {
                "mean": self.mean.astype(np.float32).flatten().tolist(),
                "transform": self.transform.astype(np.float32)
                .flatten()
                .tolist(),
                "output_dims": self.output_dims,
                "n_dims": self.n_dims,
            }
        )

    @classmethod
    def from_msgpack(cls, data: bytes) -> "RaBitQ":
        import msgpack

        d = msgpack.unpackb(data, raw=False)
        return cls(
            mean=np.asarray(d["mean"], np.float32),
            transform=np.asarray(d["transform"], np.float32).reshape(
                d["output_dims"], d["n_dims"]
            ),
            output_dims=d["output_dims"],
            n_dims=d["n_dims"],
        )

    # -- runtime ------------------------------------------------------------

    def quantize(
        self, vectors: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(N, D) -> (signs (N, output_dims) bool, dots (N,), norms (N,)).

        dots = <dequantized sign vector, rotated centered vector> — the
        per-vector correction factor (rabitq.py:30-35).
        """
        signs, dots, norms = _quantize(
            jnp.asarray(vectors, jnp.float32),
            jnp.asarray(self.mean),
            jnp.asarray(self.transform),
            self.scale,
        )
        return np.asarray(signs), np.asarray(dots), np.asarray(norms)

    def approx_dot(
        self,
        signs: np.ndarray,
        dots: np.ndarray,
        norms: np.ndarray,
        query: np.ndarray,
    ) -> np.ndarray:
        """Estimated inner products against the original vectors
        (rabitq.py:42-48)."""
        return np.asarray(
            _approx_dot(
                jnp.asarray(signs),
                jnp.asarray(dots, jnp.float32),
                jnp.asarray(norms, jnp.float32),
                jnp.asarray(query, jnp.float32),
                jnp.asarray(self.mean),
                jnp.asarray(self.transform),
                self.scale,
            )
        )

    @staticmethod
    def pack_bits(signs: np.ndarray) -> np.ndarray:
        """(N, B) bool -> (N, B/8) u8 for disk storage."""
        return np.packbits(np.asarray(signs, bool), axis=1)

    @staticmethod
    def unpack_bits(packed: np.ndarray, output_dims: int) -> np.ndarray:
        return np.unpackbits(packed, axis=1, count=output_dims).astype(bool)


@jax.jit
def _quantize(vectors, mean, transform, scale):
    centered = vectors - mean[None, :]
    norms = jnp.linalg.norm(centered, axis=1)
    unit = centered / jnp.maximum(norms[:, None], 1e-30)
    xs = jnp.dot(unit, transform.T, preferred_element_type=jnp.float32)
    signs = xs > 0
    dequant = scale * (2.0 * signs.astype(jnp.float32) - 1.0)
    dots = jnp.sum(dequant * xs, axis=1)
    return signs, dots, norms


@jax.jit
def _approx_dot(signs, dots, norms, query, mean, transform, scale):
    qt = jnp.dot(transform, query, preferred_element_type=jnp.float32)
    dequant = scale * (2.0 * signs.astype(jnp.float32) - 1.0)
    obar_q = jnp.dot(dequant, qt, preferred_element_type=jnp.float32)
    return norms * obar_q * dots + jnp.dot(mean, query)


def train_rabitq(
    sample: np.ndarray, output_dims: int = 512, seed: int = 0
) -> RaBitQ:
    """Fit mean + random rotation from a dataset sample (rabitq.py:13-28).

    Only the first output_dims rows of the orthonormal matrix are kept
    (the algorithm uses P^-1 = P^T of a full rotation).
    """
    sample = np.asarray(sample, np.float32)
    n_dims = sample.shape[1]
    mean = sample.mean(axis=0)
    key = jax.random.PRNGKey(seed)
    h = jax.random.normal(key, (n_dims, n_dims), jnp.float32)
    q, _ = jnp.linalg.qr(h)
    return RaBitQ(
        mean=mean,
        transform=np.asarray(q)[:output_dims, :],
        output_dims=output_dims,
        n_dims=n_dims,
    )
