"""Per-dimension u8 scalar quantizer with quantile clipping.

Capability parity with diskann/scalar_quantize.py: per-dimension affine
u8 quantization clipped at the 1e-3/2 quantile tails (:13-17), with
integer-dot rescale factors sized against i32 accumulation overflow and
16-bit multiply limits (:61-83). Artifact layout matches
``quantizer.msgpack`` (:103-110: permutation, offsets, scales,
q_offsets, q_scales).

On TPU the integer-dot path maps to int8/int16 MXU matmuls; the fp
dequantize-dot path is also provided (exact, simpler, still one matmul).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ScalarQuantizer", "train_scalar_quantizer"]

CUTOFF = 1e-3 / 2  # quantile clip (scalar_quantize.py:12)


@dataclasses.dataclass
class ScalarQuantizer:
    permutation: np.ndarray  # (D,) dimension order (identity by default)
    offsets: np.ndarray  # (D,) f32 — value of u8 0
    scales: np.ndarray  # (D,) f32 — 1/step_size
    q_offsets: np.ndarray  # (D,) i16 — integer offset added at dot time
    q_scales: np.ndarray  # (D,) i16 — integer per-dim rescale

    @property
    def n_dims(self) -> int:
        return self.permutation.shape[0]

    # -- artifact -----------------------------------------------------------

    def to_msgpack(self) -> bytes:
        import msgpack

        return msgpack.packb(
            {
                "permutation": self.permutation.astype(int).tolist(),
                "offsets": self.offsets.astype(float).tolist(),
                "scales": self.scales.astype(float).tolist(),
                "q_offsets": [int(x) for x in self.q_offsets],
                "q_scales": [int(x) for x in self.q_scales],
            }
        )

    @classmethod
    def from_msgpack(cls, data: bytes) -> "ScalarQuantizer":
        import msgpack

        d = msgpack.unpackb(data, raw=False)
        return cls(
            permutation=np.asarray(d["permutation"], np.int32),
            offsets=np.asarray(d["offsets"], np.float32),
            scales=np.asarray(d["scales"], np.float32),
            q_offsets=np.asarray(d["q_offsets"], np.int16),
            q_scales=np.asarray(d["q_scales"], np.int16),
        )

    # -- runtime ------------------------------------------------------------

    def quantize(self, x: np.ndarray) -> np.ndarray:
        """(B, D) f32 -> (B, D) u8 (scalar_quantize.py:112-120)."""
        xp = np.asarray(x, np.float32)[:, self.permutation]
        raw = (xp - self.offsets[None, :]) * self.scales[None, :]
        return np.clip(np.rint(raw), 0, 255).astype(np.uint8)

    def dequantize(self, codes: np.ndarray) -> np.ndarray:
        """(B, D) u8 -> (B, D) f32 in permuted order (:122-128)."""
        return codes.astype(np.float32) / self.scales[None, :] + self.offsets[
            None, :
        ]

    def integer_dot(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Rescaled integer dot of u8 code rows; monotone proxy for the
        true dot (scalar_quantize.py:130-141 rdot).

        (x + q_off) * q_scale . (y + q_off), accumulated in i32/i64 —
        on TPU this is an int16 x int16 -> int32 MXU contraction.
        """
        return np.asarray(
            _integer_dot(
                jnp.asarray(x, jnp.int32),
                jnp.asarray(y, jnp.int32),
                jnp.asarray(self.q_offsets, jnp.int32),
                jnp.asarray(self.q_scales, jnp.int32),
            )
        )


@jax.jit
def _integer_dot(x, y, q_offsets, q_scales):
    x1 = (x + q_offsets[None, :]) * q_scales[None, :]
    y1 = y + q_offsets[None, :]
    # i32 accumulation: q_scales are bounded at train time so per-element
    # products fit i32 with headroom (scalar_quantize.py:70-78)
    return jnp.sum(x1 * y1, axis=-1, dtype=jnp.int32)


def train_scalar_quantizer(data: np.ndarray) -> ScalarQuantizer:
    """Fit per-dim ranges on a dataset sample (scalar_quantize.py:13-83)."""
    data = np.asarray(data, np.float32)
    n_dims = data.shape[1]
    smin = np.quantile(data, CUTOFF, axis=0)
    smax = np.quantile(data, 1 - CUTOFF, axis=0)
    ranges = np.maximum(smax - smin, 1e-12)

    step = ranges / 255.0
    scales = 1.0 / step
    q_offsets = np.trunc(smin / step).astype(np.int64)

    # bound the integer rescale factor against i32 accumulator overflow
    # (one dim per bucket here, n_dims_per_bucket == 1) and 16-bit
    # multiply range (scalar_quantize.py:70-78)
    sfb = np.inf
    for j in range(n_dims):
        qo = q_offsets[j]
        nsfb = (2**31 - 1) / abs(255**2 + 2 * qo * 255 + qo**2) / 2
        sfb = min(sfb, nsfb, (2**15 - 1) // max(1, abs(qo) + 255))
    sfb = sfb / float(np.max(ranges) ** 2)
    q_scales = (ranges**2 * sfb).astype(np.int64)
    q_scales = np.maximum(q_scales, 1)

    return ScalarQuantizer(
        permutation=np.arange(n_dims, dtype=np.int32),
        offsets=smin.astype(np.float32),
        scales=scales.astype(np.float32),
        q_offsets=q_offsets.astype(np.int16),
        q_scales=q_scales.astype(np.int16),
    )
