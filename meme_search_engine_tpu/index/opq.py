"""Inner-product OPQ: training and asymmetric-distance runtime.

Artifact-compatible with the reference's ``opq.msgpack``
(diskann/aopq_train.py:87-93: flat centroids, flat DxD orthonormal
transform, n_dims_per_code, n_dims) and its runtime semantics
(diskann/src/vector.rs:308-406 ProductQuantizer): 64 subspaces x 18 dims
x 256 centroids over d=1152; codes are per-subspace argmax *inner
product* (not L2) against full-D centroid rows sliced per subspace.

Training follows the reference's query-aware scheme
(aopq_train.py:33-85) re-expressed as jitted JAX:
  (a) Adam on centroids minimising E_q[(q . (x - quant(x)))^2] over
      sampled real queries (OOD-aware objective, OOD-DiskANN-style);
  (b) orthogonal Procrustes update of the rotation R = V U^T from
      SVD(X^T Y).
All inner loops are ``lax.scan``s; assignment is a batched MXU matmul +
argmax, not a Python loop.
"""

from __future__ import annotations

import dataclasses
import functools


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ProductQuantizer", "train_opq"]


@dataclasses.dataclass
class ProductQuantizer:
    centroids: np.ndarray  # (C, D) float32 — full-D rows, sliced per chunk
    transform: np.ndarray  # (D, D) orthonormal
    n_dims_per_code: int
    n_dims: int

    @property
    def n_chunks(self) -> int:
        return self.n_dims // self.n_dims_per_code

    @property
    def n_centroids(self) -> int:
        return self.centroids.shape[0]

    # -- msgpack artifact (opq.msgpack layout, aopq_train.py:87-93) --------

    def to_msgpack(self) -> bytes:
        import msgpack

        return msgpack.packb(
            {
                "centroids": self.centroids.astype(np.float32)
                .flatten()
                .tolist(),
                "transform": self.transform.astype(np.float32)
                .flatten()
                .tolist(),
                "n_dims_per_code": self.n_dims_per_code,
                "n_dims": self.n_dims,
            }
        )

    @classmethod
    def from_msgpack(cls, data: bytes) -> "ProductQuantizer":
        import msgpack

        d = msgpack.unpackb(data, raw=False)
        n_dims = d["n_dims"]
        centroids = np.asarray(d["centroids"], np.float32).reshape(-1, n_dims)
        transform = np.asarray(d["transform"], np.float32).reshape(
            n_dims, n_dims
        )
        return cls(centroids, transform, d["n_dims_per_code"], n_dims)

    # -- runtime ------------------------------------------------------------

    def apply_transform(self, x: np.ndarray) -> np.ndarray:
        """Rotate vectors into the quantization basis.

        The reference computes transform (DxD) @ x^T written back row-major
        as (B, D) (vector.rs:320-329), i.e. x @ transform^T.
        """
        return np.asarray(
            _apply_transform(jnp.asarray(x, jnp.float32), jnp.asarray(self.transform))
        )

    def quantize(self, x: np.ndarray) -> np.ndarray:
        """(B, D) -> (B, n_chunks) u8 codes (vector.rs:331-364)."""
        return np.asarray(self.quantize_async(x), np.uint8)

    def quantize_async(self, x: np.ndarray) -> jax.Array:
        """Dispatch :meth:`quantize` without fetching the result — the
        bulk-pack loop prefetches the next batch's codes while the host
        packs the current one. ``x`` is uploaded in its own dtype and
        upcast in-graph: fp16 corpora (the pack tail's memmap) move half
        the bytes over the host->device link for bit-identical codes
        (fp16 -> fp32 widening is exact)."""
        return _quantize(
            jnp.asarray(x),
            jnp.asarray(self.transform),
            jnp.asarray(self.centroids),
            self.n_dims_per_code,
        )

    def preprocess_query(self, query: np.ndarray) -> np.ndarray:
        """Query -> LUT (n_chunks, C) of per-chunk centroid dots
        (vector.rs:367-384).

        Host numpy: this sits on the per-query serving latency path (one
        ~100 KFLOP GEMV) where a device dispatch would cost more than the
        math (SURVEY hard-part 4)."""
        qt = np.asarray(query, np.float32) @ self.transform.T
        qc = qt.reshape(self.n_chunks, self.n_dims_per_code)
        cc = self.centroids.reshape(
            self.n_centroids, self.n_chunks, self.n_dims_per_code
        )
        return np.einsum("kd,ckd->kc", qc, cc, optimize=True)

    def asymmetric_dot(self, lut: np.ndarray, codes: np.ndarray) -> np.ndarray:
        """LUT-sum ADC scores, fp32 accumulation (vector.rs:387-405 keeps
        float accumulation deliberately; see comment there re: quality)."""
        from ..ops.adc import adc_scores

        return np.asarray(
            adc_scores(jnp.asarray(codes), jnp.asarray(lut, jnp.float32))
        )


@jax.jit
def _apply_transform(x, transform):
    return jnp.dot(x, transform.T, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_dims_per_code",))
def _quantize(x, transform, centroids, n_dims_per_code):
    b, d = x.shape
    c = centroids.shape[0]
    n_chunks = d // n_dims_per_code
    xt = jnp.dot(
        x.astype(jnp.float32), transform.T,
        preferred_element_type=jnp.float32,
    )
    xc = xt.reshape(b, n_chunks, n_dims_per_code)
    cc = centroids.reshape(c, n_chunks, n_dims_per_code)
    # (B, chunks, C) similarity per subspace in one batched MXU contraction
    sims = jnp.einsum("bkd,ckd->bkc", xc, cc, preferred_element_type=jnp.float32)
    return jnp.argmax(sims, axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("n_dims_per_code",))
def _make_lut(query, transform, centroids, n_dims_per_code):
    d = query.shape[-1]
    c = centroids.shape[0]
    n_chunks = d // n_dims_per_code
    qt = jnp.dot(query.reshape(-1), transform.T, preferred_element_type=jnp.float32)
    qc = qt.reshape(n_chunks, n_dims_per_code)
    cc = centroids.reshape(c, n_chunks, n_dims_per_code)
    return jnp.einsum("kd,ckd->kc", qc, cc, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


def _pq_assign_reconstruct(centroids, batch, n_dims_per_code):
    """Per-subspace nearest (max-IP) centroid reconstruction
    (aopq_train.py:18-28 semantics)."""
    b, d = batch.shape
    c = centroids.shape[0]
    n_chunks = d // n_dims_per_code
    xc = batch.reshape(b, n_chunks, n_dims_per_code)
    cc = centroids.reshape(c, n_chunks, n_dims_per_code)
    sims = jnp.einsum("bkd,ckd->bkc", xc, cc, preferred_element_type=jnp.float32)
    assign = jnp.argmax(sims, axis=-1)  # (B, chunks)
    # gather each chunk's winning centroid slice: (chunks, C, dpc)[k, assign]
    recon = jnp.swapaxes(cc, 0, 1)[jnp.arange(n_chunks)[None, :], assign]
    return recon.reshape(b, d)


def train_opq(
    vectors: np.ndarray,
    queries: np.ndarray,
    *,
    n_chunks: int = 64,
    n_centroids: int = 256,
    outer_iters: int = 10,
    adam_iters: int = 100,
    batch_size: int = 4096,
    query_batch_size: int = 2048,
    lr: float = 5e-4,
    seed: int = 0,
    verbose: bool = False,
    pause_point=None,  # chip-handoff safe point (utils/tpu_lease.py)
) -> ProductQuantizer:
    """Query-aware OPQ training (aopq_train.py flow, jitted).

    vectors: (N, D) dataset sample; queries: (Q, D) real query sample.
    """
    import optax

    vectors = np.asarray(vectors, np.float32)
    queries = np.asarray(queries, np.float32)
    n, d = vectors.shape
    assert d % n_chunks == 0
    n_dims_per_code = d // n_chunks

    key = jax.random.PRNGKey(seed)
    k_rot, k_init, key = jax.random.split(key, 3)

    # random orthonormal init via QR (aopq_train.py:62-65)
    h = jax.random.normal(k_rot, (d, d), jnp.float32)
    projection, _ = jnp.linalg.qr(h)

    perm = jax.random.permutation(k_init, n)[:n_centroids]
    x_dev = jnp.asarray(vectors)
    q_dev = jnp.asarray(queries)
    # init codebook from sampled vectors *in the projected space* (the
    # space assignments happen in), so Adam starts from a sane partition
    centroids = jnp.dot(
        x_dev[perm], projection, preferred_element_type=jnp.float32
    )

    opt = optax.adam(lr)

    n_batches = max(1, n // batch_size)
    x_batched = x_dev[: n_batches * batch_size].reshape(
        n_batches, batch_size if n >= batch_size else n, d
    )

    # NB: the corpus/query arrays must be jit ARGUMENTS — a closed-over
    # device array is baked into the program as a constant, and at 100k
    # samples the 460 MB constant blows the remote-compile request limit
    @jax.jit
    def adam_epoch(centroids, opt_state, projection, qkey, x_batched, q_dev):
        qidx = jax.random.randint(
            qkey, (query_batch_size,), 0, q_dev.shape[0]
        )
        qs = q_dev[qidx]

        def loss_fn(cen):
            def batch_loss(carry, xb):
                batch = jnp.dot(
                    xb, projection, preferred_element_type=jnp.float32
                )
                recon = _pq_assign_reconstruct(cen, batch, n_dims_per_code)
                residual = batch - recon
                err = jnp.dot(
                    qs, residual.T, preferred_element_type=jnp.float32
                )
                return carry + jnp.mean(jnp.square(err)), None

            total, _ = jax.lax.scan(batch_loss, 0.0, x_batched)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(centroids)
        updates, opt_state = opt.update(grads, opt_state)
        centroids = optax.apply_updates(centroids, updates)
        return centroids, opt_state, loss

    @jax.jit
    def procrustes(centroids, projection, x_dev):
        # R = V U^T from SVD(X^T Y), Y = per-chunk reconstruction of X
        # (aopq_train.py:79-85)
        y = _pq_assign_reconstruct(
            centroids,
            jnp.dot(x_dev, projection, preferred_element_type=jnp.float32),
            n_dims_per_code,
        )
        xty = jnp.dot(x_dev.T, y, preferred_element_type=jnp.float32)
        u, _s, vt = jnp.linalg.svd(xty)
        # maximise tr(R^T X^T Y) s.t. R orthonormal (our convention is
        # x @ projection, so R = U V^T)
        return jnp.dot(u, vt)

    for outer in range(outer_iters):
        opt_state = opt.init(centroids)
        for _it in range(adam_iters):
            if pause_point is not None and _it % 16 == 0:
                pause_point()
            key, qkey = jax.random.split(key)
            centroids, opt_state, loss = adam_epoch(
                centroids, opt_state, projection, qkey, x_batched, q_dev
            )
        if verbose:
            print(f"opq outer {outer}: loss {float(loss):.5f}")
        projection = procrustes(centroids, projection, x_dev)

    projection = np.asarray(projection)
    return ProductQuantizer(
        centroids=np.asarray(centroids),
        # runtime applies x @ transform.T; training projected with
        # x @ projection, so transform = projection.T
        transform=projection.T.copy(),
        n_dims_per_code=n_dims_per_code,
        n_dims=d,
    )
