"""Balanced spherical k-means for shard centroid selection.

Capability parity with kmeans.py: clusters embedding samples into
n_clusters shards such that top-SPILL_K (=2) assignment counts stay
near the ideal size — records spill into their top-2 shards downstream
(dump_processor.rs:438-461), so balance is measured over both ranks
(kmeans.py:72-127 simulated annealing fitness). Emits fp16
``centroids.bin`` (kmeans.py:10,150-153 artifact).

TPU shape: every fitness evaluation is one jitted pass — (N, D) x
(D, K) MXU matmul, top-2, one-hot count (segment-sum) — so annealing
steps are O(matmul) with no host round-trips inside the loop.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["balanced_kmeans", "assign_top_k", "SPILL_K"]

SPILL_K = 2  # kmeans.py:72


@functools.partial(jax.jit, static_argnames=("spill_k",))
def assign_top_k(vectors, centroids, spill_k: int = SPILL_K):
    """(N, D), (K, D) -> (N, spill_k) top-similarity centroid ids."""
    norm_c = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
    )
    sims = jnp.dot(vectors, norm_c.T, preferred_element_type=jnp.float32)
    _vals, idx = jax.lax.top_k(sims, spill_k)
    return idx


@functools.partial(jax.jit, static_argnames=("k", "spill_k"))
def _fitness(vectors, centroids, k: int, spill_k: int):
    """max |cluster size - ideal| over both assignment ranks, plus the
    argmax (worst) centroid (kmeans.py:76-95)."""
    idx = assign_top_k(vectors, centroids, spill_k)
    n = vectors.shape[0]
    ideal = n / k
    onehot = jax.nn.one_hot(idx, k, dtype=jnp.float32)  # (N, spill, K)
    sizes = onehot.sum(axis=0)  # (spill, K)
    dist = jnp.abs(sizes - ideal)
    return dist.max(), dist.max(axis=0).argmax()


def balanced_kmeans(
    vectors: np.ndarray,
    n_clusters: int,
    *,
    max_iter: int = 200,
    seed: int = 0,
    target_frac: float = 0.1,
    verbose: bool = False,
) -> np.ndarray:
    """Simulated annealing over centroid perturbations (kmeans.py:96-127).

    Returns L2-normalised centroids (n_clusters, D) float32.
    """
    x = jnp.asarray(vectors, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    centroids = jax.random.normal(k0, (n_clusters, d), jnp.float32)

    desired = n / n_clusters
    temperature = 1.0
    last_fit, _ = _fitness(x, centroids, n_clusters, SPILL_K)
    last_fit = float(last_fit)
    best, best_fit = centroids, last_fit
    stall = 0

    for it in range(max_iter):
        key, kp = jax.random.split(key)
        cand = centroids + jax.random.normal(kp, centroids.shape) * temperature
        fit, worst = _fitness(x, cand, n_clusters, SPILL_K)
        fit = float(fit)
        if fit < last_fit:
            centroids, last_fit = cand, fit
            temperature *= 0.999
            stall = 0
        else:
            temperature *= 0.9995
            stall += 1
        if stall > 100:
            # reroll the most-imbalanced centroid (kmeans.py:109-115)
            key, kr = jax.random.split(key)
            centroids = centroids.at[worst].set(
                jax.random.normal(kr, (d,), jnp.float32)
            )
            stall = 0
            temperature = min(1.5, temperature * 1.1)
            last_fit = fit
        if fit < best_fit:
            best, best_fit = cand, fit
        if verbose and it % 20 == 0:
            print(f"kmeans iter {it}: fitness {last_fit:.1f} T={temperature:.3f}")
        if last_fit < desired * target_frac:
            break

    out = best / jnp.maximum(jnp.linalg.norm(best, axis=1, keepdims=True), 1e-30)
    return np.asarray(out, np.float32)


def save_centroids(centroids: np.ndarray, path: str):
    """fp16 centroids.bin artifact (kmeans.py:150-153)."""
    np.asarray(centroids, np.float16).tofile(path)


def load_centroids(path: str, n_dims: int) -> np.ndarray:
    return np.fromfile(path, dtype=np.float16).reshape(-1, n_dims).astype(
        np.float32
    )
