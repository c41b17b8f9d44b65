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


@functools.partial(jax.jit, static_argnames=("k",))
def _lloyd_step(x, centroids, k: int):
    """One spherical Lloyd step over top-SPILL_K membership.

    Returns (unnormalised new centroids, combined top-2 counts). Using
    both spill ranks for the update aligns each centroid with the
    population that will actually land in its shard downstream
    (dump_processor.rs:438-461 writes every record to its top-2 shards).
    """
    norm_c = centroids / jnp.maximum(
        jnp.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
    )
    sims = jnp.dot(x, norm_c.T, preferred_element_type=jnp.float32)
    _v, idx = jax.lax.top_k(sims, SPILL_K)  # (N, SPILL_K)
    sums = jnp.zeros((k, x.shape[1]), jnp.float32)
    counts = jnp.zeros((k,), jnp.float32)
    for r in range(SPILL_K):
        sums = sums.at[idx[:, r]].add(x)
        counts = counts.at[idx[:, r]].add(1.0)
    new_c = sums / jnp.maximum(counts, 1.0)[:, None]
    # empty clusters keep their old position instead of collapsing to 0
    new_c = jnp.where(counts[:, None] > 0, new_c, centroids)
    return new_c, counts


def balanced_kmeans(
    vectors: np.ndarray,
    n_clusters: int,
    *,
    max_iter: int = 200,
    seed: int = 0,
    target_frac: float = 0.1,
    verbose: bool = False,
    lloyd_iters: int = 100,
) -> np.ndarray:
    """Data-init spherical Lloyd with split/merge rebalancing, polished
    by the reference's simulated annealing (kmeans.py:96-127).

    Pure annealing from a random init (the reference's approach) stops
    converging at large K: at 420 clusters round 3 measured spill-2
    shard sizes spanning 5.3k-136k against a ~48k ideal (p95/median
    2.6). The Lloyd phase places centroids on the data manifold; each
    iteration the most overfull clusters donate near-copies of their
    centroids to the most underfull ones (an informed version of the
    reference's random reroll, kmeans.py:109-115). The donation scale
    matters: the copy must land INSIDE the donor's cluster
    (|delta| ~ 0.05|c|, i.e. per-dim sigma 0.05|c|/sqrt(d)) — a
    unit-scale perturbation at d=1152 lands in empty space and the new
    centroid starves. Note top-2 spill double-counting: a region served
    by 2 near-tied centroids puts BOTH in every member's top-2, so its
    combined counts only start dropping at >=3 local centroids — the
    split/merge loop keeps donating until that holds. Measured at
    K=420 on the 200k hierarchical sample: p95/median 1.61, max/ideal
    1.78 (vs 4.02/3.37 for anneal-only). The annealing polish then runs
    at small relative step and only the best-seen fitness is returned.
    Returns L2-normalised centroids (n_clusters, D) float32.
    """
    x = jnp.asarray(vectors, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    nrng = np.random.default_rng(seed)

    # --- init from distinct data points (far better than N(0,1) at
    # large K: every centroid starts inside the data's cone) ----------
    init_idx = nrng.choice(n, n_clusters, replace=n < n_clusters)
    centroids = x[jnp.asarray(init_idx)]
    ideal2 = 2.0 * n / n_clusters  # combined top-2 count target

    # --- balance-aware Lloyd with split/merge -------------------------
    settle = max(8, lloyd_iters // 5)  # no splits in the last iters
    for it in range(lloyd_iters):
        centroids, counts = _lloyd_step(x, centroids, n_clusters)
        if it < lloyd_iters - settle:
            c_host = np.array(counts)
            order_over = np.argsort(-c_host)
            order_under = np.argsort(c_host)
            cent_host = None
            for over, under in zip(order_over, order_under):
                if (
                    c_host[over] < 1.25 * ideal2
                    or c_host[under] > 0.6 * ideal2
                ):
                    break
                if cent_host is None:
                    cent_host = np.array(centroids)  # writable copy
                scale = 0.05 * np.linalg.norm(cent_host[over]) / np.sqrt(d)
                cent_host[under] = cent_host[over] + (
                    scale * nrng.standard_normal(d).astype(np.float32)
                )
                c_host[over] *= 0.5  # donor can't donate again this round
            if cent_host is not None:
                centroids = jnp.asarray(cent_host)
        if verbose and it % 10 == 0:
            ch = np.asarray(counts)
            print(
                f"kmeans lloyd {it}: counts p95/med "
                f"{np.percentile(ch, 95) / max(1.0, float(np.median(ch))):.2f}"
            )

    # --- annealing polish (reference semantics; step scaled so a move
    # displaces a centroid by ~temperature x its own norm, not by
    # sqrt(d) x temperature) -------------------------------------------

    desired = n / n_clusters
    med_norm = float(
        jnp.median(jnp.linalg.norm(centroids, axis=1))
    ) / np.sqrt(d)
    temperature = 0.1 * med_norm
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
            # reroll the most-imbalanced centroid (kmeans.py:109-115) —
            # onto a data point, where it can actually win assignments
            centroids = centroids.at[worst].set(x[int(nrng.integers(n))])
            stall = 0
            temperature = min(10 * 0.1 * med_norm, temperature * 1.1)
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
