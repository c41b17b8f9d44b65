"""Active-learning pair selection for the rating queue.

Parity with meme-rater/active_learning.py (ensemble-variance selection,
:44-57), active_learning_gradients.py (per-sample gradient norms via
vmapped grad, :44-72) and active_learning_find_top.py (top-percentile
random pairs). Selected pairs feed the labelling queue
(copy_into_queue.py semantics -> RatingsDB.push_queue).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.score_model import ensemble_forward

__all__ = [
    "ensemble_variance",
    "select_pairs_by_variance",
    "gradient_norms",
    "select_top_percentile_pairs",
]


def ensemble_variance(params, embeddings: np.ndarray) -> np.ndarray:
    """Per-item variance of ensemble scores, summed over channels —
    high variance = most informative to label."""
    out = ensemble_forward(params, jnp.asarray(embeddings, jnp.float32))
    return np.asarray(jnp.var(out, axis=0).sum(axis=-1))


def select_pairs_by_variance(
    params,
    embeddings: np.ndarray,
    n_pairs: int,
    *,
    seed: int = 0,
) -> List[Tuple[int, int]]:
    """Pair up the highest-variance items (active_learning.py:44-57:
    candidate pairs ranked by ensemble disagreement on the pair
    difference)."""
    rng = np.random.default_rng(seed)
    n = len(embeddings)
    n_cand = min(n * 4, 4096)
    cand = rng.integers(0, n, (n_cand, 2))
    cand = cand[cand[:, 0] != cand[:, 1]]
    out = ensemble_forward(
        params, jnp.asarray(embeddings, jnp.float32)
    )  # (E, N, C)
    diff = np.asarray(out)[:, cand[:, 0]] - np.asarray(out)[:, cand[:, 1]]
    probs = 1 / (1 + np.exp(-diff))  # (E, P, C)
    var = probs.var(axis=0).sum(axis=-1)
    order = np.argsort(-var)[:n_pairs]
    return [tuple(map(int, cand[i])) for i in order]


def gradient_norms(params, pairs: np.ndarray, targets: np.ndarray) -> np.ndarray:
    """Per-pair gradient norm of the BT loss (vmapped grad over samples,
    the JAX-native form of torch.func vmap/grad in
    active_learning_gradients.py:44-72)."""

    def single_loss(p, pair, tgt):
        probs = jax.nn.sigmoid(
            ensemble_forward(p, pair[None, 0][None].repeat(_e(p), 0))
            - ensemble_forward(p, pair[None, 1][None].repeat(_e(p), 0))
        )
        eps = 1e-7
        probs = jnp.clip(probs.mean(axis=0), eps, 1 - eps)
        return -jnp.mean(
            tgt * jnp.log(probs) + (1 - tgt) * jnp.log(1 - probs)
        )

    def _e(p):
        return jax.tree.leaves(p)[0].shape[0]

    grad_fn = jax.vmap(
        jax.grad(single_loss), in_axes=(None, 0, 0)
    )
    grads = grad_fn(
        params,
        jnp.asarray(pairs, jnp.float32),
        jnp.asarray(targets, jnp.float32),
    )
    sq = jax.tree.map(
        lambda g: jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1), grads
    )
    total = jax.tree.reduce(lambda a, b: a + b, sq)
    return np.asarray(jnp.sqrt(total))


def select_top_percentile_pairs(
    scores: np.ndarray,
    n_pairs: int,
    percentile: float = 90.0,
    seed: int = 0,
) -> List[Tuple[int, int]]:
    """Random pairs among top-percentile items
    (active_learning_find_top.py)."""
    rng = np.random.default_rng(seed)
    threshold = np.percentile(scores, percentile)
    top = np.flatnonzero(scores >= threshold)
    if len(top) < 2:
        return []
    pairs = []
    for _ in range(n_pairs):
        i, j = rng.choice(top, 2, replace=False)
        pairs.append((int(i), int(j)))
    return pairs
