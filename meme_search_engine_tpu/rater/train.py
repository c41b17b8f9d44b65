"""Bradley-Terry ensemble trainer (meme-rater/train.py parity).

Pairwise BCE on human win probabilities, AdamW 3e-4, each ensemble
member sees its own shuffled order of the same data (train.py:115-127),
JSONL step logging and checkpoints every 50 steps (train.py:96-127).

TPU shape: members train simultaneously — the per-member batch is a
gathered (E, B, 2, D) tensor and one jitted step updates the whole
stacked tree.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.score_model import (
    ScoreModelConfig,
    bradley_terry_prob,
    init_ensemble,
)

CHECKPOINT_EVERY = 50  # train.py:98-102


@dataclasses.dataclass
class TrainSettings:
    lr: float = 3e-4
    batch_size: int = 128
    steps: int = 1000
    dropout: float = 0.1
    seed: int = 0
    log_path: Optional[str] = None
    checkpoint_dir: Optional[str] = None


def _bce(probs, targets):
    eps = 1e-7
    p = jnp.clip(probs, eps, 1 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))


def train(
    pairs: np.ndarray,  # (N, 2, D)
    targets: np.ndarray,  # (N, channels)
    cfg: ScoreModelConfig,
    settings: TrainSettings = TrainSettings(),
    val: Optional[Tuple[np.ndarray, np.ndarray]] = None,
):
    """-> (params, history list of dicts)."""
    n = len(pairs)
    assert n > 0
    key = jax.random.PRNGKey(settings.seed)
    key, k_init = jax.random.split(key)
    params = init_ensemble(k_init, cfg)
    opt = optax.adamw(settings.lr)
    opt_state = opt.init(params)

    pairs_dev = jnp.asarray(pairs, jnp.float32)
    targets_dev = jnp.asarray(targets, jnp.float32)

    # per-member shuffled data orders (train.py:115-120)
    rng = np.random.default_rng(settings.seed)
    orders = np.stack(
        [rng.permutation(n) for _ in range(cfg.n_ensemble)]
    )  # (E, N)

    @jax.jit
    def step(params, opt_state, idx, dkey):
        # idx: (E, B) per-member sample indices
        batch = pairs_dev[idx]  # (E, B, 2, D)
        tgt = targets_dev[idx]  # (E, B, C)

        def loss_fn(p):
            probs = bradley_terry_prob(
                p, batch, dropout_key=dkey, dropout_rate=settings.dropout
            )
            return _bce(probs, tgt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def val_loss_fn(params, vpairs, vtargets):
        probs = bradley_terry_prob(params, vpairs[None].repeat(cfg.n_ensemble, 0))
        return _bce(probs, vtargets[None])

    history = []
    log_f = open(settings.log_path, "a") if settings.log_path else None
    b = min(settings.batch_size, n)
    pos = np.zeros(cfg.n_ensemble, np.int64)

    for it in range(settings.steps):
        idx = np.zeros((cfg.n_ensemble, b), np.int64)
        for e in range(cfg.n_ensemble):
            if pos[e] + b > n:
                orders[e] = rng.permutation(n)
                pos[e] = 0
            idx[e] = orders[e][pos[e] : pos[e] + b]
            pos[e] += b
        key, dkey = jax.random.split(key)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(idx), dkey
        )

        entry = {"step": it, "loss": float(loss), "time": time.time()}
        if val is not None and it % CHECKPOINT_EVERY == 0 and len(val[0]):
            entry["val_loss"] = float(
                val_loss_fn(
                    params,
                    jnp.asarray(val[0], jnp.float32),
                    jnp.asarray(val[1], jnp.float32),
                )
            )
        history.append(entry)
        if log_f:
            log_f.write(json.dumps(entry) + "\n")
        if (
            settings.checkpoint_dir
            and it % CHECKPOINT_EVERY == 0
        ):
            save_checkpoint(
                os.path.join(settings.checkpoint_dir, f"ckpt_{it}"),
                params,
                opt_state,
            )
    if log_f:
        log_f.close()
    return params, history


def save_checkpoint(path: str, params, opt_state):
    """Orbax-free minimal checkpoint (params + optimizer state,
    train.py:98-102 keeps both for resume)."""
    os.makedirs(path, exist_ok=True)
    flat, treedef = jax.tree.flatten((params, opt_state))
    np.savez(
        os.path.join(path, "state.npz"),
        *[np.asarray(x) for x in flat],
    )
    with open(os.path.join(path, "treedef.txt"), "w") as f:
        f.write(str(treedef))


def load_checkpoint(path: str, params_like, opt_state_like):
    flat_like, treedef = jax.tree.flatten((params_like, opt_state_like))
    data = np.load(os.path.join(path, "state.npz"))
    flat = [data[k] for k in data.files]
    assert len(flat) == len(flat_like)
    return jax.tree.unflatten(treedef, flat)
