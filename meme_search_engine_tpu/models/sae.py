"""Top-k sparse autoencoder over embeddings (interpretability).

Capability parity with sae/model.py: tied-init up/down projections,
ReLU then keep only the top-k activations per sample (k=128 over
d_hidden=262144 at reference scale), strict-greater thresholding so ties
at the boundary drop out (sae/model.py:31-43), plus per-feature
activation counters. ``jax.lax.top_k`` gives the threshold directly —
the natural TPU form of torch.kthvalue.

Trainer parity with sae/train.py: MSE reconstruction, AdamW; the
activation counters support dead-feature tracking.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class SAEConfig:
    d_emb: int = 1152
    d_hidden: int = 262144
    top_k: int = 128
    up_proj_bias: bool = False


def init_sae(key: jax.Array, cfg: SAEConfig) -> Dict:
    k1, _ = jax.random.split(key)
    scale = (1.0 / cfg.d_emb) ** 0.5
    up = jax.random.normal(k1, (cfg.d_emb, cfg.d_hidden), jnp.float32) * scale
    params = {
        "up_w": up,
        "down_w": up.T.copy(),  # tied init (sae/model.py:22)
        "down_b": jnp.zeros((cfg.d_emb,)),
    }
    if cfg.up_proj_bias:
        params["up_b"] = jnp.zeros((cfg.d_hidden,))
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def sae_forward(
    params: Dict, embs: jax.Array, cfg: SAEConfig
) -> Tuple[jax.Array, jax.Array]:
    """-> (reconstruction (B, d_emb), activation counts (d_hidden,) i32).

    Top-k with strict-greater masking: the threshold is the k-th largest
    post-ReLU value; only values strictly above it survive, so ReLU ties
    at zero never activate (sae/model.py:34-41 semantics).
    """
    x = jnp.dot(embs, params["up_w"], preferred_element_type=jnp.float32)
    if "up_b" in params:
        x = x + params["up_b"]
    x = jax.nn.relu(x)
    kth = jax.lax.top_k(x, cfg.top_k + 1)[0][:, -1]  # (B,) k-th+1 largest
    mask = x > kth[:, None]
    x = jnp.where(mask, x, 0.0)
    counts = mask.sum(axis=0).astype(jnp.int32)
    recon = (
        jnp.dot(x, params["down_w"], preferred_element_type=jnp.float32)
        + params["down_b"]
    )
    return recon, counts


def make_sae_train_step(cfg: SAEConfig, optimizer):
    @jax.jit
    def step(params, opt_state, batch, counters):
        def loss_fn(p):
            recon, counts = sae_forward(p, batch, cfg)
            return jnp.mean(jnp.square(recon - batch)), counts

        (loss, counts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, counters + counts

    return step


def train_sae(
    embeddings: np.ndarray,
    cfg: SAEConfig,
    *,
    steps: int = 1000,
    batch_size: int = 1024,
    lr: float = 1e-4,
    seed: int = 0,
    verbose: bool = False,
):
    """-> (params, feature activation counters). MSE + AdamW
    (sae/train.py flow)."""
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = init_sae(k_init, cfg)
    opt = optax.adamw(lr)
    opt_state = opt.init(params)
    step = make_sae_train_step(cfg, opt)
    counters = jnp.zeros((cfg.d_hidden,), jnp.int32)

    x = jnp.asarray(embeddings, jnp.float32)
    n = len(x)
    rng = np.random.default_rng(seed)
    for it in range(steps):
        idx = rng.integers(0, n, min(batch_size, n))
        params, opt_state, loss, counters = step(
            params, opt_state, x[jnp.asarray(idx)], counters
        )
        if verbose and it % 100 == 0:
            print(f"sae step {it}: loss {float(loss):.6f}")
    return params, np.asarray(counters)


def decoder_features(params) -> np.ndarray:
    """Decoder rows for feature-exemplar export (sae/export_features.py
    queries these against the live search backend)."""
    return np.asarray(params["down_w"])
