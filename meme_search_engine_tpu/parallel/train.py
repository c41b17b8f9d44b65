"""Sharded SigLIP training step (dp x tp over a Mesh).

The reference consumes pretrained SigLIP weights and never trains the
tower; this exists so the framework's multi-chip path is exercised end
to end (and to support fine-tuning deployments): parameters are laid out
per :mod:`mesh` tensor-parallel specs, the batch is sharded over the
``data`` axis, and XLA inserts the psum/all-gather collectives over ICI.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import siglip
from .mesh import DATA, shard_params

__all__ = ["make_train_state", "make_train_step"]


def make_train_state(
    key: jax.Array,
    cfg: siglip.SigLIPConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
):
    """(sharded params, optimizer, sharded opt state)."""
    optimizer = optax.adamw(learning_rate)
    params = siglip.init_params(key, cfg)
    params = shard_params(params, mesh)
    # optax state mirrors the param tree; zeros_like inherits shardings
    opt_state = jax.jit(optimizer.init)(params)
    return params, optimizer, opt_state


def make_train_step(cfg: siglip.SigLIPConfig, mesh: Mesh, optimizer):
    """Jitted (params, opt_state, images, tokens) -> (params, opt_state, loss).

    images: (B, R, R, 3) float in [-1, 1], sharded (data, ...);
    tokens: (B, L) int32, sharded (data, ...).
    """
    batch_sharding = NamedSharding(mesh, P(DATA))

    @jax.jit
    def train_step(params, opt_state, images, tokens):
        images = jax.lax.with_sharding_constraint(images, batch_sharding)
        tokens = jax.lax.with_sharding_constraint(tokens, batch_sharding)
        loss, grads = jax.value_and_grad(siglip.siglip_loss)(
            params, images, tokens, cfg
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    return train_step
