"""Device mesh construction and SigLIP sharding rules.

The reference scales horizontally with stateless GPU replicas behind a
load balancer (README.md:71) and has no intra-job collectives. The TPU
equivalent is a 2-D ``Mesh``:

- ``data``  — batch / corpus-row dimension. Embedding serving is pure
  data parallelism over ICI (SURVEY SS2.10 P1/P7); search shards corpus
  rows (SS2.10 P8 / SS5 long-context note).
- ``model`` — tensor parallelism inside the tower: attention heads and
  MLP hidden dim are split, with XLA inserting all-reduces on the block
  outputs (standard Megatron-style sharding expressed via NamedSharding,
  not hand-written collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "siglip_param_specs", "shard_params", "DATA", "MODEL"]

DATA, MODEL = "data", "model"


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """(data x model) mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA, MODEL))


def _block_specs() -> dict:
    """PartitionSpecs for one stacked encoder block (leading axis = depth).

    Megatron pattern: qkv/fc1 split output dim, o/fc2 split input dim.
    """
    col = P(None, None, MODEL)  # (depth, d_in, d_out sharded)
    row = P(None, MODEL, None)  # (depth, d_in sharded, d_out)
    rep = P()
    return {
        "ln1": {"g": rep, "b": rep},
        "attn": {
            "q": {"w": col, "b": P(None, MODEL)},
            "k": {"w": col, "b": P(None, MODEL)},
            "v": {"w": col, "b": P(None, MODEL)},
            "o": {"w": row, "b": rep},
        },
        "ln2": {"g": rep, "b": rep},
        "mlp": {
            "fc1": {"w": col, "b": P(None, MODEL)},
            "fc2": {"w": row, "b": rep},
        },
    }


def siglip_param_specs() -> dict:
    """PartitionSpec tree matching models.siglip.init_params output."""
    rep = P()
    return {
        "img": {
            "patch_embed": {"w": P(None, MODEL), "b": P(MODEL)},
            "pos_emb": rep,
            "blocks": _block_specs(),
            "ln_final": {"g": rep, "b": rep},
            "map_head": {
                "probe": rep,
                "q": {"w": P(None, MODEL), "b": P(MODEL)},
                "k": {"w": P(None, MODEL), "b": P(MODEL)},
                "v": {"w": P(None, MODEL), "b": P(MODEL)},
                "o": {"w": P(MODEL, None), "b": rep},
                "ln": {"g": rep, "b": rep},
                "mlp": {
                    "fc1": {"w": P(None, MODEL), "b": P(MODEL)},
                    "fc2": {"w": P(MODEL, None), "b": rep},
                },
            },
        },
        "txt": {
            "token_emb": P(None, MODEL),  # vocab-major table, width sharded
            "pos_emb": rep,
            "blocks": _block_specs(),
            "ln_final": {"g": rep, "b": rep},
            "head": {"w": P(None, MODEL), "b": P(MODEL)},
        },
        "t": rep,
        "b": rep,
    }


def shard_params(params, mesh: Mesh):
    """Place a parameter tree onto the mesh per siglip_param_specs."""
    specs = siglip_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
