"""Sharded training-state checkpointing (orbax).

The reference checkpoints every 50 steps with optimizer state
(meme-rater/train.py:98-102); for the sharded SigLIP fine-tuning path
the TPU-native equivalent is orbax: per-shard async-capable saves that
restore onto any mesh with matching logical shapes.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple


def save_train_state(path: str, params: Any, opt_state: Any, step: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(path, f"step_{step}"),
            {"params": params, "opt_state": opt_state},
        )


def restore_train_state(
    path: str, params_like: Any, opt_state_like: Any, step: Optional[int] = None
) -> Tuple[Any, Any, int]:
    """Restore (params, opt_state, step); latest step if not given.

    ``*_like`` trees supply shapes/dtypes/shardings (e.g. from
    make_train_state on the target mesh).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        steps = [
            int(d.split("_")[1])
            for d in os.listdir(path)
            if d.startswith("step_")
        ]
        step = max(steps)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.join(path, f"step_{step}"),
            {"params": params_like, "opt_state": opt_state_like},
        )
    return restored["params"], restored["opt_state"], step
