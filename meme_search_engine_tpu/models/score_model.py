"""Quality (meme-rater) model: Bradley-Terry ensemble + wide serving form.

Capability parity with meme-rater/model.py and src/score_model.rs:
- Ensemble of n_ensemble MLPs (n_hidden x [dropout -> Linear d->d ->
  SiLU] -> Linear d->output_channels), trained pairwise: win probability
  sigmoid(score1 - score2) (model.py:18-52).
- Wide export for serving: member hidden layers concatenate into one
  (E*d, d) up_proj and a (channels, E*d) down_proj; the ensemble mean
  becomes scale * down_proj @ silu(up_proj @ x + bias) with
  scale = d_emb / d_hidden = 1/E (ensemble_to_wide_model.py:39-68,
  score_model.rs:13-32). Output biases are zeroed first — Bradley-Terry
  scores are shift-invariant (ensemble_to_wide_model.py:36-37,52).

TPU shape: the ensemble dimension is a vmap axis over stacked params —
one batched MXU matmul per layer for all members at once, instead of a
ModuleList loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ScoreModelConfig:
    d_emb: int = 1152
    n_hidden: int = 1
    n_ensemble: int = 16
    output_channels: int = 3
    dropout: float = 0.1


def init_ensemble(key: jax.Array, cfg: ScoreModelConfig) -> Params:
    """Stacked parameter tree: leading axis = ensemble member."""

    def init_member(k):
        ks = jax.random.split(k, cfg.n_hidden + 1)
        scale = (1.0 / cfg.d_emb) ** 0.5
        hidden = [
            {
                "w": jax.random.normal(ks[i], (cfg.d_emb, cfg.d_emb)) * scale,
                "b": jnp.zeros((cfg.d_emb,)),
            }
            for i in range(cfg.n_hidden)
        ]
        out = {
            "w": jax.random.normal(ks[-1], (cfg.d_emb, cfg.output_channels))
            * scale,
            "b": jnp.zeros((cfg.output_channels,)),
        }
        return {"hidden": hidden, "output": out}

    members = [init_member(k) for k in jax.random.split(key, cfg.n_ensemble)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *members)


def _member_forward(params, x, dropout_key=None, dropout_rate=0.0):
    for layer in params["hidden"]:
        if dropout_key is not None and dropout_rate > 0:
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1 - dropout_rate, x.shape)
            x = jnp.where(keep, x / (1 - dropout_rate), 0)
        x = jax.nn.silu(
            jnp.dot(x, layer["w"], preferred_element_type=jnp.float32)
            + layer["b"]
        )
    return (
        jnp.dot(x, params["output"]["w"], preferred_element_type=jnp.float32)
        + params["output"]["b"]
    )


def ensemble_forward(
    params: Params,
    x: jax.Array,
    *,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """x: (E, B, D) per-member batches or (B, D) broadcast.
    -> (E, B, channels)."""
    cfg_e = jax.tree.leaves(params)[0].shape[0]
    if x.ndim == 2:
        x = jnp.broadcast_to(x[None], (cfg_e, *x.shape))
    keys = (
        jax.random.split(dropout_key, cfg_e)
        if dropout_key is not None
        else None
    )
    if keys is None:
        return jax.vmap(lambda p, xx: _member_forward(p, xx))(params, x)
    return jax.vmap(
        lambda p, xx, k: _member_forward(p, xx, k, dropout_rate)
    )(params, x, keys)


def bradley_terry_prob(
    params: Params,
    pairs: jax.Array,
    *,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """pairs: (E, B, 2, D) -> win probabilities (E, B, channels)
    (model.py:40-52)."""
    s1 = ensemble_forward(
        params, pairs[:, :, 0], dropout_key=dropout_key, dropout_rate=dropout_rate
    )
    key2 = (
        jax.random.fold_in(dropout_key, 1) if dropout_key is not None else None
    )
    s2 = ensemble_forward(
        params, pairs[:, :, 1], dropout_key=key2, dropout_rate=dropout_rate
    )
    return jax.nn.sigmoid(s1 - s2)


# ---------------------------------------------------------------------------
# Wide serving model
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WideScoreModel:
    """Serving form (score_model.rs:4-32): one fused up/down projection."""

    up_proj: np.ndarray  # (E*d, d)
    bias: np.ndarray  # (E*d,)
    down_proj: np.ndarray  # (channels, E*d)

    @property
    def d_emb(self) -> int:
        return self.up_proj.shape[1]

    @property
    def scale(self) -> float:
        return self.d_emb / self.up_proj.shape[0]

    def score_batch(self, x: np.ndarray) -> np.ndarray:
        """(B, d) -> (B, channels): scale * down(silu(up @ x + bias))."""
        return np.asarray(
            _wide_forward(
                jnp.asarray(x, jnp.float32),
                jnp.asarray(self.up_proj),
                jnp.asarray(self.bias),
                jnp.asarray(self.down_proj),
                self.scale,
            )
        )

    def save_safetensors(self, path: str):
        from safetensors.numpy import save_file

        save_file(
            {
                "up_proj": self.up_proj.astype(np.float32),
                "bias": self.bias.astype(np.float32),
                "down_proj": self.down_proj.astype(np.float32),
            },
            path,
        )

    @classmethod
    def load_safetensors(cls, path: str) -> "WideScoreModel":
        from safetensors.numpy import load_file

        t = load_file(path)
        return cls(
            up_proj=t["up_proj"], bias=t["bias"], down_proj=t["down_proj"]
        )


@jax.jit
def _wide_forward(x, up, bias, down, scale):
    h = jax.nn.silu(
        jnp.dot(x, up.T, preferred_element_type=jnp.float32) + bias
    )
    return scale * jnp.dot(h, down.T, preferred_element_type=jnp.float32)


def export_wide(params: Params, cfg: ScoreModelConfig) -> WideScoreModel:
    """Ensemble -> wide model, with the reference's self-check: wide
    output must equal the ensemble mean (output biases zeroed) within
    1e-4 (ensemble_to_wide_model.py:57-68)."""
    assert cfg.n_hidden == 1, "wide export defined for one hidden layer"
    e = cfg.n_ensemble
    d = cfg.d_emb

    hidden = params["hidden"][0]
    up = np.asarray(hidden["w"]).transpose(0, 2, 1).reshape(e * d, d)
    bias = np.asarray(hidden["b"]).reshape(e * d)
    # down_proj[:, i*d:(i+1)*d] = member i output weights
    down_wide = np.zeros((cfg.output_channels, e * d), np.float32)
    wout = np.asarray(params["output"]["w"])  # (E, d, channels)
    for i in range(e):
        down_wide[:, i * d : (i + 1) * d] = wout[i].T

    wide = WideScoreModel(
        up_proj=up.astype(np.float32),
        bias=bias.astype(np.float32),
        down_proj=down_wide,
    )

    # golden self-check
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, d)).astype(np.float32)
    zeroed = dict(params)
    zeroed["output"] = {
        "w": params["output"]["w"],
        "b": jnp.zeros_like(params["output"]["b"]),
    }
    truth = np.asarray(ensemble_forward(zeroed, jnp.asarray(x))).mean(axis=0)
    got = wide.score_batch(x)
    err = np.abs(got - truth).mean()
    assert err < 1e-4, f"wide export self-check failed: {err}"
    return wide
