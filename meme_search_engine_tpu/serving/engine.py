"""Device-side embedding engine: bucketed static-shape inference.

XLA traces one program per input shape, so dynamic request batches are
decomposed into descending power-of-two buckets — at most
log2(max_batch)+1 compiled programs per modality, never a recompile at
serve time. This generalises the reference's two approaches: per-batch-
size AITemplate ``.so`` selection (clip_server.py:105-112) and the JAX
``minimize_jits`` pow2 splitter (misc/clip_accursed.py:77-91).

The engine owns the single device stream: callers (asyncio handlers,
ingest pipelines) submit numpy batches; the engine returns L2-normalised
fp32 numpy embeddings.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import siglip
from .tokenizer import load_tokenizer

__all__ = ["EmbeddingEngine", "pow2_buckets"]


def pow2_buckets(n: int, max_batch: int) -> List[int]:
    """Greedy descending power-of-two decomposition of n (≤ max_batch each)."""
    out = []
    while n > 0:
        b = 1 << (n.bit_length() - 1)
        b = min(b, 1 << (max_batch.bit_length() - 1))
        out.append(b)
        n -= b
    return out


class EmbeddingEngine:
    """Batched SigLIP inference with shape bucketing.

    Args:
      params: SigLIP parameter tree (random or checkpoint-loaded).
      cfg: model config.
      max_batch: largest single device batch (clip_server_config.json: 128).
      tokenizer_path: optional HF tokenizer.json (see tokenizer.py).
    """

    def __init__(
        self,
        params,
        cfg: siglip.SigLIPConfig = siglip.SO400M_14_384,
        max_batch: int = 128,
        tokenizer_path: Optional[str] = None,
        mesh=None,
        model_parallel: bool = False,
    ):
        """``mesh``: optional jax Mesh for multi-chip serving — request
        batches shard over the ``data`` axis (SURVEY SS2.10 P1/P7: the
        reference scales with GPU replicas behind a load balancer; a pod
        is one engine with dp over ICI). ``model_parallel`` additionally
        applies the Megatron tp layout from parallel.mesh to the params.
        """
        self.cfg = cfg
        self.max_batch = max_batch
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import shard_params

            if model_parallel:
                params = shard_params(params, mesh)
            else:
                params = jax.device_put(
                    params, NamedSharding(mesh, P())
                )
            self._batch_sharding = NamedSharding(mesh, P("data"))
        else:
            self._batch_sharding = None
        self.params = params
        self.tokenizer = load_tokenizer(
            tokenizer_path, cfg.vocab_size, cfg.text_len
        )

        @functools.partial(jax.jit, static_argnames=("pre",))
        def _img_fn(p, images, pre):
            return siglip.encode_image(p, images, cfg, preprocessed=pre)

        @jax.jit
        def _txt_fn(p, tokens):
            return siglip.encode_text(p, tokens, cfg)

        self._img_fn = _img_fn
        self._txt_fn = _txt_fn

    # -- warmup -------------------------------------------------------------

    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Pre-compile all batch buckets so first requests aren't slow."""
        r = self.cfg.image_size
        if buckets is None:
            buckets = [
                1 << i for i in range((self.max_batch).bit_length())
                if (1 << i) <= self.max_batch
            ]
        for b in buckets:
            img = jnp.zeros((b, r, r, 3), jnp.uint8)
            self._img_fn(self.params, img, False).block_until_ready()
            tok = jnp.full((b, self.cfg.text_len), 1, jnp.int32)
            self._txt_fn(self.params, tok).block_until_ready()

    # -- inference ----------------------------------------------------------

    def _put(self, chunk: np.ndarray):
        if self._batch_sharding is not None and (
            chunk.shape[0] % self.mesh.shape["data"] == 0
        ):
            return jax.device_put(chunk, self._batch_sharding)
        return jnp.asarray(chunk)

    def _run_bucketed(self, fn, batch: np.ndarray) -> np.ndarray:
        n = batch.shape[0]
        out = np.empty((n, self.cfg.d_emb), dtype=np.float32)
        i = 0
        futures = []
        for b in pow2_buckets(n, self.max_batch):
            chunk = batch[i : i + b]
            futures.append((i, b, fn(self._put(chunk))))
            i += b
        for i, b, dev in futures:
            out[i : i + b] = np.asarray(dev)
        return out

    def embed_image_arrays(self, images: np.ndarray) -> np.ndarray:
        """uint8 (N,H,W,3) -> (N, d_emb) fp32 unit-norm embeddings.

        If H,W differ from the model resolution the resize happens in-graph.
        """
        pre = images.dtype != np.uint8
        return self._run_bucketed(
            lambda x: self._img_fn(self.params, x, pre), images
        )

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        tokens = self.tokenizer(list(texts))
        return self._run_bucketed(
            lambda x: self._txt_fn(self.params, x), tokens
        )

    def embed_tokens(self, tokens: np.ndarray) -> np.ndarray:
        return self._run_bucketed(
            lambda x: self._txt_fn(self.params, x), tokens.astype(np.int32)
        )
