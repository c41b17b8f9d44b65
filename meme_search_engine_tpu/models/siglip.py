"""SigLIP two-tower encoder, TPU-first.

Capabilities match the reference embedding service's model —
ViT-SO400M/14 @ 384 with MAP-head pooling plus a 27-layer text tower,
d_emb=1152, fp16 wire outputs (reference: clip_server.py:23-25,
aitemplate/run.py:47-55 for the exact dims, misc/clip_accursed.py:31-43
for the big_vision config) — but the implementation is built for XLA:

- Patch embedding is a reshape + single MXU matmul (stride == kernel, so
  the conv is exactly a blocked projection; no conv op needed).
- All 27 encoder blocks run under one ``lax.scan`` over stacked block
  params: one compiled block, 27 iterations — fast compiles, and the
  block weights stream HBM->VMEM while the MXU works.
- bf16 params/activations on the MXU, fp32 LayerNorm/softmax on the VPU.
- Preprocessing (uint8 -> resize -> value_range(-1,1)) is traced into the
  same XLA program, so a batch of raw images is a single device program
  (the reference does PIL resize on a single Python thread,
  clip_server.py:131-146, and notes it as a bottleneck).

Weight compatibility: parameter names are our own; ``load_hf_siglip``
maps checkpoints from the HuggingFace layout
(google/siglip-so400m-patch14-384) onto this tree
(pattern: aitemplate/run.py:86-113's remapping table).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (
    fat_layout_ok,
    fat_vit_mha_packed,
    fat_width,
    fused_mha_pallas,
    mha,
)
from ..ops.fused import ln_matmul, ln_mlp_residual, matmul_residual

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    image_size: int = 384
    patch_size: int = 14
    width: int = 1152
    depth: int = 27
    mlp_dim: int = 4304
    num_heads: int = 16
    # text tower (So400m text variant: same trunk dims, seq 64, vocab 32k;
    # misc/clip_accursed.py:32-34)
    text_width: int = 1152
    text_depth: int = 27
    text_mlp_dim: int = 4304
    text_num_heads: int = 16
    vocab_size: int = 32_000
    text_len: int = 64
    d_emb: int = 1152
    param_dtype: Any = jnp.bfloat16
    # image-tower attention implementation: "auto" picks the fat-layout
    # Pallas kernel on TPU (ops/attention.py) and XLA elsewhere;
    # "xla" forces the XLA path; "fat_interpret" forces the fat path in
    # Pallas interpreter mode (CPU tests).
    attn_impl: str = "auto"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2  # 729

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads  # 72


SO400M_14_384 = SigLIPConfig()


def tiny_test_config() -> SigLIPConfig:
    """A miniature config for unit tests / CPU mesh dry runs."""
    return SigLIPConfig(
        image_size=28,
        patch_size=14,
        width=64,
        depth=2,
        mlp_dim=128,
        num_heads=4,
        text_width=64,
        text_depth=2,
        text_mlp_dim=128,
        text_num_heads=4,
        vocab_size=128,
        text_len=16,
        d_emb=64,
    )


def tiny_fat_test_config(attn_impl: str = "fat_interpret") -> SigLIPConfig:
    """Miniature config that satisfies the fat-kernel layout rules
    (16 heads x fat_width(7)=8 -> 128 lanes), for CPU interpret tests."""
    return SigLIPConfig(
        image_size=28,
        patch_size=14,
        width=112,
        depth=2,
        mlp_dim=128,
        num_heads=16,
        text_width=64,
        text_depth=2,
        text_mlp_dim=128,
        text_num_heads=4,
        vocab_size=128,
        text_len=16,
        d_emb=64,
        attn_impl=attn_impl,
    )


# ---------------------------------------------------------------------------
# Parameter initialisation
# ---------------------------------------------------------------------------


def _dense_init(key, d_in, d_out, dtype):
    kw, _ = jax.random.split(key)
    scale = (1.0 / d_in) ** 0.5
    return {
        "w": (jax.random.normal(kw, (d_in, d_out), jnp.float32) * scale).astype(dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def _ln_init(dim, dtype):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def _block_init(key, width, mlp_dim, dtype):
    ks = jax.random.split(key, 6)
    return {
        "ln1": _ln_init(width, dtype),
        "attn": {
            "q": _dense_init(ks[0], width, width, dtype),
            "k": _dense_init(ks[1], width, width, dtype),
            "v": _dense_init(ks[2], width, width, dtype),
            "o": _dense_init(ks[3], width, width, dtype),
        },
        "ln2": _ln_init(width, dtype),
        "mlp": {
            "fc1": _dense_init(ks[4], width, mlp_dim, dtype),
            "fc2": _dense_init(ks[5], mlp_dim, width, dtype),
        },
    }


def _stack_blocks(key, depth, width, mlp_dim, dtype):
    keys = jax.random.split(key, depth)
    blocks = [_block_init(k, width, mlp_dim, dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(key: jax.Array, cfg: SigLIPConfig = SO400M_14_384) -> Params:
    """Random-init the full two-tower parameter tree."""
    dt = cfg.param_dtype
    k_img, k_txt = jax.random.split(key)
    ki = jax.random.split(k_img, 8)
    kt = jax.random.split(k_txt, 6)

    patch_dim = cfg.patch_size * cfg.patch_size * 3
    img = {
        "patch_embed": _dense_init(ki[0], patch_dim, cfg.width, dt),
        "pos_emb": (
            jax.random.normal(ki[1], (cfg.num_patches, cfg.width), jnp.float32)
            * 0.02
        ).astype(dt),
        "blocks": _stack_blocks(ki[2], cfg.depth, cfg.width, cfg.mlp_dim, dt),
        "ln_final": _ln_init(cfg.width, dt),
        "map_head": {
            "probe": (
                jax.random.normal(ki[3], (1, cfg.width), jnp.float32) * 0.02
            ).astype(dt),
            "q": _dense_init(ki[4], cfg.width, cfg.width, dt),
            "k": _dense_init(ki[5], cfg.width, cfg.width, dt),
            "v": _dense_init(ki[6], cfg.width, cfg.width, dt),
            "o": _dense_init(ki[7], cfg.width, cfg.width, dt),
            "ln": _ln_init(cfg.width, dt),
            "mlp": {
                "fc1": _dense_init(ki[4], cfg.width, cfg.mlp_dim, dt),
                "fc2": _dense_init(ki[5], cfg.mlp_dim, cfg.width, dt),
            },
        },
    }
    txt = {
        "token_emb": (
            jax.random.normal(kt[0], (cfg.vocab_size, cfg.text_width), jnp.float32)
            * 0.02
        ).astype(dt),
        "pos_emb": (
            jax.random.normal(kt[1], (cfg.text_len, cfg.text_width), jnp.float32)
            * 0.02
        ).astype(dt),
        "blocks": _stack_blocks(
            kt[2], cfg.text_depth, cfg.text_width, cfg.text_mlp_dim, dt
        ),
        "ln_final": _ln_init(cfg.text_width, dt),
        "head": _dense_init(kt[3], cfg.text_width, cfg.d_emb, dt),
    }
    # SigLIP loss temperature/bias (clip_accursed.py:42-43: bias_init=-10,
    # temperature_init=10); only used in training.
    return {
        "img": img,
        "txt": txt,
        "t": jnp.asarray(np.log(10.0), jnp.float32),
        "b": jnp.asarray(-10.0, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, p: Params) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(
        x.dtype
    )


def _dense(x: jax.Array, p: Params) -> jax.Array:
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
    return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def _attn(x: jax.Array, p: Params, num_heads: int, kv: Optional[jax.Array] = None):
    b, s, d = x.shape
    src = x if kv is None else kv
    sk = src.shape[1]
    q = _dense(x, p["q"]).reshape(b, s, num_heads, d // num_heads)
    k = _dense(src, p["k"]).reshape(b, sk, num_heads, d // num_heads)
    v = _dense(src, p["v"]).reshape(b, sk, num_heads, d // num_heads)
    o = mha(q, k, v).reshape(b, s, d)
    return _dense(o, p["o"])


def _mlp(x: jax.Array, p: Params) -> jax.Array:
    h = _dense(x, p["fc1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return _dense(h, p["fc2"])


def _encoder(x: jax.Array, blocks: Params, num_heads: int) -> jax.Array:
    """Pre-LN transformer encoder as a scan over stacked block params."""

    def step(h, blk):
        h = h + _attn(_layer_norm(h, blk["ln1"]), blk["attn"], num_heads)
        h = h + _mlp(_layer_norm(h, blk["ln2"]), blk["mlp"])
        return h, None

    x, _ = jax.lax.scan(step, x, blocks)
    return x


def _map_head(
    x: jax.Array, p: Params, num_heads: int, n_valid: Optional[int] = None
) -> jax.Array:
    """MAP (multihead attention pooling) head; big_vision vit.py MAPHead
    semantics (reference graph: aitemplate/model.py:82-111).

    ``n_valid``: when the encoder ran on a row-padded sequence, keys at
    positions >= n_valid are masked out of the pooling attention.
    """
    b, s, d = x.shape
    probe = jnp.broadcast_to(p["probe"][None], (b, 1, p["probe"].shape[-1])).astype(
        x.dtype
    )
    if n_valid is None or n_valid == s:
        y = _attn(probe, p, num_heads, kv=x)
    else:
        dh = d // num_heads
        q = _dense(probe, p["q"]).reshape(b, 1, num_heads, dh)
        k = _dense(x, p["k"]).reshape(b, s, num_heads, dh)
        v = _dense(x, p["v"]).reshape(b, s, num_heads, dh)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / dh**0.5)
        mask = jnp.arange(s) < n_valid
        scores = jnp.where(mask[None, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        y = _dense(o.reshape(b, 1, d), p["o"])
    y = y + _mlp(_layer_norm(y, p["ln"]), p["mlp"])
    return y[:, 0]


def _map_head_fat(
    x: jax.Array,
    lnf: Params,
    p: Params,
    num_heads: int,
    n_valid: int,
    interpret: bool = False,
) -> jax.Array:
    """Final-LN + MAP head for the fat encoder path, fused.

    Numerically equivalent to ``_map_head(_layer_norm(x, lnf), p, ...,
    n_valid)`` (the padded/masked branch), but the final LayerNorm is
    folded into one packed [k|v] projection via
    :func:`meme_search_engine_tpu.ops.fused.ln_matmul` — the normalised
    (B, SP, D) sequence never round-trips HBM and the two projections
    share one read of x. The probe-side q projection is batch-constant
    (the probe is a learned parameter broadcast over the batch), so it
    is computed once as an (H, dh) table instead of per batch row. The
    pooling attention itself is one query per image — negligible FLOPs —
    and stays in XLA.
    """
    b, sp, d = x.shape
    dh = d // num_heads
    wkv = jnp.concatenate([p["k"]["w"], p["v"]["w"]], axis=1)  # (D, 2D)
    bkv = jnp.concatenate([p["k"]["b"], p["v"]["b"]])
    nq = 4 if sp % 4 == 0 and (sp // 4) % 8 == 0 else 2
    if sp % nq or (sp // nq) % 8:
        nq = 1
    kv = ln_matmul(
        x, lnf["g"], lnf["b"], wkv, bkv, nq=nq, interpret=interpret
    )  # (B, SP, 2D)
    # q = dense(probe) in the same dtype chain as _map_head's _dense
    q = jnp.dot(
        p["probe"].astype(x.dtype), p["q"]["w"],
        preferred_element_type=jnp.float32,
    )
    q = (q + p["q"]["b"].astype(jnp.float32)).astype(x.dtype)
    q = q.reshape(num_heads, dh)
    k = kv[:, :, :d].reshape(b, sp, num_heads, dh)
    v = kv[:, :, d:].reshape(b, sp, num_heads, dh)
    scores = jnp.einsum(
        "hd,bkhd->bhk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / dh**0.5)
    mask = jnp.arange(sp) < n_valid
    scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum(
        "bhk,bkhd->bhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = _dense(o.reshape(b, 1, d), p["o"])
    y = y + _mlp(_layer_norm(y, p["ln"]), p["mlp"])
    return y[:, 0]


# ---------------------------------------------------------------------------
# Fat-layout encoder (image tower production path, TPU)
# ---------------------------------------------------------------------------


def _fat_qkv_weights(attn: Params, num_heads: int, head_dim: int):
    """Assemble fat-layout QKV projection weights (see ops.attention).

    Per head the fat block is [head_dim features, const column, zero
    pad]; the softmax scale folds into the q weights/bias, the const
    column rides the bias (q: 1, k: 0, v: 1 = partition-sum column).
    """
    c = fat_width(head_dim)
    d_in = attn["q"]["w"].shape[0]
    scale = 1.0 / (head_dim**0.5)

    def fat_w(w, s):
        w = (w * s).reshape(d_in, num_heads, head_dim)
        return jnp.pad(w, ((0, 0), (0, 0), (0, c - head_dim))).reshape(
            d_in, num_heads * c
        )

    def fat_b(b, s, const):
        b = (b * s).reshape(num_heads, head_dim)
        b = jnp.pad(b, ((0, 0), (0, c - head_dim)))
        b = b.at[:, head_dim].set(const)
        return b.reshape(num_heads * c)

    return (
        (fat_w(attn["q"]["w"], scale), fat_b(attn["q"]["b"], scale, 1.0)),
        (fat_w(attn["k"]["w"], 1.0), fat_b(attn["k"]["b"], 1.0, 0.0)),
        (fat_w(attn["v"]["w"], 1.0), fat_b(attn["v"]["b"], 1.0, 1.0)),
    )


def _encoder_fat(
    x: jax.Array,
    blocks: Params,
    num_heads: int,
    n_valid: int,
    interpret: bool = False,
) -> jax.Array:
    """Padded-sequence encoder using the fat-layout attention kernel.

    x: (B, SP, D) with rows >= n_valid zero-padded. Key masking is baked
    into the k const column (pad rows overwritten with -1e30 there), so
    pad rows never influence valid outputs.
    """
    b, sp, d = x.shape
    dh = d // num_heads
    c = fat_width(dh)

    # Assemble every layer's fat QKV projection in one vectorised pass
    # BEFORE the scan. Inside the scan the assembly inputs are per-step
    # xs slices, so XLA cannot hoist the pad/reshape/concat chain — it
    # would re-materialise ~26 MB of weight layout per layer per
    # forward. Here it is a single fused (depth, ...) transform.
    (wq, bq), (wk, bk), (wv, bv) = jax.vmap(
        lambda attn: _fat_qkv_weights(attn, num_heads, dh)
    )(blocks["attn"])
    wqkv_fat = jnp.concatenate([wq, wk, wv], axis=2)  # (depth, D, 3*H*C)
    bqkv_fat = jnp.concatenate([bq, bk, bv], axis=1)  # (depth, 3*H*C)

    def step(h, xs):
        blk, wf, bf = xs
        # fused LN1 + packed fat-QKV projection (one resident-weight
        # Pallas matmul; ops/fused.py)
        nq = 4 if sp % 4 == 0 and (sp // 4) % 8 == 0 else 2
        # fused LN1 + packed QKV projection; k pad rows get the mask
        # constant in-kernel (a host-graph update would copy the array)
        qkvf = ln_matmul(
            h,
            blk["ln1"]["g"],
            blk["ln1"]["b"],
            wf,
            bf,
            nq=nq,
            interpret=interpret,
            k_mask=(n_valid, num_heads, c, dh),
        )
        # MSE_ATTN_NQ sweeps the attention kernel's q-block count (grid
        # programs per batch row) without code edits, like MSE_MLP_*.
        # Round-4 sweep: nq=1 is VMEM-illegal (scoped OOM 18.79 MB at a
        # full-sequence q-block), nq=4 is ~11% slower (K/V re-fetch);
        # default 2 is the measured optimum (BENCHMARKS.md).
        attn_nq = int(os.environ.get("MSE_ATTN_NQ", "2"))
        if sp % attn_nq or (sp // attn_nq) % 8:
            attn_nq = 2
        attn_out = fat_vit_mha_packed(
            qkvf, num_heads, dh, nq=attn_nq, interpret=interpret
        )
        # separate o-proj+residual kernel measures FASTER than folding
        # the projection into the attention kernel's epilogue (218 vs
        # 203 img/s e2e — the fold's VMEM pressure costs more overlap
        # than the saved HBM pass buys; fat_vit_mha_packed_proj kept in
        # ops/attention.py, parity-tested by
        # tests/test_attention.py::test_fat_vit_mha_packed_proj_matches_unfused)
        h = matmul_residual(
            attn_out, blk["attn"]["o"]["w"], blk["attn"]["o"]["b"], h,
            nq=nq, interpret=interpret,
        )
        # fused LN2 + MLP + residual (the gelu intermediate never
        # round-trips HBM; ops/fused.py ln_mlp_residual)
        # MSE_MLP_NQ/MSE_MLP_MH/MSE_MLP_RESIDENT sweep the kernel
        # geometry without code edits. Production defaults are the
        # measured-best point of the round-3 sweep on one v5e at
        # SO400M/B=128: resident weights + nq=2 + mh=2176 = 238.4 img/s
        # vs 218.7 for streaming nq=4 (BENCHMARKS.md MFU ladder).
        mlp_nq = int(os.environ.get("MSE_MLP_NQ", "0")) or (
            2 if sp % 2 == 0 and (sp // 2) % 8 == 0 else nq
        )
        if sp % mlp_nq or (sp // mlp_nq) % 8:
            mlp_nq = nq
        mh = int(os.environ.get("MSE_MLP_MH", "2176"))
        m = blk["mlp"]["fc1"]["w"].shape[1]
        mh_eff = min(mh, ((m + 127) // 128) * 128)
        mpad = ((m + mh_eff - 1) // mh_eff) * mh_eff
        res_env = os.environ.get("MSE_MLP_RESIDENT", "")
        resident = (
            bool(int(res_env))
            if res_env
            # resident w1+w2 must fit VMEM next to the row block; 21 MB
            # covers SO400M (20.06 MB measured working) and every
            # smaller tower
            else 2 * d * mpad * h.dtype.itemsize <= 21_000_000
        )
        h = ln_mlp_residual(
            h,
            blk["ln2"]["g"], blk["ln2"]["b"],
            blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"],
            blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"],
            nq=mlp_nq, mh=mh,
            resident=resident,
            interpret=interpret,
        )
        return h, None

    # MSE_SCAN_UNROLL: unroll factor for the layer scan. Measured
    # negative (BENCHMARKS.md round-4 sweep): unroll=3 235.8 img/s vs
    # 237.9 default, and unroll=9 fails compile (scoped-VMEM stacks of
    # the cloned resident-MLP bodies stop sharing, 18.21 MB > 16 MB).
    # XLA does not overlap across cloned scan bodies here, so the
    # ~2.2 ms/layer in-graph gap needs kernel-boundary fusion instead.
    # Knob kept for other geometries.
    unroll = int(os.environ.get("MSE_SCAN_UNROLL", "1"))
    if len(blocks["ln1"]["g"]) % max(unroll, 1):
        unroll = 1
    x, _ = jax.lax.scan(
        step, x, (blocks, wqkv_fat, bqkv_fat), unroll=max(unroll, 1)
    )
    return x


def _encoder_text(
    x: jax.Array,
    blocks: Params,
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Fused short-sequence encoder (the text tower's S=64 regime).

    The fat-layout kernel loses at short sequence (its 80/128-lane
    layout penalty and fixed overhead stop amortising when the
    attention matmuls are tiny — BENCHMARKS.md round-4 text A/B), and
    the plain XLA path leaves ~2x on the table per layer. This encoder
    exploits that LayerNorm/projection/MLP are PER-ROW: it reshapes
    (B, S, D) to a row view of ~256-row blocks — free and exact — and
    runs the image tower's resident-weight fused kernels on it
    (ln_matmul packed QKV, matmul_residual o-proj, ln_mlp_residual),
    plus the in-VMEM attention kernel with many (batch, head) slices
    per program (hpp=16: at S=64 a program's per-head work is ~0.6
    MFLOP, so the S=729 default of 2 heads/program is launch-bound —
    grid 2048 -> 256 programs measured ~2.2x faster at SO400M text
    shapes, tools_profile_text_stages.py).

    Numerics identical to ``_encoder`` (fp32 LN statistics and matmul
    accumulation in the fused kernels; parity-tested in
    tests/test_siglip.py).
    """
    b, s, d = x.shape
    dh = d // num_heads

    # packed QKV weights assembled once outside the scan (a per-layer
    # concat inside the body would re-materialise the weights each step)
    wqkv = jnp.concatenate(
        [
            blocks["attn"]["q"]["w"],
            blocks["attn"]["k"]["w"],
            blocks["attn"]["v"]["w"],
        ],
        axis=2,
    )  # (depth, D, 3D)
    bqkv = jnp.concatenate(
        [
            blocks["attn"]["q"]["b"],
            blocks["attn"]["k"]["b"],
            blocks["attn"]["v"]["b"],
        ],
        axis=1,
    )  # (depth, 3D)

    # row view: rows of D-vectors, blocked so each kernel program sees
    # ~256 rows (the VMEM sweet spot measured on the image tower; a
    # 512-row block with the packed 3456-wide QKV output is
    # scoped-VMEM-illegal). Total rows b*s is a power-of-two multiple
    # of 256 for every pow2 engine bucket at S=64.
    rows = b * s
    rq = int(os.environ.get("MSE_TEXT_RQ", "0")) or (
        256 if rows % 256 == 0 and rows >= 256 else 8
    )
    if rows % rq:
        rq = 8
    rb = rows // rq
    xr = x.reshape(rb, rq, d)
    # sub-chunk count inside each fused-kernel program (ln_matmul nq):
    # the stage profile's best QKV config is a 1024-row view with
    # nq=8 (128-row sub-chunks) — tools_profile_text_stages.py
    nq_rows = int(os.environ.get("MSE_TEXT_NQ", "1")) or 1
    if rq % nq_rows or (rq // nq_rows) % 8:
        nq_rows = 1

    hpp = int(os.environ.get("MSE_TEXT_ATTN_HPP", "0")) or (
        16 if (b * num_heads) % 16 == 0 else (
            2 if (b * num_heads) % 2 == 0 else 1
        )
    )
    if (b * num_heads) % hpp:
        hpp = 1

    # Each sub-block is independently routable (fused Pallas kernel vs
    # plain XLA) so the production default is the measured-best combo
    # rather than an all-or-nothing bet; see BENCHMARKS.md round-5 text
    # section for the quiet-chip sweep behind the defaults.
    use_fused_qkv = os.environ.get("MSE_TEXT_QKV", "xla") == "fused"
    use_fused_o = os.environ.get("MSE_TEXT_O", "xla") == "fused"
    use_fused_mlp = os.environ.get("MSE_TEXT_MLP", "xla") == "fused"

    def step(h, xs):
        blk, wf, bf = xs
        if use_fused_qkv:
            qkv = ln_matmul(
                h, blk["ln1"]["g"], blk["ln1"]["b"], wf, bf,
                nq=nq_rows, interpret=interpret,
            )  # (rb, rq, 3D)
        else:
            hn = _layer_norm(h, blk["ln1"])
            qkv = _dense(hn, {"w": wf, "b": bf})
        qkv = qkv.reshape(b, s, 3, num_heads, dh)
        o = fused_mha_pallas(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
            hpp=hpp, interpret=interpret,
        )  # (b, s, H, dh)
        if use_fused_o:
            h = matmul_residual(
                o.reshape(rb, rq, d),
                blk["attn"]["o"]["w"], blk["attn"]["o"]["b"], h,
                nq=nq_rows, interpret=interpret,
            )
        else:
            h = h + _dense(o.reshape(rb, rq, d), blk["attn"]["o"])
        if use_fused_mlp:
            m = blk["mlp"]["fc1"]["w"].shape[1]
            mh = int(os.environ.get("MSE_MLP_MH", "2176"))
            mh_eff = min(mh, ((m + 127) // 128) * 128)
            mpad = ((m + mh_eff - 1) // mh_eff) * mh_eff
            resident = 2 * d * mpad * h.dtype.itemsize <= 21_000_000
            h = ln_mlp_residual(
                h,
                blk["ln2"]["g"], blk["ln2"]["b"],
                blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"],
                blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"],
                nq=1, mh=mh, resident=resident, interpret=interpret,
            )
        else:
            h = h + _mlp(_layer_norm(h, blk["ln2"]), blk["mlp"])
        return h, None

    xr, _ = jax.lax.scan(step, xr, (blocks, wqkv, bqkv))
    return xr.reshape(b, s, d)


def preprocess_image(
    image: jax.Array, cfg: SigLIPConfig = SO400M_14_384
) -> jax.Array:
    """uint8 (B,H,W,3) -> model input (B,R,R,3) in [-1,1], inside the graph.

    Mirrors big_vision ``resize(384)|value_range(-1,1)``
    (clip_accursed.py:51). Bilinear + antialias for downscale parity with
    the reference's convolution resizers (common.rs:43-44).
    """
    x = image.astype(jnp.float32)
    r = cfg.image_size
    if image.shape[1] != r or image.shape[2] != r:
        x = jax.image.resize(
            x, (image.shape[0], r, r, 3), method="bilinear", antialias=True
        )
    return (x / 127.5 - 1.0).astype(cfg.param_dtype)


@functools.partial(
    jax.jit, static_argnames=("cfg", "normalize", "preprocessed")
)
def encode_image(
    params: Params,
    images: jax.Array,
    cfg: SigLIPConfig = SO400M_14_384,
    *,
    normalize: bool = True,
    preprocessed: bool = False,
) -> jax.Array:
    """Images -> L2-normalised fp32 embeddings (B, d_emb).

    ``images``: uint8 (B,H,W,3) raw, or float (B,R,R,3) in [-1,1] when
    ``preprocessed``.
    """
    p = params["img"]
    x = images.astype(cfg.param_dtype) if preprocessed else preprocess_image(images, cfg)
    b = x.shape[0]
    n_side = cfg.image_size // cfg.patch_size
    # conv(stride=kernel, pad=0) == crop to n_side*patch (384 -> 378: the
    # stride-14 conv drops the trailing 6px) + blocked reshape + one MXU
    # matmul
    span = n_side * cfg.patch_size
    x = x[:, :span, :span, :]
    x = x.reshape(b, n_side, cfg.patch_size, n_side, cfg.patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, n_side * n_side, cfg.patch_size * cfg.patch_size * 3
    )
    x = _dense(x, p["patch_embed"])
    x = x + p["pos_emb"][None].astype(x.dtype)
    s = cfg.num_patches
    sp = ((s + 15) // 16) * 16  # row-pad for aligned kernel/matmul tiling
    head_dim = cfg.width // cfg.num_heads
    use_fat = cfg.attn_impl == "fat_interpret" or (
        cfg.attn_impl == "auto"
        and jax.default_backend() == "tpu"
        and fat_layout_ok(cfg.num_heads, head_dim, sp)
    )
    if use_fat:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
        x = _encoder_fat(
            x, p["blocks"], cfg.num_heads, n_valid=s,
            interpret=cfg.attn_impl == "fat_interpret",
        )
        emb = _map_head_fat(
            x, p["ln_final"], p["map_head"], cfg.num_heads, n_valid=s,
            interpret=cfg.attn_impl == "fat_interpret",
        ).astype(jnp.float32)
    else:
        x = _encoder(x, p["blocks"], cfg.num_heads)
        x = _layer_norm(x, p["ln_final"])
        emb = _map_head(x, p["map_head"], cfg.num_heads).astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


@functools.partial(jax.jit, static_argnames=("cfg", "normalize"))
def encode_text(
    params: Params,
    tokens: jax.Array,
    cfg: SigLIPConfig = SO400M_14_384,
    *,
    normalize: bool = True,
) -> jax.Array:
    """Token ids (B, text_len) int32 -> L2-normalised fp32 embeddings.

    big_vision text_transformer semantics: embed + pos, encoder, final LN,
    last-token pool (sticky-eos/pad-1 tokenisation guarantees position -1
    is the sentence representation; clip_accursed.py:55), then the output
    head projection.
    """
    p = params["txt"]
    x = jnp.take(p["token_emb"], tokens, axis=0)
    x = x + p["pos_emb"][None].astype(x.dtype)
    sp = cfg.text_len
    th = cfg.text_num_heads
    fat_capable = fat_layout_ok(th, cfg.text_width // th, sp)
    # At short sequence the fat-layout kernel loses to plain XLA
    # attention: its 80/128-lane layout penalty and fixed per-kernel
    # overhead stop amortising once the attention matmuls are tiny.
    # Measured on the real chip at SO400M text shapes (S=64, bs=256):
    # fat 166.8 ms/batch (1535 texts/s, 41% MFU) vs XLA 126.6 ms/batch
    # (2023 texts/s, 55% MFU) — so "auto" only picks fat at the
    # image-tower regime (S>=256); "fat_interpret" still forces it for
    # the parity tests.
    use_fat = fat_capable and (
        cfg.attn_impl == "fat_interpret"
        or (
            cfg.attn_impl == "auto"
            and jax.default_backend() == "tpu"
            and sp >= 256
        )
    )
    if use_fat:
        # text_len=64 is already row-aligned: same fat-layout encoder as
        # the image tower, no padding, full-sequence keys valid
        x = _encoder_fat(
            x, p["blocks"], th, n_valid=sp,
            interpret=cfg.attn_impl == "fat_interpret",
        )
    elif (
        os.environ.get("MSE_TEXT_FUSED", "0") == "1"
        and jax.default_backend() == "tpu"
        and (cfg.text_width // th) % 8 == 0
    ):
        # short-sequence fused encoder (_encoder_text): resident-weight
        # row kernels + hpp-batched attention. Opt-in: the quiet-chip
        # A/B at bs=256 measured it SLOWER than the plain XLA encoder
        # (137.2 vs 126.5 ms/batch — the row-kernel variants lose at
        # S=64 row geometry even though the attention kernel alone
        # wins; BENCHMARKS.md round-5 text section), so XLA stays the
        # production route until a combination measures faster.
        x = _encoder_text(x, p["blocks"], th)
    else:
        x = _encoder(x, p["blocks"], th)
    x = _layer_norm(x, p["ln_final"])
    x = x[:, -1]
    emb = _dense(x, p["head"]).astype(jnp.float32)
    if normalize:
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
    return emb


# ---------------------------------------------------------------------------
# SigLIP sigmoid loss + train step (used by the multi-chip dry run; the
# reference ships pretrained weights and never trains the tower itself)
# ---------------------------------------------------------------------------


def siglip_loss(params: Params, images: jax.Array, tokens: jax.Array, cfg: SigLIPConfig):
    zi = encode_image(params, images, cfg, preprocessed=True)
    zt = encode_text(params, tokens, cfg)
    logits = (
        jnp.dot(zi, zt.T, preferred_element_type=jnp.float32)
        * jnp.exp(params["t"])
        + params["b"]
    )
    n = logits.shape[0]
    labels = 2.0 * jnp.eye(n, dtype=jnp.float32) - 1.0
    # -log sigmoid(labels * logits), pairwise sigmoid contrastive loss
    return jnp.mean(jax.nn.softplus(-labels * logits))


# ---------------------------------------------------------------------------
# Checkpoint loading (HF / big_vision name mapping)
# ---------------------------------------------------------------------------


def _hf_block(tensors, prefix: str, i: int, dt):
    """Map one HF SiglipEncoderLayer onto our block layout."""

    def t(name):
        return jnp.asarray(tensors[f"{prefix}.layers.{i}.{name}"], dt)

    def lin(name):
        return {"w": t(f"{name}.weight").T, "b": t(f"{name}.bias")}

    return {
        "ln1": {"g": t("layer_norm1.weight"), "b": t("layer_norm1.bias")},
        "attn": {
            "q": lin("self_attn.q_proj"),
            "k": lin("self_attn.k_proj"),
            "v": lin("self_attn.v_proj"),
            "o": lin("self_attn.out_proj"),
        },
        "ln2": {"g": t("layer_norm2.weight"), "b": t("layer_norm2.bias")},
        "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
    }


def load_hf_siglip(path: str, cfg: SigLIPConfig = SO400M_14_384) -> Params:
    """Load google/siglip-so400m-patch14-384 safetensors into our tree.

    Accepts a file or directory containing ``model.safetensors``.
    """
    import os

    from safetensors import safe_open

    if os.path.isdir(path):
        path = os.path.join(path, "model.safetensors")
    tensors: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            tensors[key] = f.get_tensor(key)

    dt = cfg.param_dtype
    vp = "vision_model.encoder"
    tp = "text_model.encoder"

    def arr(name):
        return jnp.asarray(tensors[name], dt)

    def lin(name):
        return {"w": arr(name + ".weight").T, "b": arr(name + ".bias")}

    img_blocks = [ _hf_block(tensors, vp, i, dt) for i in range(cfg.depth) ]
    txt_blocks = [ _hf_block(tensors, tp, i, dt) for i in range(cfg.text_depth) ]

    # HF patch conv weight: (width, 3, P, P) -> (P*P*3, width) matching our
    # (h, w, c) patch flattening order.
    wconv = tensors["vision_model.embeddings.patch_embedding.weight"]
    wmat = np.transpose(wconv, (2, 3, 1, 0)).reshape(-1, cfg.width)

    # HF MAP head: probe, in_proj (packed qkv), out_proj, layernorm, mlp
    hp = "vision_model.head"
    in_w = tensors[f"{hp}.attention.in_proj_weight"]  # (3*width, width)
    in_b = tensors[f"{hp}.attention.in_proj_bias"]
    w_q, w_k, w_v = np.split(in_w, 3, axis=0)
    b_q, b_k, b_v = np.split(in_b, 3, axis=0)

    params = {
        "img": {
            "patch_embed": {
                "w": jnp.asarray(wmat, dt),
                "b": arr("vision_model.embeddings.patch_embedding.bias"),
            },
            "pos_emb": arr("vision_model.embeddings.position_embedding.weight"),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *img_blocks),
            "ln_final": {
                "g": arr("vision_model.post_layernorm.weight"),
                "b": arr("vision_model.post_layernorm.bias"),
            },
            "map_head": {
                "probe": arr(f"{hp}.probe")[0],
                "q": {"w": jnp.asarray(w_q.T, dt), "b": jnp.asarray(b_q, dt)},
                "k": {"w": jnp.asarray(w_k.T, dt), "b": jnp.asarray(b_k, dt)},
                "v": {"w": jnp.asarray(w_v.T, dt), "b": jnp.asarray(b_v, dt)},
                "o": lin(f"{hp}.attention.out_proj"),
                "ln": {
                    "g": arr(f"{hp}.layernorm.weight"),
                    "b": arr(f"{hp}.layernorm.bias"),
                },
                "mlp": {"fc1": lin(f"{hp}.mlp.fc1"), "fc2": lin(f"{hp}.mlp.fc2")},
            },
        },
        "txt": {
            "token_emb": arr("text_model.embeddings.token_embedding.weight"),
            "pos_emb": arr("text_model.embeddings.position_embedding.weight"),
            "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *txt_blocks),
            "ln_final": {
                "g": arr("text_model.final_layer_norm.weight"),
                "b": arr("text_model.final_layer_norm.bias"),
            },
            "head": lin("text_model.head"),
        },
        "t": jnp.asarray(np.log(10.0), jnp.float32),
        "b": jnp.asarray(-10.0, jnp.float32),
    }
    if "logit_scale" in tensors:
        params["t"] = jnp.asarray(tensors["logit_scale"], jnp.float32).reshape(())
    if "logit_bias" in tensors:
        params["b"] = jnp.asarray(tensors["logit_bias"], jnp.float32).reshape(())
    return params


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
