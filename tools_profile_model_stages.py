"""Stage-level profile of the image-tower forward pass on the real TPU.

Times cumulative prefixes of encode_image (preprocess -> patch embed ->
encoder -> final LN -> MAP head -> L2 norm) so the non-encoder overhead
(~540 ms total vs 27 x 19.2 ms of layers) is attributed to a stage
instead of guessed at. Differences between consecutive prefixes are the
per-stage times.

Methodology matches bench.py: jit each prefix, warm up, time 11 iters
minus 1 iter to difference out the fixed host-fetch sync (the only
reliable sync on this tunneled backend — see CLAUDE.md).

Run:  python tools_profile_model_stages.py            (TPU, B=128)
      python tools_profile_model_stages.py --batch 32
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from meme_search_engine_tpu.models import siglip


def _prefix(params, images, cfg, *, upto: str):
    """Forward pass truncated after the named stage (fat path)."""
    p = params["img"]
    x = siglip.preprocess_image(images, cfg)
    if upto == "preprocess":
        return x
    b = x.shape[0]
    n_side = cfg.image_size // cfg.patch_size
    span = n_side * cfg.patch_size
    x = x[:, :span, :span, :]
    x = x.reshape(b, n_side, cfg.patch_size, n_side, cfg.patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, n_side * n_side, cfg.patch_size * cfg.patch_size * 3
    )
    x = siglip._dense(x, p["patch_embed"])
    x = x + p["pos_emb"][None].astype(x.dtype)
    if upto == "patch_embed":
        return x
    s = cfg.num_patches
    sp = ((s + 15) // 16) * 16
    x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    x = siglip._encoder_fat(x, p["blocks"], cfg.num_heads, n_valid=s)
    if upto == "encoder":
        return x
    xl = siglip._layer_norm(x, p["ln_final"])
    if upto == "final_ln":
        return xl
    emb = siglip._map_head(
        xl, p["map_head"], cfg.num_heads, n_valid=s
    ).astype(jnp.float32)
    if upto == "map_head":
        return emb
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


STAGES = ["preprocess", "patch_embed", "encoder", "final_ln", "map_head", "norm"]


def _encoder_marginal(params, images, cfg, n_layers: int):
    """Forward through the first n_layers encoder layers only (fat path);
    t(n) ~= fixed + n * per_layer separates scan/launch overhead from
    marginal layer cost."""
    p = params["img"]
    x = siglip.preprocess_image(images, cfg)
    b = x.shape[0]
    n_side = cfg.image_size // cfg.patch_size
    span = n_side * cfg.patch_size
    x = x[:, :span, :span, :]
    x = x.reshape(b, n_side, cfg.patch_size, n_side, cfg.patch_size, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, n_side * n_side, cfg.patch_size * cfg.patch_size * 3
    )
    x = siglip._dense(x, p["patch_embed"])
    x = x + p["pos_emb"][None].astype(x.dtype)
    s = cfg.num_patches
    sp = ((s + 15) // 16) * 16
    x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    blocks = jax.tree.map(lambda a: a[:n_layers], p["blocks"])
    return siglip._encoder_fat(x, blocks, cfg.num_heads, n_valid=s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=11)
    ap.add_argument(
        "--marginal", action="store_true",
        help="time the encoder at 1/9/27 layers to split fixed vs "
        "marginal per-layer cost",
    )
    args = ap.parse_args()

    cfg = siglip.SO400M_14_384
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.integers(
            0, 256, (args.batch, cfg.image_size, cfg.image_size, 3)
        ).astype(np.uint8)
    )

    def timed(fn) -> float:
        np.asarray(fn(params, images))  # compile + warm
        def run(iters):
            t0 = time.perf_counter()
            out = fn(params, images)
            for _ in range(iters - 1):
                out = fn(params, images)
            np.asarray(out.ravel()[0])  # host fetch = sync
            return time.perf_counter() - t0
        run(1)
        t1 = min(run(1) for _ in range(2))
        tn = run(args.iters)
        return (tn - t1) / (args.iters - 1)

    if args.marginal:
        pts = []
        for n in (1, 9, 27):
            fn = jax.jit(
                functools.partial(_encoder_marginal, cfg=cfg, n_layers=n)
            )
            t = timed(fn)
            pts.append((n, t))
            print(f"layers={n:2d}  {t*1e3:8.1f} ms", flush=True)
        (n0, t0), (n1, t1) = pts[0], pts[-1]
        per_layer = (t1 - t0) / (n1 - n0)
        print(
            f"marginal {per_layer*1e3:.2f} ms/layer, "
            f"fixed {(t0 - n0*per_layer)*1e3:.1f} ms", flush=True,
        )
        return

    prev = 0.0
    rows = []
    for st in STAGES:
        fn = jax.jit(functools.partial(_prefix, cfg=cfg, upto=st))
        t = timed(fn)
        rows.append((st, t * 1e3, (t - prev) * 1e3))
        prev = t
        print(
            f"{st:12s} cumulative {t*1e3:8.1f} ms   stage {rows[-1][2]:7.1f} ms",
            flush=True,
        )

    total = rows[-1][1]
    print(f"\nB={args.batch}: total {total:.1f} ms "
          f"({args.batch / (total / 1e3):.1f} img/s)")


if __name__ == "__main__":
    main()
