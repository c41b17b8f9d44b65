"""Batch-size sweep for both towers on the real TPU.

Mirrors the reference's AITemplate benchmark harness (aitemplate/run.py
:161-163: batch sizes 1..32, fp16) and extends to the serving maximum
(clip_server_config.json max batch 128). Reports per-batch latency and
throughput — the small-batch end is the interactive-query latency the
engine's pow2 bucketing (serving/engine.py) was built around.

Methodology matches bench.py (host-fetch sync; see CLAUDE.md).

Run:  python tools_profile_bs_sweep.py
"""

from __future__ import annotations

import time

import jax
import numpy as np

from meme_search_engine_tpu.models import siglip


def main():
    cfg = siglip.SO400M_14_384
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    ifn = jax.jit(lambda p, im: siglip.encode_image(p, im, cfg))
    tfn = jax.jit(lambda p, t: siglip.encode_text(p, t, cfg))

    def timed(fn, arg, iters=11):
        np.asarray(fn(params, arg))  # compile + warm
        def run(k):
            t0 = time.perf_counter()
            out = fn(params, arg)
            for _ in range(k - 1):
                out = fn(params, arg)
            np.asarray(out.ravel()[0])
            return time.perf_counter() - t0
        run(1)
        t1 = min(run(1) for _ in range(2))
        tn = run(iters)
        return (tn - t1) / (iters - 1)

    print(f"{'bs':>4} {'img ms':>8} {'img/s':>8} {'txt ms':>8} {'txt/s':>8}")
    for bs in (1, 2, 4, 8, 16, 32, 64, 128):
        imgs = jax.device_put(
            rng.integers(
                0, 256, (bs, cfg.image_size, cfg.image_size, 3)
            ).astype(np.uint8)
        )
        toks = jax.device_put(
            rng.integers(0, cfg.vocab_size, (bs, cfg.text_len)).astype(
                np.int32
            )
        )
        ti = timed(ifn, imgs)
        tt = timed(tfn, toks)
        print(
            f"{bs:>4} {ti*1e3:>8.1f} {bs/ti:>8.1f} "
            f"{tt*1e3:>8.2f} {bs/tt:>8.1f}"
        )


if __name__ == "__main__":
    main()
