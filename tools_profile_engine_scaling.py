"""Embedding-engine scaling curve on the virtual CPU mesh.

Round-2 VERDICT asked for a throughput-vs-devices curve for the
*embedding engine* (the search path already has per-device-FLOP scaling
evidence in tests/test_parallel.py). No multi-chip hardware exists in
this environment, so this measures on 1/2/4/8 virtual CPU devices:

- per-device compiled FLOPs and argument bytes at a FIXED GLOBAL batch
  (the real scaling evidence: dp shards the batch, so per-device work
  must drop ~1/n while the collective traffic stays k-sized), and
- wall-time per step (reported for completeness; all virtual devices
  share ONE physical core here, so wall time stays ~flat by
  construction — absolute throughput on the CPU mesh is meaningless,
  as the BENCHMARKS.md table states).

Run: python tools_profile_engine_scaling.py
"""

import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from meme_search_engine_tpu.models import siglip  # noqa: E402
from meme_search_engine_tpu.parallel import mesh as meshlib  # noqa: E402

GLOBAL_BATCH = 32


def main():
    cfg = siglip.tiny_test_config()
    params = siglip.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    imgs = rng.integers(
        0, 256, (GLOBAL_BATCH, cfg.image_size, cfg.image_size, 3),
        dtype=np.uint8,
    )
    toks = rng.integers(
        0, cfg.vocab_size, (GLOBAL_BATCH, cfg.text_len), dtype=np.int32
    )

    def run(tower, batch):
        print(f"\n{tower}: global batch {GLOBAL_BATCH}")
        print(f"{'devs':>5} {'GFLOP/dev':>10} {'argMB/dev':>10} "
              f"{'ms/step':>8} {'rel flops':>9}")
        base = None
        for n in (1, 2, 4, 8):
            m = meshlib.make_mesh(n, model_parallel=1)
            bs = NamedSharding(m, P(meshlib.DATA))
            rep = NamedSharding(m, P())
            p_dev = jax.device_put(params, jax.tree.map(lambda _: rep, params))
            b_dev = jax.device_put(jnp.asarray(batch), bs)
            fn = (
                (lambda pp, bb: siglip.encode_image(pp, bb, cfg))
                if tower == "image"
                else (lambda pp, bb: siglip.encode_text(pp, bb, cfg))
            )
            compiled = jax.jit(fn).lower(p_dev, b_dev).compile()
            flops = compiled.cost_analysis()["flops"]
            argmb = compiled.memory_analysis().argument_size_in_bytes / 2**20
            out = compiled(p_dev, b_dev)
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = compiled(p_dev, b_dev)
            np.asarray(out)  # host fetch = true sync
            ms = (time.perf_counter() - t0) / reps * 1e3
            if base is None:
                base = flops
            print(f"{n:>5} {flops/1e9:>10.3f} {argmb:>10.2f} "
                  f"{ms:>8.1f} {flops/base:>9.3f}")

    run("image", imgs)
    run("text", toks)


if __name__ == "__main__":
    main()
