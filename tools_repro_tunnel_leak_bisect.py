"""Bisect WHICH dispatch pattern makes the tunneled TPU plugin retain host RSS.

Round-4 established (tools_repro_tunnel_leak.py + BENCHMARKS.md): the
1e7 build leaks ~18-19 KB of host RSS per node-insert round, it is not
Python-level retention and malloc_trim does not recover it.  This
script isolates the retaining pattern by running ONE pattern per
process (pass the mode name; fresh plugin state each time) and fitting
the RSS slope:

  upload        new int32 device_put per round, no compute, scalar fetch
  upload_reuse  same bytes uploaded per round but written into ONE
                preallocated host array (stable address) — if the
                slope drops to ~0 the plugin is retaining per fresh
                host buffer (a registration/staging cache keyed on the
                source address), and the workaround is staging-buffer
                reuse
  rebuffer_reuse  rebuffer's update values staged through the same
                persistent host array
  fetch         fetch rows of one persistent device array (no uploads)
  gather_jit    jitted dynamic row gather, scalar fetch only
  rebuffer      x = x.at[rows].set(vals) — a NEW device buffer per
                round with the old one dropped (the build's graph
                update pattern)
  rebuffer_donate  same but through a jit with donate_argnums
  full          the build's full per-round mix (upload+gather+download)

Driver: tools_chip_window_r5.py-style lease window, then
  for m in upload fetch gather_jit rebuffer rebuffer_donate full:
      python tools_repro_tunnel_leak_bisect.py $m 400
"""

import ctypes
import gc
import sys
import time


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])
    return -1


def main():
    mode = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    base = jax.device_put(
        jnp.asarray(rng.standard_normal((4096, 192)), jnp.bfloat16)
    )
    graph = jax.device_put(
        jnp.zeros((4096, 24), jnp.int32)
    )

    @jax.jit
    def gather(ids):
        return base[ids].sum()

    @jax.jit
    def full_step(ids):
        rows = base[ids]
        return rows, jnp.argsort(rows.sum(-1))[:, None] + jnp.zeros(
            (1, 24), jnp.int32
        )

    @jax.jit
    def scalar(x):
        return x.sum()

    def set_rows(g, rows, vals):
        return g.at[rows].set(vals)

    set_rows_jit = jax.jit(set_rows, donate_argnums=(0,))

    ids0 = jnp.asarray(rng.integers(0, 4096, (512,)).astype(np.int32))
    np.asarray(full_step(ids0)[0])
    float(gather(ids0))
    float(scalar(base))
    rows0 = jnp.asarray(np.arange(512, dtype=np.int32))
    vals0 = jnp.asarray(rng.integers(0, 4096, (512, 24)).astype(np.int32))
    graph = set_rows(graph, rows0, vals0)
    graph = set_rows_jit(graph, rows0, vals0)
    np.asarray(graph[:1])

    stage_ids = np.empty((512,), np.int32)
    stage_vals = np.empty((512, 24), np.int32)

    if mode == "sizesweep":
        # per-upload-size retention curve, one process: is the leak
        # strictly proportional to uploaded bytes, or per-transfer
        # (fixed cost), or thresholded (large transfers on a clean
        # path)? 200 fresh-array uploads per size, slope per segment.
        t0 = time.time()
        for nkb in (2, 8, 32, 128, 512, 2048):
            n = nkb * 256
            seg = []
            for i in range(rounds):
                arr = rng.integers(0, 4096, (n,)).astype(np.int32)
                float(scalar(jnp.asarray(arr)))
                if i % 5 == 0:
                    gc.collect()
                    seg.append((i, rss_kb()))
            xs = np.asarray([s[0] for s in seg], np.float64)
            ys = np.asarray([s[1] for s in seg], np.float64)
            cut = len(xs) // 3
            slope = float(np.polyfit(xs[cut:], ys[cut:], 1)[0])
            print(
                f"mode=sizesweep kb={nkb} rounds={rounds} "
                f"slope={slope:.2f} KB/round ratio={slope / nkb:.3f}",
                flush=True,
            )
        print(f"sizesweep wall={time.time()-t0:.0f}s", flush=True)
        return

    samples = []
    t0 = time.time()
    for i in range(rounds):
        if mode == "upload":
            ids = jnp.asarray(
                rng.integers(0, 4096, (512,)).astype(np.int32)
            )
            float(scalar(ids))
        elif mode == "upload_reuse":
            stage_ids[:] = rng.integers(0, 4096, (512,))
            float(scalar(jnp.asarray(stage_ids)))
        elif mode.startswith("upload_kb"):
            # size sweep: does the per-upload retention have a size
            # threshold (small transfers on a leaking staging path,
            # large ones not)? mode=upload_kbN uploads N KB per round.
            nkb = int(mode[len("upload_kb"):])
            arr = rng.integers(0, 4096, (nkb * 256,)).astype(np.int32)
            float(scalar(jnp.asarray(arr)))
        elif mode == "sizesweep":
            # all sizes in one process (one jax init): per-size slope
            # fitted on its own segment below
            pass
        elif mode == "rebuffer_reuse":
            stage_vals[:] = rng.integers(0, 4096, (512, 24))
            graph = set_rows(graph, rows0, jnp.asarray(stage_vals))
            float(scalar(graph))
        elif mode == "fetch":
            np.asarray(base[:512])
        elif mode == "gather_jit":
            float(gather(ids0))
        elif mode == "rebuffer":
            vals = jnp.asarray(
                rng.integers(0, 4096, (512, 24)).astype(np.int32)
            )
            graph = set_rows(graph, rows0, vals)
            float(scalar(graph))
        elif mode == "rebuffer_donate":
            vals = jnp.asarray(
                rng.integers(0, 4096, (512, 24)).astype(np.int32)
            )
            graph = set_rows_jit(graph, rows0, vals)
            float(scalar(graph))
        elif mode == "full":
            ids = jnp.asarray(
                rng.integers(0, 4096, (512,)).astype(np.int32)
            )
            rows, adj = full_step(ids)
            np.asarray(rows)
            np.asarray(adj)
        else:
            raise SystemExit(f"unknown mode {mode}")
        if i % 10 == 0:
            gc.collect()
            samples.append((i, rss_kb()))
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass
    trimmed = rss_kb()

    xs = np.asarray([s[0] for s in samples], np.float64)
    ys = np.asarray([s[1] for s in samples], np.float64)
    # drop warmup third (allocator growth plateaus)
    cut = len(xs) // 3
    slope = float(np.polyfit(xs[cut:], ys[cut:], 1)[0])
    print(
        f"mode={mode} rounds={rounds} wall={time.time()-t0:.0f}s "
        f"rss {ys[0]:.0f}->{ys[-1]:.0f} KB trimmed={trimmed} "
        f"slope={slope:.2f} KB/round",
        flush=True,
    )


if __name__ == "__main__":
    main()
