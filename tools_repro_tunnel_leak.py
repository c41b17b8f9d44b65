"""Minimal repro: the tunneled TPU plugin leaks host RSS per transfer.

Observed during 1e7 index builds (BENCHMARKS.md "TPU tunnel plugin
leaks ~18 KB of host RSS per node-insert"): host RSS grows linearly
with the number of host<->device transfers, with zero live jax arrays
and zero gc-reachable numpy, and malloc_trim recovers almost nothing.
This script reproduces it standalone so the driver can escalate
against the plugin: it runs N rounds of the build's transfer shape
(small int32 uploads + a bf16 row-block download), samples RSS, fits
the slope, and asserts no Python-level retention.

Usage:  python tools_repro_tunnel_leak.py [rounds=300]

Healthy output: rss slope ~0 KB/round. Leaky tunnel: a stable positive
slope (measured ~18 KB per node-insert-equivalent on this host).
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}")

    # the build's per-round transfer shape: a (512,) int32 batch upload,
    # a (512, 24) int32 adjacency download, and a (512, 192) bf16 row
    # gather result download (scaled-down build geometry)
    rng = np.random.default_rng(0)
    base = jax.device_put(
        jnp.asarray(rng.standard_normal((4096, 192)), jnp.bfloat16)
    )

    @jax.jit
    def step(ids):
        rows = base[ids]
        return rows, jnp.argsort(rows.sum(-1))[:, None] + jnp.zeros(
            (1, 24), jnp.int32
        )

    ids0 = jnp.asarray(rng.integers(0, 4096, (512,)).astype(np.int32))
    r0, a0 = step(ids0)
    np.asarray(r0), np.asarray(a0)  # warm

    samples = []
    bytes_per_round = 512 * 4 + 512 * 24 * 4 + 512 * 192 * 2
    t0 = time.time()
    for i in range(rounds):
        ids = jnp.asarray(rng.integers(0, 4096, (512,)).astype(np.int32))
        rows, adj = step(ids)
        np.asarray(rows)
        np.asarray(adj)
        if i % 10 == 0:
            gc.collect()
            samples.append((i, rss_kb()))
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass
    trimmed = rss_kb()

    # no Python-level retention: every jax/numpy array above is local
    live = [
        o
        for o in gc.get_objects()
        if isinstance(o, np.ndarray) and o.nbytes > 1 << 20
    ]
    assert not live, f"unexpected live arrays: {[o.shape for o in live]}"

    xs = np.asarray([s[0] for s in samples], np.float64)
    ys = np.asarray([s[1] for s in samples], np.float64)
    slope = float(np.polyfit(xs, ys, 1)[0])  # KB per round
    print(
        f"rounds={rounds} transfers~{bytes_per_round/1024:.0f} KB/round "
        f"wall={time.time()-t0:.0f}s"
    )
    print(f"rss start={ys[0]:.0f} KB end={ys[-1]:.0f} KB trimmed={trimmed} KB")
    print(
        f"rss slope = {slope:.1f} KB/round "
        f"({slope*1024/bytes_per_round:.3f} KB retained per KB transferred)"
    )
    print("zero live >1MB numpy arrays: OK")


if __name__ == "__main__":
    main()
