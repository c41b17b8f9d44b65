"""Minimal upstream-shaped repro: the tunneled TPU plugin retains host
RSS ~1:1 with bytes uploaded via device_put, forever.

Each round uploads one fresh 786 KB int32 array (a new host buffer —
the build's spill-record staging pattern) and fetches a scalar to
synchronise. Host RSS grows by ~the uploaded bytes per round and is
never returned: not Python-level (gc finds nothing), not glibc-arena
(malloc_trim recovers ~0), and reusing ONE preallocated host source
buffer does NOT stop it (see tools_repro_tunnel_leak_bisect.py
upload_reuse — the retention is per upload, not per buffer address).
On a non-tunneled backend the slope amortises to ~0 (allocator
warm-up only).

Run:  python tools_repro_plugin_upload_leak.py [rounds=200]
Measured here (axon tunnel, JAX 0.9, 150 rounds): slope 885 KB/round =
1.15x of uploaded bytes. CPU-backend control (same script under
jax.config.update("jax_platforms", "cpu")): 209 KB/round at 150 rounds
falling to 54 KB/round at 600 (0.07x — arena warm-up, not retention).
"""

import ctypes
import gc
import sys


def rss_kb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1])


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    import jax
    import numpy as np

    rng = np.random.default_rng(0)
    jax.device_put(np.zeros(8, np.int32)).block_until_ready()  # init
    upload_kb = 4096 * 48 * 4 / 1024.0
    r0 = rss_kb()
    for i in range(rounds):
        x = jax.device_put(rng.integers(0, 1 << 30, (4096, 48), np.int32))
        float(x[0, 0])  # host fetch = true sync on the tunnel
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except OSError:
        pass
    slope = (rss_kb() - r0) / rounds
    print(f"uploaded {upload_kb:.0f} KB/round x {rounds}; "
          f"RSS slope {slope:.0f} KB/round "
          f"({slope / upload_kb:.2f}x of uploaded bytes)")


if __name__ == "__main__":
    main()
