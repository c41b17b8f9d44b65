"""glibc malloc arena control for long-running build processes.

The 1e7/1e8 graph builds grow host RSS ~18 KB/node-insert even though
no Python-visible object retains the memory (BENCHMARKS.md "Build-loop
host RSS" entry). The round-4 repro (tools_repro_tunnel_leak.py) showed
raw tunnel transfers retain nothing and that a single malloc_trim(0)
returned 223 MB of a 241 MB RSS to the OS — i.e. in the repro process
the growth was reclaimable glibc arena fragmentation, not a true leak.
The shard loop calls malloc_trim once per built shard (builds are
70-160 s each, the trim is sub-millisecond) as cheap insurance, but
the live 1e7 run measured the build's growth UNCHANGED with trim on
(~0.95 GB/shard, BENCHMARKS.md) — the build's retention is plugin-held
per dispatch, not arena.

The reference sidesteps this class of problem by being a short-lived
Rust process per shard (generate_index_shard.rs); our equivalent
process cap (--max-build-records) stays as the backstop for whatever
part of the growth is NOT trimmable.
"""

from __future__ import annotations

import ctypes

_libc = None


def malloc_trim() -> bool:
    """Release free glibc heap pages back to the OS. Safe no-op on
    non-glibc platforms. Returns True if memory was released."""
    global _libc
    try:
        if _libc is None:
            _libc = ctypes.CDLL("libc.so.6")
        return bool(_libc.malloc_trim(0))
    except Exception:
        return False


def rss_kb() -> int:
    """Current process resident set size in KB (0 if unreadable)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except Exception:
        pass
    return 0
