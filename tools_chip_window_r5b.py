"""Second round-5 quiet-chip window: text e2e combos, pipelined wire, leak bisect.

Same pattern as tools_chip_window_r5.py: acquire the TPU lease (pauses
the live 1e7 build at its next safe point), run the batched
measurements, release.  Budgeted ~15 min so the build loses <2% of its
remaining coverage.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from meme_search_engine_tpu.utils.tpu_lease import acquire  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def run(argv, log_path, timeout):
    t0 = time.time()
    with open(log_path, "a") as f:
        p = subprocess.run(
            [sys.executable] + argv,
            stdout=f, stderr=subprocess.STDOUT, timeout=timeout, cwd=HERE,
        )
    print(f"{argv}: rc={p.returncode} in {time.time()-t0:.0f}s", flush=True)
    return p.returncode


def main():
    print("waiting for lease...", flush=True)
    release = acquire(timeout_s=3000.0, log=lambda m: print(m, flush=True))
    print("lease acquired", flush=True)
    try:
        run(["tools_profile_text_e2e.py"], "/tmp/text_e2e_r5.log", 1500)
        run(["tools_profile_wire.py"], "/tmp/wire_r5b.log", 900)
        for m in ("upload", "fetch", "gather_jit", "rebuffer",
                  "rebuffer_donate", "full"):
            run(["tools_repro_tunnel_leak_bisect.py", m, "400"],
                "/tmp/leak_bisect_r5.log", 600)
    finally:
        release()
        print("lease released", flush=True)


if __name__ == "__main__":
    main()
