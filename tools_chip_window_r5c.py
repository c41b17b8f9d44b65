"""Third round-5 quiet-chip window: text e2e combos + leak reuse bisect.

The r5b window's text e2e crashed on a format bug (fixed) and its leak
bisect found the RSS slope tracks uploaded bytes when every round
uploads a FRESH host array (rebuffer 48 KB up -> 49.2 KB/round leak;
upload 2 KB -> 2.3; fetch/gather 0).  The round-4 repro that cleared
raw transfers reused the same host arrays — so this window A/Bs
fresh-vs-reused staging buffers, which if confirmed is a complete
build-loop workaround (stable staging arrays instead of process
recycling).  Budgeted ~15 min of the build's chip time.
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
        for m in ("rebuffer", "rebuffer_reuse", "upload_reuse"):
            run(["tools_repro_tunnel_leak_bisect.py", m, "400"],
                "/tmp/leak_bisect_r5c.log", 600)
        run(["tools_profile_text_e2e.py"], "/tmp/text_e2e_r5c.log", 1500)
    finally:
        release()
        print("lease released", flush=True)


if __name__ == "__main__":
    main()
