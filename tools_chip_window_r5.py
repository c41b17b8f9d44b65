"""One-shot quiet-chip window for round-5 measurements.

Acquires the TPU lease (pausing the live 1e7 scale_bench build at its
next safe point), then runs, on the quiet chip and mostly-quiet host:

  1. tools_profile_text_stages.py  -> /tmp/text_stages_r5.log
  2. tools_profile_wire.py         -> /tmp/wire_r5.log

and releases the lease so the build resumes.  Batched into one window
so the build pays a single interruption.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from meme_search_engine_tpu.utils.tpu_lease import acquire  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def run(script, log_path, timeout):
    t0 = time.time()
    with open(log_path, "w") as f:
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, script)],
            stdout=f, stderr=subprocess.STDOUT, timeout=timeout,
        )
    print(f"{script}: rc={p.returncode} in {time.time()-t0:.0f}s", flush=True)
    return p.returncode


def main():
    print("waiting for lease...", flush=True)
    release = acquire(timeout_s=3000.0, log=lambda m: print(m, flush=True))
    print("lease acquired", flush=True)
    try:
        run("tools_profile_text_stages.py", "/tmp/text_stages_r5.log", 1500)
        run("tools_profile_wire.py", "/tmp/wire_r5.log", 1200)
    finally:
        release()
        print("lease released", flush=True)


if __name__ == "__main__":
    main()
