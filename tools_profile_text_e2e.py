"""Text-tower end-to-end A/B over encoder routing combos (round 5).

The per-stage profile (tools_profile_text_stages.py, quiet chip) found
two stage-level wins the first fused-combo A/B never tried end-to-end:
hpp=32 attention (0.410 ms vs 1.568 XLA standalone) and the
1024-row/nq=8 fused QKV view (0.437 ms vs 2.08 ln+qkv) — the committed
A/B predates the hpp sweep and ran hpp=16 with the 256-row/nq=1 view.
This driver measures encode_text at bs=256 (54.6% MFU baseline) for
each routing combo in a FRESH subprocess (the env knobs are read at
trace time, so a cached jit would mask them), same timing methodology
as tools_profile_text_roofline.py (chain 11 dispatches, fetch once,
subtract a 1-dispatch run).

Run inside a tpu_lease window (chip + host quiet).
"""

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CHILD = r"""
import sys, time, os
import numpy as np
sys.path.insert(0, %(here)r)
import jax
from meme_search_engine_tpu.models import siglip

cfg = siglip.SO400M_14_384
params = siglip.init_params(jax.random.PRNGKey(0), cfg)
fn = jax.jit(lambda p, t: siglip.encode_text(p, t, cfg))
rng = np.random.default_rng(0)
tb = int(os.environ.get("E2E_BS", "256"))
tokens = jax.device_put(
    rng.integers(0, cfg.vocab_size, (tb, cfg.text_len)).astype(np.int32)
)
np.asarray(fn(params, tokens))  # compile+warm

def trun(iters):
    t0 = time.perf_counter()
    out = fn(params, tokens)
    for _ in range(iters - 1):
        out = fn(params, tokens)
    float(out[0, 0])
    return time.perf_counter() - t0

trun(1)
t1 = min(trun(1) for _ in range(2))
tn = trun(11)
per_batch = (tn - t1) / 10
print("RESULT %.3f" % (per_batch * 1e3), flush=True)
"""

COMBOS = [
    ("xla_route", {}),
    ("attn_hpp16", {"MSE_TEXT_FUSED": "1", "MSE_TEXT_ATTN_HPP": "16"}),
    ("attn_hpp32", {"MSE_TEXT_FUSED": "1", "MSE_TEXT_ATTN_HPP": "32"}),
    ("attn_hpp64", {"MSE_TEXT_FUSED": "1", "MSE_TEXT_ATTN_HPP": "64"}),
    (
        "attn32_qkv8",
        {
            "MSE_TEXT_FUSED": "1",
            "MSE_TEXT_ATTN_HPP": "32",
            "MSE_TEXT_QKV": "fused",
            "MSE_TEXT_RQ": "1024",
            "MSE_TEXT_NQ": "8",
        },
    ),
    (
        "attn32_qkv8_o",
        {
            "MSE_TEXT_FUSED": "1",
            "MSE_TEXT_ATTN_HPP": "32",
            "MSE_TEXT_QKV": "fused",
            "MSE_TEXT_O": "fused",
            "MSE_TEXT_RQ": "1024",
            "MSE_TEXT_NQ": "8",
        },
    ),
]


def main():
    results = {}
    for name, env in COMBOS:
        child_env = dict(os.environ, **env)
        try:
            out = subprocess.run(
                [sys.executable, "-c",
                 CHILD.replace("%(here)r", repr(HERE))],
                capture_output=True, text=True, timeout=900,
                env=child_env, cwd=HERE,
            )
            line = [
                ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")
            ]
            if line:
                ms = float(line[0].split()[1])
                results[name] = ms
                print(f"{name:16s} {ms:8.1f} ms/batch "
                      f"({256e3 / ms:7.0f} texts/s)", flush=True)
            else:
                results[name] = f"fail: {out.stdout[-200:]} {out.stderr[-300:]}"
                print(f"{name:16s} FAIL", flush=True)
        except subprocess.TimeoutExpired:
            results[name] = "timeout"
            print(f"{name:16s} TIMEOUT", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
