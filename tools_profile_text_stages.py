"""Text-tower per-stage marginal-cost profile at S=64 (VERDICT r4 #2).

Decomposes one SO400M text layer (bs=256, S=64, D=1152, H=16, Dh=72,
MLP=4304) into its stages on the real chip, then times the candidate
replacements:

  XLA baseline stages (what models/siglip._encoder runs today, minus
  attention routing):
    ln            LayerNorm (256,64,1152)
    qkv_sep       3 separate dense projections (the _attn layout)
    qkv_packed    one (16384,1152)@(1152,3456) matmul
    attn_pallas2  fused_mha_pallas hpp=2 (the current S=64 route)
    attn_pallasN  hpp sweep 4/8/16/32 (fewer, fatter programs)
    attn_xla      mha_xla (scores round-trip HBM)
    o_proj        dense (16384,1152)@(1152,1152)
    mlp           XLA gelu MLP
  Fused-row candidates (sequence-agnostic kernels on a (16,1024,1152)
  row view — LayerNorm/matmul/MLP are per-row, so the reshape is free
  and exact):
    f_ln_qkv      ln_matmul packed QKV, resident weight
    f_o_res       matmul_residual o-proj + residual add
    f_ln_mlp      ln_mlp_residual resident (image-tower config)
  Whole-layer:
    layer_xla     current _encoder step (1 layer)
    layer_fused   ln_matmul QKV -> best pallas attention -> ...
                  (assembled in models/siglip if the stages win)

Timing: chain 11 dispatches, fetch once, subtract a 1-dispatch run —
the tunneled backend pipelines dispatches, so (t11 - t1)/10 is device
time per call (same methodology as tools_profile_text_roofline.py).
"""

import sys, time, os, json
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax
import jax.numpy as jnp

from meme_search_engine_tpu.models import siglip
from meme_search_engine_tpu.ops.attention import fused_mha_pallas, mha_xla
from meme_search_engine_tpu.ops.fused import (
    ln_matmul,
    ln_mlp_residual,
    matmul_residual,
)

B, S, D, H, MLPD = 256, 64, 1152, 16, 4304
DH = D // H
ROWS_B, ROWS_S = 16, 1024  # row view: 16 x 1024 rows == 256 x 64

rng = np.random.default_rng(0)
dt = jnp.bfloat16
x = jax.device_put(jnp.asarray(rng.standard_normal((B, S, D)), dt))
g = jax.device_put(jnp.asarray(rng.standard_normal(D), dt))
bb = jax.device_put(jnp.asarray(rng.standard_normal(D), dt))
wq = jax.device_put(jnp.asarray(rng.standard_normal((D, D)) * 0.02, dt))
wk = jax.device_put(jnp.asarray(rng.standard_normal((D, D)) * 0.02, dt))
wv = jax.device_put(jnp.asarray(rng.standard_normal((D, D)) * 0.02, dt))
wo = jax.device_put(jnp.asarray(rng.standard_normal((D, D)) * 0.02, dt))
bq = jax.device_put(jnp.asarray(rng.standard_normal(D) * 0.02, dt))
w1 = jax.device_put(jnp.asarray(rng.standard_normal((D, MLPD)) * 0.02, dt))
b1 = jax.device_put(jnp.asarray(rng.standard_normal(MLPD) * 0.02, dt))
w2 = jax.device_put(jnp.asarray(rng.standard_normal((MLPD, D)) * 0.02, dt))
b2 = jax.device_put(jnp.asarray(rng.standard_normal(D) * 0.02, dt))
wqkv = jnp.concatenate([wq, wk, wv], axis=1)
bqkv = jnp.concatenate([bq, bq, bq])
q4 = jax.device_put(jnp.asarray(rng.standard_normal((B, S, H, DH)) * 0.3, dt))
k4 = jax.device_put(jnp.asarray(rng.standard_normal((B, S, H, DH)) * 0.3, dt))
v4 = jax.device_put(jnp.asarray(rng.standard_normal((B, S, H, DH)) * 0.3, dt))
xr = x.reshape(ROWS_B, ROWS_S, D)


def bench(fn, *args, iters=11):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(lambda a: np.asarray(a), out)  # compile+warm

    def trun(n):
        t0 = time.perf_counter()
        o = f(*args)
        for _ in range(n - 1):
            o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0][(0,) * jax.tree_util.tree_leaves(o)[0].ndim])
        return time.perf_counter() - t0

    trun(1)
    t1 = min(trun(1) for _ in range(3))
    tn = min(trun(iters) for _ in range(2))
    return (tn - t1) / (iters - 1) * 1e3  # ms


report = {}


def rec(name, ms):
    report[name] = round(ms, 3)
    print(f"{name:16s} {ms:8.3f} ms", flush=True)


p_ln = {"g": g, "b": bb}
rec("ln", bench(lambda a: siglip._layer_norm(a, p_ln), x))
rec(
    "qkv_sep",
    bench(
        lambda a: (
            jnp.dot(a, wq, preferred_element_type=jnp.float32).astype(dt),
            jnp.dot(a, wk, preferred_element_type=jnp.float32).astype(dt),
            jnp.dot(a, wv, preferred_element_type=jnp.float32).astype(dt),
        ),
        x,
    ),
)
rec(
    "qkv_packed",
    bench(
        lambda a: jnp.dot(
            a, wqkv, preferred_element_type=jnp.float32
        ).astype(dt),
        x,
    ),
)
rec("attn_xla", bench(lambda a, b_, c: mha_xla(a, b_, c), q4, k4, v4))
for hpp in (2, 4, 8, 16, 32):
    rec(
        f"attn_pallas{hpp}",
        bench(
            lambda a, b_, c, _h=hpp: fused_mha_pallas(a, b_, c, hpp=_h),
            q4, k4, v4,
        ),
    )
rec(
    "o_proj",
    bench(
        lambda a: jnp.dot(
            a.reshape(B * S, D), wo, preferred_element_type=jnp.float32
        ).astype(dt),
        x,
    ),
)
p_mlp = {"fc1": {"w": w1, "b": b1}, "fc2": {"w": w2, "b": b2}}
rec("mlp_xla", bench(lambda a: siglip._mlp(a, p_mlp), x))

# fused-row candidates (row view (16,1024,D)); each geometry can be
# VMEM-illegal (the packed 3456-wide output block is fat) — record and
# skip those
def try_rec(name, thunk):
    try:
        rec(name, thunk())
    except Exception as e:
        report[name] = f"fail: {str(e)[:120]}"
        print(f"{name:16s} FAIL {str(e)[:100]}", flush=True)


for nq_ in (4, 8):
    try_rec(
        f"f_ln_qkv_nq{nq_}",
        lambda _n=nq_: bench(
            lambda a: ln_matmul(a, g, bb, wqkv, bqkv, nq=_n), xr
        ),
    )
try_rec(
    "f_o_res",
    lambda: bench(lambda a, r: matmul_residual(a, wo, bq, r, nq=2), xr, xr),
)
for mh_, nq_ in ((2176, 2), (2176, 4), (4352, 2)):
    try_rec(
        f"f_ln_mlp_r_mh{mh_}_nq{nq_}",
        lambda _m=mh_, _n=nq_: bench(
            lambda a: ln_mlp_residual(
                a, g, bb, w1, b1, w2, b2, nq=_n, mh=_m, resident=True
            ),
            xr,
        ),
    )

# whole current layer for reference
p_blk = {
    "ln1": p_ln,
    "ln2": p_ln,
    "attn": {
        "q": {"w": wq, "b": bq}, "k": {"w": wk, "b": bq},
        "v": {"w": wv, "b": bq}, "o": {"w": wo, "b": bq},
    },
    "mlp": p_mlp,
}


def layer_xla(a):
    a = a + siglip._attn(siglip._layer_norm(a, p_blk["ln1"]), p_blk["attn"], H)
    a = a + siglip._mlp(siglip._layer_norm(a, p_blk["ln2"]), p_blk["mlp"])
    return a


rec("layer_current", bench(layer_xla, x))

flops_layer = 2 * B * S * (4 * D * D + 2 * S * D + 2 * D * MLPD)
print(f"\nlayer FLOPs: {flops_layer/1e9:.1f} GFLOP; "
      f"floor at 197 TFLOP/s = {flops_layer/197e12*1e3:.2f} ms")
print(json.dumps(report))
