"""Text-tower roofline: bs sweep, exact FLOPs, MFU vs v5e peak."""
import sys, time
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
import jax, jax.numpy as jnp
from meme_search_engine_tpu.models import siglip

cfg = siglip.SO400M_14_384
params = siglip.init_params(jax.random.PRNGKey(0), cfg)

w, mlp, s, depth = cfg.text_width, cfg.text_mlp_dim, cfg.text_len, cfg.text_depth
# per-text FLOPs: QKVO 4 w^2 per token, attn scores+values 2*2*s*w per
# token, MLP 2*w*mlp per token; x2 for MAC; + final head (MAP head? text
# tower pools) — count the dominant trunk only, report both.
per_tok = 2 * (4 * w * w + 2 * s * w + 2 * w * mlp)
per_text = per_tok * s * depth
print(f"trunk FLOPs/text = {per_text/1e9:.2f} GFLOP (w={w} mlp={mlp} s={s} d={depth})")
PEAK = 197e12  # v5e bf16

fn = jax.jit(lambda p, t: siglip.encode_text(p, t, cfg))
rng = np.random.default_rng(0)
for tb in (64, 128, 256, 512, 1024):
    tokens = jax.device_put(rng.integers(0, cfg.vocab_size, (tb, cfg.text_len)).astype(np.int32))
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
    txt_s = tb / per_batch
    mfu = txt_s * per_text / PEAK
    print(f"bs {tb:5d}: {per_batch*1e3:7.1f} ms/batch  {txt_s:7.1f} texts/s  "
          f"MFU {mfu:5.1%}", flush=True)
