"""Resize-path embedding parity at SO400M shapes on the real TPU.

Two ingest paths exist for odd-sized images (SURVEY hard part 1):
  A) client resize: PIL Hamming (down) / Lanczos (up) to 384x384 on
     the host, exact-size uint8 to the device (common.rs:43-44 path);
  B) in-graph resize: raw uint8 to the device, XLA bilinear+antialias
     inside the jitted program (models/siglip.py preprocess_images).
This measures the cosine between the two paths' embeddings with
random-init SO400M weights (weights-independent drift bound: random
projections preserve relative perturbations; driver has no checkpoint).
Smooth photo-like content (band-limited sinusoids), the non-adversarial
case the test documents.
"""
import sys, time
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
import jax, jax.numpy as jnp
from meme_search_engine_tpu.models import siglip
from meme_search_engine_tpu.serving.preprocess import resize_for_embed

cfg = siglip.SO400M_14_384
print("init params...", flush=True)
params = siglip.init_params(jax.random.PRNGKey(0), cfg)


def smooth_image(h, w, seed):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        for _ in range(4):
            fy, fx = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img[..., c] += np.sin(2 * np.pi * (fy * yy / h + fx * xx / w) + ph)
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-6)
    return img.astype(np.uint8)


R = cfg.image_size
N = 8
for (h, w), kind in [((640, 480), "downscale"), ((1333, 777), "downscale"),
                     ((256, 192), "upscale")]:
    raw = np.stack([smooth_image(h, w, 100 + i) for i in range(N)])
    client = np.stack([resize_for_embed(im, (R, R)) for im in raw])
    t0 = time.time()
    e_client = np.asarray(siglip.encode_image(params, jnp.asarray(client), cfg))
    e_graph = np.asarray(siglip.encode_image(params, jnp.asarray(raw), cfg))
    cos = (e_client.astype(np.float32) * e_graph.astype(np.float32)).sum(-1)
    print(f"{h}x{w} ({kind}): cos min {cos.min():.5f} mean {cos.mean():.5f} "
          f"max {cos.max():.5f}  ({time.time()-t0:.0f}s incl compile)", flush=True)
