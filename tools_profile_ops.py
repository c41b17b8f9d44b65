import time, functools
import jax, jax.numpy as jnp, numpy as np
from meme_search_engine_tpu.ops.fused import ln_matmul, matmul_residual
from meme_search_engine_tpu.ops.attention import fat_vit_mha_packed, fat_width
from meme_search_engine_tpu.models import siglip

cfg = siglip.SO400M_14_384
B, S, D, M, H = 128, 736, 1152, 4304, 16
DH = D // H
C = fat_width(DH)
rng = np.random.default_rng(0)
bf = jnp.bfloat16

def sync(out):
    a = jax.tree.leaves(out)[0]
    return float(a[(0,) * a.ndim])

def timeit(fn, *args, n=10):
    sync(fn(*args))
    t0=time.perf_counter(); sync(fn(*args)); t1=time.perf_counter()-t0
    t0=time.perf_counter()
    for _ in range(n): out=fn(*args)
    sync(out)
    tn=time.perf_counter()-t0
    return (tn-t1)/(n-1)*1000

x = jnp.asarray(rng.standard_normal((B,S,D)), bf)
g = jnp.ones((D,)); b0 = jnp.zeros((D,))
wqkv = jnp.asarray(rng.standard_normal((D,3*H*C))*0.02, bf)
bqkv = jnp.zeros((3*H*C,))
w1 = jnp.asarray(rng.standard_normal((D,M))*0.02, bf)
b1 = jnp.zeros((M,))
w2 = jnp.asarray(rng.standard_normal((M,D))*0.02, bf)
b2 = jnp.zeros((D,))
wo = jnp.asarray(rng.standard_normal((D,D))*0.02, bf)
bo = jnp.zeros((D,))

t = timeit(functools.partial(ln_matmul, nq=4, k_mask=(729,H,C,DH)), x, g, b0, wqkv, bqkv)
print(f"ln+qkv(packed fat): {t:.2f} ms")

qkv = ln_matmul(x, g, b0, wqkv, bqkv, nq=4)
t = timeit(lambda q: fat_vit_mha_packed(q, H, DH), qkv)
print(f"fat attention: {t:.2f} ms")

attn_out = jnp.asarray(rng.standard_normal((B,S,D)), bf)
t = timeit(functools.partial(matmul_residual, nq=4), attn_out, wo, bo, x)
print(f"o-proj+residual: {t:.2f} ms")

@jax.jit
def xla_mlp(h, g, b0, w1, b1, w2, b2):
    xf = h.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True); v = jnp.square(xf-mu).mean(-1, keepdims=True)
    y = ((xf-mu)*jax.lax.rsqrt(v+1e-6)*g + b0).astype(h.dtype)
    z = jnp.dot(y, w1, preferred_element_type=jnp.float32) + b1
    z = jax.nn.gelu(z, approximate=True).astype(h.dtype)
    return h + (jnp.dot(z, w2, preferred_element_type=jnp.float32) + b2).astype(h.dtype)
t = timeit(xla_mlp, x, g, b0, w1, b1, w2, b2)
print(f"XLA ln+mlp+res: {t:.2f} ms")

@jax.jit
def mm(a, w): return jnp.dot(a, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
xf2 = x.reshape(B*S, D)
t1_ = timeit(mm, xf2, w1)
print(f"bare fc1 matmul: {t1_:.2f} ms ({2*B*S*D*M/t1_/1e9:.0f} TF/s)")
h2 = jnp.asarray(rng.standard_normal((B*S,M)), bf)
t2_ = timeit(mm, h2, w2)
print(f"bare fc2 matmul: {t2_:.2f} ms ({2*B*S*D*M/t2_/1e9:.0f} TF/s)")

blk = siglip.init_params(jax.random.PRNGKey(0), cfg)["img"]["blocks"]
@jax.jit
def full27(h, blocks):
    return siglip._encoder_fat(h, blocks, H, n_valid=729)
t = timeit(full27, x, blk)
print(f"27-block encoder: {t:.2f} ms ({t/27:.2f} ms/block)")
