import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from lidal_tpu.ops.pallas_conv import subm_conv_pallas
from lidal_tpu.ops.conv import subm_conv

rng = np.random.default_rng(0)
n, m, K, cin, cout = 131072, 131072, 27, 32, 32
feats = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
base = np.sort(rng.choice(n, m, replace=False)).astype(np.int32)
cols = []
for k in range(K):
    c = np.clip(base + rng.integers(-600, 600), 0, n - 1).astype(np.int32)
    c.sort()
    cols.append(c)
nbr = jnp.asarray(np.stack(cols, 1))
w = jnp.asarray(rng.normal(size=(K, cin, cout)).astype(np.float32) * 0.1)

# correctness vs XLA path
outp = subm_conv_pallas(feats, w, nbr)
feats_ext = jnp.concatenate([feats, jnp.zeros((1, cin))])
outx = subm_conv(feats, w, nbr)
a, b = np.asarray(outp), np.asarray(outx)
rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
print("pallas vs xla rel err:", rel, flush=True)

def t_pull(name, fn, iters=20):
    x = fn(); float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for _ in range(iters):
        acc = acc + fn()[0, 0]
    float(acc)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms", flush=True)

t_pull("pallas subm_conv 131k c32->32", lambda: subm_conv_pallas(feats, w, nbr))
t_pull("xla subm_conv 131k c32->32", lambda: subm_conv(feats, w, nbr))
# larger channels (decoder shape)
cin2 = cout2 = 96
feats2 = jnp.asarray(rng.normal(size=(n, cin2)).astype(np.float32))
w2 = jnp.asarray(rng.normal(size=(K, cin2, cout2)).astype(np.float32) * 0.05)
t_pull("pallas subm_conv 131k c96->96", lambda: subm_conv_pallas(feats2, w2, nbr))
t_pull("xla subm_conv 131k c96->96", lambda: subm_conv(feats2, w2, nbr))
