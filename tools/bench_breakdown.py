import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from lidal_tpu.tpu_init import setup
setup()
from lidal_tpu.data.pipeline import prepare_eval_batch
from lidal_tpu.models import MinkUNet
from bench import synthetic_sk_frame

rng = np.random.default_rng(0)
B, P = 4, 131072
caps = (131072, 49152, 16384, 6144, 2048)
xyz = np.zeros((B, P, 3), np.float32); sig = np.zeros((B, P), np.float32); valid = np.zeros((B, P), bool)
for b in range(B):
    x, s = synthetic_sk_frame(rng, 120000)
    xyz[b, :120000], sig[b, :120000], valid[b, :120000] = x, s, True
xyz_j, sig_j, valid_j = jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid)
keys = jax.random.split(jax.random.PRNGKey(0), B)

def t_pull(name, fn, *args, iters=5):
    fn_j = jax.jit(fn)
    x = fn_j(*args); float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + fn_j(*args).ravel()[0].astype(jnp.float32)
    float(acc)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:9.1f} ms", flush=True)

def prep(keys):
    eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps)
    return eb.feats
t_pull("prepare_eval_batch B=4 (plan)", prep, keys)

eb = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps)
model = MinkUNet(num_classes=19)
variables = jax.jit(model.init, static_argnames=("train",))(jax.random.PRNGKey(1), eb.feats, eb.plan, train=False)
def fwd(v, f):
    return model.apply(v, f, eb.plan, train=False)[0]
t_pull("MinkUNet fwd B=4 (fixed plan)", fwd, variables, eb.feats)
