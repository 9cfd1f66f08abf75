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
model = MinkUNet(num_classes=19)
keys = jax.random.split(jax.random.PRNGKey(0), B)
eb0 = prepare_eval_batch(keys, xyz_j, sig_j, valid_j, level_caps=caps)
variables = jax.jit(model.init, static_argnames=("train",))(jax.random.PRNGKey(1), eb0.feats, eb0.plan, train=False)

@jax.jit
def infer(variables, k):
    eb = prepare_eval_batch(k, xyz_j, sig_j, valid_j, level_caps=caps)
    logits, _ = model.apply(variables, eb.feats, eb.plan, train=False)
    return logits.sum()

s0 = float(infer(variables, keys))
for rep in range(3):
    t0 = time.perf_counter()
    s = float(infer(variables, jax.random.split(jax.random.PRNGKey(rep+2), B)))
    print(f"prep+fwd single call rep{rep}: {time.perf_counter()-t0:.2f}s", flush=True)
