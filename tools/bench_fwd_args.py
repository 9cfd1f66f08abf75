"""Forward with plan as jit ARGUMENTS (no constant folding) - honest fwd cost."""
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
keys = jax.random.split(jax.random.PRNGKey(0), B)
eb = prepare_eval_batch(keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid), level_caps=caps)
eb = jax.tree_util.tree_map(lambda x: jax.device_put(x), eb)
model = MinkUNet(num_classes=19)
variables = jax.jit(model.init, static_argnames=("train",))(jax.random.PRNGKey(1), eb.feats, eb.plan, train=False)

@jax.jit
def fwd(v, feats, plan):
    return model.apply(v, feats, plan, train=False)[0].sum()

s0 = float(fwd(variables, eb.feats, eb.plan))
for rep in range(3):
    t0 = time.perf_counter()
    s = float(fwd(variables, eb.feats, eb.plan))
    print(f"fwd (plan as args) rep{rep}: {time.perf_counter()-t0:.2f}s", flush=True)
