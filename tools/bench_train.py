import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from lidal_tpu.tpu_init import setup
setup()
from lidal_tpu.data.pipeline import prepare_train_batch
from lidal_tpu.models import MinkUNet
from lidal_tpu.runtime.train import init_state, make_optimizer, make_train_step
from bench import synthetic_sk_frame

rng = np.random.default_rng(0)
B, P = 4, 131072
caps = (131072, 49152, 16384, 6144, 2048)
xyz = np.zeros((B, P, 3), np.float32); sig = np.zeros((B, P), np.float32); valid = np.zeros((B, P), bool)
labels = np.full((B, P), 255, np.int32)
for b in range(B):
    x, s = synthetic_sk_frame(rng, 120000)
    xyz[b, :120000], sig[b, :120000], valid[b, :120000] = x, s, True
    labels[b, :120000] = rng.integers(0, 19, 120000)
keys = jax.random.split(jax.random.PRNGKey(0), B)
tb = prepare_train_batch(keys, jnp.asarray(xyz), jnp.asarray(sig), jnp.asarray(valid), jnp.asarray(labels), level_caps=caps)
model = MinkUNet(num_classes=19)
tx = make_optimizer()
state = init_state(model, jax.random.PRNGKey(1), tb, tx)
step = jax.jit(make_train_step(model, tx, with_points=False))
state, loss = step(state, tb, jax.random.PRNGKey(2))
print("first loss:", float(loss), flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    state, loss = step(state, tb, jax.random.PRNGKey(3+rep))
    _ = float(loss)
    dt = time.perf_counter()-t0
    print(f"train step rep{rep}: {dt:.2f}s -> {B*120000/dt/1e3:.0f}k pts/s", flush=True)
