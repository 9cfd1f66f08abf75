import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from lidal_tpu.tpu_init import setup
setup()
from lidal_tpu.ops.voxelize import unique_voxels
from lidal_tpu.ops.merge_lookup import _diagonal_split
from lidal_tpu.ops.gather import slice_windows, take_values
from lidal_tpu.ops.hashing import key_less, SENTINEL_KEY

def t_pull(name, fn, *args, iters=20):
    fn_j = jax.jit(fn)
    x = fn_j(*args); float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + fn_j(*args).ravel()[0].astype(jnp.float32)
    float(acc)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)

rng = np.random.default_rng(0)
N = 131072
coords = rng.integers(0, 900, size=(N, 3)).astype(np.int32)
uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.ones(N, bool), N)
qh = jnp.where(uv.valid, uv.key_hi + jnp.int32(1 << 14), 2**31 - 1)
ql = jnp.where(uv.valid, uv.key_lo + 1, 2**31 - 1)

D = 512
n = m = N
d_tiles = (n + m + D - 1) // D
diag = jnp.minimum(jnp.arange(d_tiles + 1, dtype=jnp.int32) * D, n + m)

t_pull("diag search", lambda th, tl, a, b: _diagonal_split(th, tl, a, b, diag).astype(jnp.int32),
       uv.key_hi, uv.key_lo, qh, ql)

a = _diagonal_split(uv.key_hi, uv.key_lo, qh, ql, diag)
b = diag - a
pad = jnp.full((D,), 2**31-1, jnp.int32)
thp = jnp.concatenate([uv.key_hi, pad]); tlp = jnp.concatenate([uv.key_lo, pad])
qhp = jnp.concatenate([qh, pad]); qlp = jnp.concatenate([ql, pad])

t_pull("4x slice_windows [T,512]", lambda x1,x2,x3,x4,aa,bb: (
    slice_windows(x1, aa[:-1], D)[0] + slice_windows(x2, aa[:-1], D)[0] +
    slice_windows(x3, bb[:-1], D)[0] + slice_windows(x4, bb[:-1], D)[0]),
    thp, tlp, qhp, qlp, a, b)

twh = slice_windows(thp, a[:-1], D); twl = slice_windows(tlp, a[:-1], D)
qwh = slice_windows(qhp, b[:-1], D); qwl = slice_windows(qlp, b[:-1], D)

def cmp_rank(twh, twl, qwh, qwl, aa):
    less = key_less(twh[:, None, :], twl[:, None, :], qwh[:, :, None], qwl[:, :, None])
    return aa[:-1, None] + less.sum(axis=-1).astype(jnp.int32)
t_pull("compare+rank [T,512,512]", cmp_rank, twh, twl, qwh, qwl, a)

rank = cmp_rank(twh, twl, qwh, qwl, a)
def assemble(rank, bb):
    j = jnp.arange(m, dtype=jnp.int32)
    t_of = jnp.searchsorted(bb[1:], j, side="right").astype(jnp.int32)
    t_of = jnp.minimum(t_of, d_tiles - 1)
    flat = t_of * D + (j - bb[t_of])
    return take_values(rank.reshape(-1), flat, sorted_unique=True)
t_pull("assemble (searchsorted+gather)", assemble, rank, b)

from lidal_tpu.ops.merge_lookup import lookup_sorted
for tile in (128, 512):
    t_pull(f"full lookup_sorted tile={tile}",
           lambda th, tl, x, y, t=tile: lookup_sorted(th, tl, x, y, tile=t),
           uv.key_hi, uv.key_lo, qh, ql)
