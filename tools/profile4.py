import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def t_pull(name, fn, x0, *args, iters=20):
    fn_j = jax.jit(fn)
    x = fn_j(x0, *args)
    float(jnp.asarray(x).ravel()[0])
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn_j(x, *args)
    _ = float(jnp.asarray(x).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:10.2f} ms/call  ({iters} it)", flush=True)

def main():
    rng = np.random.default_rng(0)
    N, K, C = 131072, 27, 32
    feats = jnp.asarray(rng.normal(size=(N+1, C)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, N+1, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K*C, C)).astype(np.float32))

    t_pull("noop tiny (x+1)", lambda x: x + 1.0, jnp.zeros((8, 128)), iters=50)
    def mm_only(f, ww):
        out = f[:N, :].reshape(N, C) @ ww[:C, :]
        return jnp.concatenate([out, f[-1:]], 0)
    t_pull("matmul only 131k x 32 x 32", mm_only, feats, w, iters=30)
    def gm_step(f, i, ww):
        out = f[i].reshape(N, K*C) @ ww
        return jnp.concatenate([out, f[-1:]], 0)
    t_pull("gather+matmul 131k x27x32", gm_step, feats, nbr, w, iters=20)

    from lidal_tpu.ops.hashing import lookup
    from lidal_tpu.ops.merge_lookup import lookup_sorted
    from lidal_tpu.ops.voxelize import unique_voxels
    coords = rng.integers(0, 900, size=(N, 3)).astype(np.int32)
    uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.ones(N, bool), N)
    qh = jnp.where(uv.valid, uv.key_hi + jnp.int32(1 << 14), 2**31 - 1)
    ql = jnp.where(uv.valid, uv.key_lo + 1, 2**31 - 1)
    t_pull("binary lookup 131k", lambda a, th, tl, b, c: lookup(th, tl, b + (a[0] & 0), c),
           jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql, iters=20)
    t_pull("merge lookup tile=1024", lambda a, th, tl, b, c: lookup_sorted(th, tl, b + (a[0] & 0), c, tile=1024),
           jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql, iters=20)

    from lidal_tpu.ops.kernel_map import build_subm_nbr
    t_pull("build_subm_nbr 26 offsets", lambda a, c, v: build_subm_nbr(c + (a[:, :1] & 0), v)[:, :3],
           jnp.zeros((N, 3), jnp.int32), uv.coords, uv.valid, iters=10)

if __name__ == "__main__":
    main()
