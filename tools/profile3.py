"""Trustworthy timing: chained deps + tiny host pull to force completion."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def t_pull(name, fn, x0, *args, iters=3):
    fn_j = jax.jit(fn)
    x = fn_j(x0, *args)
    float(jnp.asarray(x).ravel()[0])  # drain queue
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn_j(x, *args)
    _ = float(jnp.asarray(x).ravel()[0])  # forces the whole chain
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:10.2f} ms/call", flush=True)
    return dt

def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N, K, C = 131072, 27, 32
    feats = jnp.asarray(rng.normal(size=(N+1, C)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, N+1, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K*C, C)).astype(np.float32))

    def gm_step(f, i, ww):
        out = f[i].reshape(N, K*C) @ ww
        return jnp.concatenate([out, f[-1:]], 0)
    t_pull("gather+matmul f32 131k x 27 x 32", gm_step, feats, nbr, w)

    def mm_only(f, ww):
        out = f[:N].repeat(1, axis=0)  # no-op keep shape
        out = (f[:N, :].reshape(N, C) @ ww[:C, :])  # [N, C]
        return jnp.concatenate([out, f[-1:]], 0)
    t_pull("matmul only 131k x 32 x 32", mm_only, feats, w)

    def gather_only(f, i):
        g = f[i]        # [N, 27, C]
        return jnp.concatenate([g.sum(1), f[-1:]], 0)
    t_pull("gather 131k x 27 rows + sum", gather_only, feats, nbr)

    hi0 = jnp.asarray(np.sort(rng.integers(0, 2**28, N)).astype(np.int32))
    lo0 = jnp.asarray(rng.integers(0, 16384, N).astype(np.int32))
    def sort_step(h, l):
        s = jax.lax.sort((h ^ 1, l), num_keys=2)
        return s[0]
    t_pull("lax.sort 131k x2", lambda h, l: sort_step(h, l), hi0, lo0)

    from lidal_tpu.ops.hashing import lookup
    from lidal_tpu.ops.merge_lookup import lookup_sorted
    from lidal_tpu.ops.voxelize import unique_voxels
    coords = rng.integers(0, 900, size=(N, 3)).astype(np.int32)
    uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.ones(N, bool), N)
    qh = jnp.where(uv.valid, uv.key_hi + jnp.int32(1 << 14), 2**31 - 1)
    ql = jnp.where(uv.valid, uv.key_lo + 1, 2**31 - 1)
    t_pull("binary lookup 131k", lambda a, th, tl, b, c: lookup(th, tl, b + (a[0] & 0), c),
           jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)
    for tile in (256, 1024):
        t_pull(f"merge lookup tile={tile}",
               lambda a, th, tl, b, c, t=tile: lookup_sorted(th, tl, b + (a[0] & 0), c, tile=t),
               jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)

    from lidal_tpu.ops.kernel_map import build_subm_nbr
    t_pull("build_subm_nbr 26 offsets", lambda a, c, v: build_subm_nbr(c + (a[:, :1] & 0), v)[:, :3],
           jnp.zeros((N, 3), jnp.int32), uv.coords, uv.valid, iters=2)

    from lidal_tpu.ops.conv import subm_conv
    w3 = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32))
    def conv_step(f, ww, i):
        out = subm_conv(f[:N], ww, i)
        return jnp.concatenate([out, f[-1:]], 0)
    t_pull("subm_conv 131k c32->c32", conv_step, feats, w3, nbr)

if __name__ == "__main__":
    main()
