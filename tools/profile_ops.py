"""Isolate op-level costs on the TPU with dependency-chained timing."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def timeit_chained(name, fn, x0, *args, iters=10):
    """fn(x, *args) -> array same shape as x (or reduced); chained to serialize."""
    fn_j = jax.jit(fn)
    x = fn_j(x0, *args); jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn_j(x, *args)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt

def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    N, K, C = 131072, 27, 32

    feats = jnp.asarray(rng.normal(size=(N+1, C)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, N+1, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K*C, C)).astype(np.float32))

    # chain: gather then reduce back to feats shape
    def g_step(f, i):
        g = f[i]                       # [N, K, C]
        return jnp.concatenate([g.mean(1), f[-1:]], 0)
    timeit_chained("gather [131k,27,32] + mean", g_step, feats, nbr)

    def gm_step(f, i, ww):
        out = f[i].reshape(N, K*C) @ ww   # [N, C]
        return jnp.concatenate([out, f[-1:]], 0)
    timeit_chained("gather+matmul f32", gm_step, feats, nbr, w)

    def gm_bf16(f, i, ww):
        out = (f[i].reshape(N, K*C).astype(jnp.bfloat16) @ ww.astype(jnp.bfloat16)).astype(jnp.float32)
        return jnp.concatenate([out, f[-1:]], 0)
    timeit_chained("gather+matmul bf16", gm_bf16, feats, nbr, w)

    hi0 = jnp.asarray(np.sort(rng.integers(0, 2**28, N)).astype(np.int32))
    lo0 = jnp.asarray(rng.integers(0, 16384, N).astype(np.int32))
    def sort_step(hi, lo):
        s = jax.lax.sort((hi, lo), num_keys=2)
        return s[0] ^ 1, s[1]
    # chained via tuple: simpler to chain only hi
    fn_j = jax.jit(sort_step)
    h, l = fn_j(hi0, lo0); jax.block_until_ready(h)
    t0 = time.perf_counter()
    for _ in range(10):
        h, l = fn_j(h, l)
    jax.block_until_ready(h)
    print(f"{'lax.sort 131k x2':46s} {(time.perf_counter()-t0)/10*1e3:9.2f} ms", flush=True)

    from lidal_tpu.ops.hashing import lookup
    from lidal_tpu.ops.merge_lookup import lookup_sorted
    from lidal_tpu.ops.voxelize import unique_voxels
    coords = rng.integers(0, 900, size=(N, 3)).astype(np.int32)
    uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.ones(N, bool), N)
    jax.block_until_ready(uv.key_hi)

    d_hi, d_lo = jnp.int32((1<<14)+0), jnp.int32(1)
    qh = jnp.where(uv.valid, uv.key_hi + d_hi, 2**31-1)
    ql = jnp.where(uv.valid, uv.key_lo + d_lo, 2**31-1)

    def bin_step(acc, th, tl, qh_, ql_):
        r = lookup(th, tl, qh_ + (acc[0] & 0), ql_)
        return r
    timeit_chained("binary lookup 1 offset", bin_step, jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)
    for tile in (128, 256, 512):
        def mer_step(acc, th, tl, qh_, ql_, t=tile):
            return lookup_sorted(th, tl, qh_ + (acc[0] & 0), ql_, tile=t)
        timeit_chained(f"merge lookup tile={tile}", mer_step, jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)

    from lidal_tpu.ops.kernel_map import build_subm_nbr, build_unet_plan_frame
    def nbr_step(acc, c, v):
        return build_subm_nbr(c + (acc[:, :1] & 0), v)[:, :3]
    timeit_chained("build_subm_nbr (26 offsets)", nbr_step, jnp.zeros((N, 3), jnp.int32), uv.coords, uv.valid, iters=5)

    caps = (131072, 49152, 16384, 6144, 2048)
    def plan_step(acc, c, v):
        p = build_unet_plan_frame(c + (acc[:, :1] & 0), v, caps)
        return p.levels[0].nbr3[:, :3]
    timeit_chained("build_unet_plan_frame (5 levels)", plan_step, jnp.zeros((N, 3), jnp.int32), uv.coords, uv.valid, iters=3)

    from lidal_tpu.ops.conv import subm_conv
    w3 = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32))
    def conv_step(f, ww, i):
        out = subm_conv(f[:N], ww, i)
        return jnp.concatenate([out, f[-1:]], 0)
    timeit_chained("subm_conv 131k c32->c32", conv_step, feats, w3, nbr)

if __name__ == "__main__":
    main()
