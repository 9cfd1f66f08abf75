import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

def t_chain(fn_j, x0, args, iters):
    x = x0
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn_j(x, *args)
    jax.block_until_ready(x)
    return time.perf_counter() - t0

def diff_time(name, fn, x0, *args, n1=5, n2=25):
    fn_j = jax.jit(fn)
    x = fn_j(x0, *args); jax.block_until_ready(x)
    ta = t_chain(fn_j, x0, args, n1)
    tb = t_chain(fn_j, x0, args, n2)
    per = (tb - ta) / (n2 - n1)
    print(f"{name:40s} diff {per*1e3:8.2f} ms  (t{n1}={ta*1e3:.1f} t{n2}={tb*1e3:.1f})", flush=True)

def main():
    rng = np.random.default_rng(0)
    N, K, C = 131072, 27, 32
    feats = jnp.asarray(rng.normal(size=(N+1, C)).astype(np.float32))
    nbr = jnp.asarray(rng.integers(0, N+1, size=(N, K)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K*C, C)).astype(np.float32))

    def gm_step(f, i, ww):
        out = f[i].reshape(N, K*C) @ ww
        return jnp.concatenate([out, f[-1:]], 0)
    diff_time("gather+matmul f32", gm_step, feats, nbr, w)

    from lidal_tpu.ops.conv import subm_conv
    w3 = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32))
    def conv_step(f, ww, i):
        out = subm_conv(f[:N], ww, i)
        return jnp.concatenate([out, f[-1:]], 0)
    diff_time("subm_conv chained", conv_step, feats, w3, nbr)

    # host-pull sanity: one call + full device->host copy
    fn_j = jax.jit(gm_step)
    t0 = time.perf_counter(); r = np.asarray(fn_j(feats, nbr, w)); t1 = time.perf_counter()
    print(f"one gather+matmul + host pull: {(t1-t0)*1e3:.1f} ms (incl 16MB copy)", flush=True)

    from lidal_tpu.ops.merge_lookup import lookup_sorted
    from lidal_tpu.ops.voxelize import unique_voxels
    coords = rng.integers(0, 900, size=(N, 3)).astype(np.int32)
    uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.ones(N, bool), N)
    qh = jnp.where(uv.valid, uv.key_hi + jnp.int32(1<<14), 2**31-1)
    ql = jnp.where(uv.valid, uv.key_lo + 1, 2**31-1)
    for tile in (256, 1024):
        def mer(acc, th, tl, a, b, t=tile):
            return lookup_sorted(th, tl, a + (acc[0]&0), b, tile=t)
        diff_time(f"merge lookup tile={tile}", mer, jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)

if __name__ == "__main__":
    main()
