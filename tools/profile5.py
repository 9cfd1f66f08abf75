"""A/B the sorted-gather + slice-window rewrites on TPU."""
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
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:10.2f} ms/call", flush=True)

def main():
    rng = np.random.default_rng(0)
    N, K, C = 131072, 27, 32
    from lidal_tpu.ops.voxelize import unique_voxels
    from lidal_tpu.ops.merge_lookup import lookup_sorted
    from lidal_tpu.ops.kernel_map import build_subm_nbr, build_unet_plan_frame
    from lidal_tpu.ops.conv import subm_conv
    from lidal_tpu.ops.gather import take_rows

    coords = rng.integers(0, 900, size=(N, 3)).astype(np.int32)
    uv = jax.jit(unique_voxels, static_argnums=2)(jnp.asarray(coords), jnp.ones(N, bool), N)
    qh = jnp.where(uv.valid, uv.key_hi + jnp.int32(1 << 14), 2**31 - 1)
    ql = jnp.where(uv.valid, uv.key_lo + 1, 2**31 - 1)
    t_pull("merge lookup v2 tile=512",
           lambda a, th, tl, b, c: lookup_sorted(th, tl, b + (a[0] & 0), c, tile=512),
           jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)
    t_pull("merge lookup v2 tile=2048",
           lambda a, th, tl, b, c: lookup_sorted(th, tl, b + (a[0] & 0), c, tile=2048),
           jnp.zeros(N, jnp.int32), uv.key_hi, uv.key_lo, qh, ql)
    t_pull("build_subm_nbr v2", lambda a, c, v: build_subm_nbr(c + (a[:, :1] & 0), v)[:, :3],
           jnp.zeros((N, 3), jnp.int32), uv.coords, uv.valid, iters=8)

    feats = jnp.asarray(rng.normal(size=(N+1, C)).astype(np.float32))
    # sorted+unique index columns like a real rulebook
    base = np.sort(rng.choice(N+1, size=N, replace=False)).astype(np.int32)
    nbr = jnp.asarray(np.stack([np.minimum(base + k, N) for k in range(K)], 1))
    def sg_step(f, i):
        g = take_rows(f, i[:, 0], sorted_unique=True)
        for k in range(1, K):
            g = g + take_rows(f, i[:, k], sorted_unique=True)
        return jnp.concatenate([g, f[-1:]], 0)
    t_pull("27x sorted-unique row gathers", sg_step, feats, nbr)

    w3 = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32))
    def conv_step(f, ww, i):
        out = subm_conv(f[:N], ww, i)
        return jnp.concatenate([out, f[-1:]], 0)
    t_pull("subm_conv v2 131k c32->c32", conv_step, feats, w3, nbr)

    caps = (131072, 49152, 16384, 6144, 2048)
    t_pull("build_unet_plan_frame v2", lambda a, c, v: build_unet_plan_frame(c + (a[:, :1] & 0), v, caps).levels[0].nbr3[:, :3],
           jnp.zeros((N, 3), jnp.int32), uv.coords, uv.valid, iters=5)

if __name__ == "__main__":
    main()
