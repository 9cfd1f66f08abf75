"""map_frames: scan and vmap lowerings agree (incl. gradients through convs)."""

import jax
import jax.numpy as jnp
import numpy as np

import lidal_tpu.ops.batching as batching
from lidal_tpu.ops.conv import subm_conv
from lidal_tpu.ops.kernel_map import K3, build_subm_nbr
from lidal_tpu.ops.voxelize import unique_voxels


def test_scan_and_vmap_agree_forward_and_grad():
    rng = np.random.default_rng(0)
    b, cap, cin, cout = 3, 128, 4, 6
    coords = rng.integers(0, 6, size=(b, 200, 3)).astype(np.int32)
    uv = jax.vmap(lambda c: unique_voxels(c, jnp.ones(200, bool), cap))(jnp.asarray(coords))
    nbr = jnp.stack([build_subm_nbr(uv.coords[i], uv.valid[i]) for i in range(b)])
    feats = jnp.asarray(rng.normal(size=(b, cap, cin)).astype(np.float32)) * uv.valid[..., None]
    w = jnp.asarray(rng.normal(size=(K3, cin, cout)).astype(np.float32))

    def run(feats, w):
        return batching.map_frames(lambda xi, ni: subm_conv(xi, w, ni), feats, nbr)

    outs, grads = {}, {}
    for mode in ("vmap", "scan"):
        batching.FORCE_MODE = mode
        try:
            outs[mode] = np.asarray(jax.jit(run)(feats, w))
            g = jax.grad(lambda f, ww: (run(f, ww) ** 2).sum(), argnums=(0, 1))(feats, w)
            grads[mode] = (np.asarray(g[0]), np.asarray(g[1]))
        finally:
            batching.FORCE_MODE = None
    np.testing.assert_allclose(outs["scan"], outs["vmap"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(grads["scan"][0], grads["vmap"][0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(grads["scan"][1], grads["vmap"][1], rtol=1e-4, atol=1e-4)
