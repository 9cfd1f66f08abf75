"""lookup_sorted_many: parity with per-stream lookup_sorted."""

import jax.numpy as jnp
import numpy as np
import pytest

from lidal_tpu.ops.hashing import SENTINEL_KEY
from lidal_tpu.ops.merge_lookup import lookup_sorted, lookup_sorted_many
from lidal_tpu.ops.voxelize import unique_voxels


@pytest.mark.parametrize("tile", [32, 128])
@pytest.mark.parametrize("seed", [0, 1])
def test_many_matches_single(seed, tile):
    rng = np.random.default_rng(seed)
    n = 512
    coords = rng.integers(0, 12, size=(700, 3)).astype(np.int32)
    uv = unique_voxels(jnp.asarray(coords), jnp.ones(700, bool), n)
    shifts = [((1 << 14) + 0, 1), (0, -1), (-(1 << 14), 0), ((1 << 14) + 1, -1), (2 << 14, 2)]
    q_hi = jnp.stack([jnp.where(uv.valid, uv.key_hi + h, SENTINEL_KEY) for h, _ in shifts])
    q_lo = jnp.stack([jnp.where(uv.valid, uv.key_lo + l, SENTINEL_KEY) for _, l in shifts])
    got = np.asarray(lookup_sorted_many(uv.key_hi, uv.key_lo, q_hi, q_lo, tile=tile))
    for i in range(len(shifts)):
        ref = np.asarray(lookup_sorted(uv.key_hi, uv.key_lo, q_hi[i], q_lo[i], tile=tile))
        np.testing.assert_array_equal(got[i], ref, err_msg=f"stream {i}")
