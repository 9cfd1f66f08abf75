"""Sparse-voxel tensor engine (the torchsparse equivalent, TPU-native).

Everything here operates on fixed-capacity ("padded") per-frame arrays so that all
shapes are static under jit/pjit. Invalid rows are marked by a validity mask and by
sentinel coordinate keys that sort to the end of any table.
"""

from lidal_tpu.ops.hashing import (  # noqa: F401
    SENTINEL_KEY,
    pack_keys,
    lookup,
)
from lidal_tpu.ops.voxelize import unique_voxels, voxelize_mean  # noqa: F401
