"""lidal_tpu — TPU-native (JAX/XLA/Pallas) active-learning framework for 3D LiDAR
semantic segmentation, with the capabilities of hzykent/LiDAL.

Subpackages
-----------
ops       sparse-voxel tensor engine: coordinate hashing, voxelization, kernel-map
          (rulebook) construction, gather-GEMM sparse 3D convolution, point<->voxel ops
models    MinkUNet / SPVCNN as functional flax modules over the sparse engine
data      SemanticKITTI / nuScenes readers, augmentation, fixed-capacity batching
runtime   pjit'd train/eval/prob-inference drivers, checkpointing, artifact paths
active    frame-level and supervoxel-level scoring + greedy budgeted selection
prep      pose registration, supervoxel partition, surface variation
parallel  device-mesh / sharding helpers
utils     IoU metrics, point-cloud IO
"""

__version__ = "0.1.0"
