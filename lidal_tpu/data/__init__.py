"""Dataset adapters, augmentation, and fixed-capacity batching."""

from lidal_tpu.data.augment import augment_and_voxelize  # noqa: F401
from lidal_tpu.data.pipeline import prepare_train_batch, prepare_eval_batch  # noqa: F401
