"""Sparse segmentation networks (MinkUNet, SPVCNN) over the lidal_tpu ops engine."""

from lidal_tpu.models.minkunet import MinkUNet  # noqa: F401
from lidal_tpu.models.spvcnn import SPVCNN  # noqa: F401
