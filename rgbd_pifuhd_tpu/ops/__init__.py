"""Pure-function compute primitives (layer L0/L1 of SURVEY.md).

All ops use TPU-native layouts: images are NHWC ``[B, H, W, C]``, point
clouds are ``[B, N, 3]`` and per-point features are ``[B, N, C]`` (the point
axis N is the framework's shardable "sequence" axis).
"""

from .geometry import (
    index,
    grid_sample_bilinear,
    orthogonal,
    perspective,
    in_bounds_mask,
    depth_normalize,
)
from .resize import (
    resize_bilinear_align_corners,
    resize_bicubic_align_corners,
    upsample2x_bicubic,
    avg_pool2d,
)
from .losses import (
    custom_bce,
    mse,
    l1,
    gram_matrix,
)
