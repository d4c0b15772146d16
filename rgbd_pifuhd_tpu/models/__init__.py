"""Neural-network modules (flax.linen) — layer L1/L2 of SURVEY.md.

blocks.py   ConvBlock / HourGlass / HGFilter (stacked-hourglass encoder)
mlp.py      PointMLP (per-point occupancy head over the shardable N axis)
pix2pix.py  pix2pixHD generator/discriminator zoo + VGG16 feature net
coarse.py   CoarsePIFu   (reference PIFuNetwNML equivalent)
multires.py MultiResPIFu (reference PIFuMRNet equivalent)
"""

from .blocks import ConvBlock, HourGlass, HGFilter
from .mlp import PointMLP
from .pix2pix import (
    GlobalGenerator,
    LocalEnhancer,
    Encoder,
    NLayerDiscriminator,
    MultiscaleDiscriminator,
    instance_average_pool,
)
from .coarse import CoarsePIFu, CoarseFeatures, CoarseQueryOut
from .multires import MultiResPIFu, FineFeatures, FineQueryOut
