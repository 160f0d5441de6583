from .blocks import (  # noqa: F401
    BasicBlock,
    ConvexUpsample,
    DepthwiseConv3D,
    DepthwiseConvTranspose3D,
    PredictionHeads,
    PyramidFusion,
    ResidualBlock2D,
    ResidualBlock3D,
    SPP3D,
    StereoDRNetRefinement,
    UNet,
)
from .layers import (  # noqa: F401
    Conv2d,
    Conv3d,
    ConvGRU,
    ConvTranspose2d,
    ConvTranspose3d,
    Norm,
    get_activation,
)
