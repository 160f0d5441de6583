from .interpolate import (
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    avg_pool2d,
    avg_pool3d,
    max_pool2d,
    max_pool3d,
    resize_bilinear,
    resize_trilinear,
    upsample_disp,
)
from .warp import (
    grid_sample,
    inverse_warp,
    inverse_warp_3d,
    mesh_grid,
    project_to_3d,
    shift_1d,
)
from .cost import (
    block_cost,
    cat_fms,
    dif_fms,
    groupwise_correlation,
    shift_right_features,
)
from .softsplat import softsplat, summation_splat
from .sampling import (
    fractional_disparity_samples,
    hard_argmin,
    linear_disparity_samples,
    soft_argmin,
    sort_samples_with_volume,
    topk_soft_argmin,
)
from .upsample import convex_upsample, mask_upsample_9, unfold3x3

__all__ = [k for k in dir() if not k.startswith("_")]
