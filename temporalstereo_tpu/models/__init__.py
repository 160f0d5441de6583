from .aggregation import (
    CoarseAggregation,
    CostMemory,
    FineAggregation,
    PreciseAggregation,
    TemporalStereoAggregation,
)
from .backbone import TemporalStereoBackbone, V2S_GROUPS
from .builder import build_model
from .stereo import (
    PrevInfo,
    TemporalStereoNet,
    backbone_memory_shapes,
    init_prev_info,
    update_prev_info,
)

__all__ = [k for k in dir() if not k.startswith("_")]
