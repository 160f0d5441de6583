"""timm efficientnet block surface.  Subclasses the repo's torch mirrors
(tests/torch_mirror.py — same math, same state_dict keys) and adds the
attributes the reference's custom memory-splice forward reaches into
(backbone/TemporalStereo.py:183-218): act1/act2 modules and drop_path_rate.
"""
import torch.nn as nn

from tests.torch_mirror import EdgeResidualT, InvertedResidualT


def drop_path(x, drop_prob: float = 0.0, training: bool = False):
    """timm's stochastic depth; the stub always builds blocks with
    drop_path_rate == 0 so this is identity in practice."""
    if drop_prob == 0.0 or not training:
        return x
    keep_prob = 1 - drop_prob
    import torch

    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    random_tensor = keep_prob + torch.rand(
        shape, dtype=x.dtype, device=x.device)
    random_tensor.floor_()
    return x.div(keep_prob) * random_tensor


class EdgeResidual(EdgeResidualT):
    def __init__(self, in_ch, out_ch, stride, expand):
        super().__init__(in_ch, out_ch, stride, expand)
        self.drop_path_rate = 0.0


class InvertedResidual(InvertedResidualT):
    def __init__(self, in_ch, out_ch, stride, expand):
        super().__init__(in_ch, out_ch, stride, expand)
        self.act1 = nn.SiLU(inplace=False)
        self.act2 = nn.SiLU(inplace=False)
        self.drop_path_rate = 0.0
