"""timm stand-in exposing exactly what the reference backbone touches
(architecture/modeling/backbone/TemporalStereo.py:7-8, 60-72):

  * ``timm.create_model('efficientnetv2_rw_s')`` returning a module with
    ``conv_stem`` / ``bn1`` / ``act1`` / ``blocks`` (6 stages the reference
    re-slices by [1, 2, 3, 5, 7]),
  * ``timm.models.efficientnet_blocks.{InvertedResidual, drop_path}`` with
    timm's attribute surface (conv_pw/bn1/act1/conv_dw/bn2/act2/se/
    conv_pwl/bn3/drop_path_rate/has_residual).

The block internals come from tests/torch_mirror.py, which already encodes
the efficientnetv2_rw_s structure with timm's state_dict key layout — so the
real reference backbone built on this stub strict-loads the same checkpoints
the repo's importer/exporter handle.  No ImageNet weights exist in this
sandbox; ``pretrained=True`` falls back to the module's random init (the
parity tests always overwrite weights via ``load_state_dict``).
"""
import torch.nn as nn

from .models.efficientnet_blocks import (  # noqa: F401
    EdgeResidual,
    InvertedResidual,
)

from tests.torch_mirror import STEM_CHANNELS, V2S_STAGES


class _EfficientNetV2(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, STEM_CHANNELS, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(STEM_CHANNELS)
        self.act1 = nn.SiLU(inplace=True)
        stages = []
        in_ch = STEM_CHANNELS
        for btype, repeats, stride, expand, out_ch in V2S_STAGES:
            stage = []
            for r in range(repeats):
                s = stride if r == 0 else 1
                cls = EdgeResidual if btype == "er" else InvertedResidual
                stage.append(cls(in_ch, out_ch, s, expand))
                in_ch = out_ch
            stages.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x):  # pragma: no cover - reference never calls this
        return self.blocks(self.act1(self.bn1(self.conv_stem(x))))


def create_model(name: str, pretrained: bool = False, **kwargs):
    assert name == "efficientnetv2_rw_s", (
        f"timm stub only provides efficientnetv2_rw_s, got {name}")
    return _EfficientNetV2()
