"""Dependency shims that make the REAL reference code importable as a parity
oracle on CPU torch.

The reference (/root/reference) fails to import only on four third-party
packages this sandbox lacks — ``detectron2`` (Registry/configurable/BN
aliases), ``timm`` (only architecture/modeling/backbone/TemporalStereo.py),
``cupy`` (only the GPU softsplat JIT in layers/softsplat.py), ``fvcore``
(CfgNode base), plus ``png`` and ``pytorch_lightning`` for the data/project
layers.  ``install()`` puts minimal stand-ins for those on ``sys.path`` and
then exposes /root/reference itself, so parity tests exercise the
reference's OWN lines (block_cost.py, inverse_warp.py, module.py, coarse.py,
fine.py, precise.py, smooth_l1_loss.py, warsserstein_distance_loss.py,
pixel_error.py, projects/TemporalStereo/TemporalStereo.py update_map ...)
instead of builder-written mirrors.

The stubs carry NO reference logic: they only reproduce third-party API
surfaces (timm's EfficientNetV2-rw-s module layout, detectron2's
``@configurable`` protocol, fvcore's CfgNode attribute-dict).
"""
from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
STUBS = os.path.join(_HERE, "stubs")
REFERENCE_ROOT = os.environ.get("TS_REFERENCE_ROOT", "/root/reference")
PROJECT_DIR = os.path.join(REFERENCE_ROOT, "projects", "TemporalStereo")

_installed = False


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "architecture"))


def install(project: bool = False) -> None:
    """Make ``import architecture`` (and optionally the
    projects/TemporalStereo modules) resolve against the real reference.

    Stub packages are only used when the real third-party package is
    missing — they sit at the END of sys.path behind everything that is
    actually installed, except that we never shadow an installed package
    because Python resolves already-importable names first.
    """
    global _installed
    if not _installed:
        # stubs first (nothing in them shadows an installed package name —
        # detectron2/timm/cupy/fvcore/png/pytorch_lightning are all absent
        # from this image), then the reference tree itself.
        for p in (STUBS, REFERENCE_ROOT):
            if p not in sys.path:
                sys.path.insert(0, p)
        _installed = True
    if project and PROJECT_DIR not in sys.path:
        # gives the flat modules the project uses internally:
        # ``from config import CfgNode`` etc.
        sys.path.append(PROJECT_DIR)


def patch_softsplat_cpu():
    """Replace the CUDA-only ``FunctionSoftsplat`` (softsplat.py:269-270
    raises on CPU) with the torch scatter oracle from
    tests/torch_mirror_temporal.py so the real ``update_map``
    (projects/TemporalStereo/TemporalStereo.py:326-461) runs on CPU.

    Patches every module-level alias that was created by ``from ... import
    FunctionSoftsplat`` at reference import time.  Returns the oracle.
    """
    install(project=True)
    import architecture.modeling.layers as ref_layers
    import architecture.modeling.layers.softsplat as ref_softsplat

    from tests.torch_mirror_temporal import softsplat_t

    def cpu_softsplat(tenInput, tenFlow, tenMetric, strType):
        assert strType == "softmax", strType
        return softsplat_t(tenInput, tenFlow, tenMetric, mode="softmax")

    ref_softsplat.FunctionSoftsplat = cpu_softsplat
    ref_layers.FunctionSoftsplat = cpu_softsplat
    if "TemporalStereo" in sys.modules:
        mod = sys.modules["TemporalStereo"]
        if hasattr(mod, "FunctionSoftsplat"):
            mod.FunctionSoftsplat = cpu_softsplat
    return cpu_softsplat
