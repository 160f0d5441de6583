"""Colormap dispatcher (reference architecture/utils/visualization/
colormap.py:5-85): normalize/reshape an array and apply a named matplotlib
colormap or a callable."""
from __future__ import annotations

from typing import Callable, Union

import numpy as np


def colormap(cmap: Union[str, Callable], data: np.ndarray, *args,
             normalize: bool = True, output_format: str = "HWC",
             **kwargs) -> np.ndarray:
    data = np.asarray(data)
    if data.ndim == 3 and data.shape[0] == 1:
        data = data[0]
    if normalize:
        lo, hi = float(data.min()), float(data.max())
        data = (data - lo) / max(hi - lo, 1e-9)

    if callable(cmap):
        img = cmap(data, *args, **kwargs)
    else:
        import matplotlib.cm as cm

        img = cm.get_cmap(cmap)(np.clip(data, 0, 1))[..., :3]

    img = np.asarray(img, np.float32)
    if output_format == "CHW":
        img = np.transpose(img, (2, 0, 1))
    return img
