from .smooth_l1 import DispSmoothL1Loss
from .wasserstein import WassersteinDistanceLoss

# reference spelling kept as an alias (modeling/__init__.py:1-4)
WarssersteinDistanceLoss = WassersteinDistanceLoss

__all__ = ["DispSmoothL1Loss", "WassersteinDistanceLoss",
           "WarssersteinDistanceLoss"]
