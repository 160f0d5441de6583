"""torchvision stand-in: the reference's data layer imports transforms at
module scope (architecture/data/datasets/base.py:11-12); the parity tests
exercise the modeling/ops layers, not the PIL augmentation pipeline, so only
the import surface plus ToTensor/Compose are functional."""
from . import transforms  # noqa: F401

__version__ = "0.0.refshim"
