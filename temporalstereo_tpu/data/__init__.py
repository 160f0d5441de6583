from .datasets.builder import build_dataloader, build_stereo_dataset
from .loader import DataLoader, collate

__all__ = ["build_dataloader", "build_stereo_dataset", "DataLoader",
           "collate"]
