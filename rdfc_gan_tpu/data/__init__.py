from .synthetic import SyntheticDataset
from .loader import DataLoader, build_dataloader
from . import nyuv2, sunrgbd, nyuv2_s2d, nyuv2_r2r, ddrnet_human, folder_dataset  # noqa: F401

__all__ = ["SyntheticDataset", "DataLoader", "build_dataloader"]
