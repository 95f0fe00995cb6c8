from .synthetic import SyntheticDataset
from .loader import DataLoader, build_dataloader
from . import nyuv2, sunrgbd, nyuv2_s2d, ddrnet_human  # noqa: F401  (register datasets)

__all__ = ["SyntheticDataset", "DataLoader", "build_dataloader"]
