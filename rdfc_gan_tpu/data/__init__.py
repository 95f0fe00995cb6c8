from .synthetic import SyntheticDataset
from .loader import DataLoader, build_dataloader

__all__ = ["SyntheticDataset", "DataLoader", "build_dataloader"]
