"""BaseDataset: mode dispatch, retry-on-None, metric hookup.

Parity target: lib/datasets/base.py:12-163 (train/test __getitem__ dispatch
with random-retry on failed samples — the reference's only fault-tolerance
mechanism, SURVEY.md §5)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class BaseDataset:
    def __init__(self, data_root: str, mode: str = "train",
                 rgb_mean=(0.485, 0.456, 0.406), rgb_std=(0.229, 0.224, 0.225),
                 max_depth: float = 10.0, depth_mean=(5.0,), depth_std=(5.0,),
                 seed: int = 0):
        self.data_root = data_root
        self.mode = mode
        self.rgb_mean = np.asarray(rgb_mean, np.float32)
        self.rgb_std = np.asarray(rgb_std, np.float32)
        self.max_depth = max_depth
        self.depth_mean = float(np.asarray(depth_mean).reshape(-1)[0])
        self.depth_std = float(np.asarray(depth_std).reshape(-1)[0])
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng(
            (self.seed * 1_000_003 + self.epoch) * 1_000_003 + idx)

    def get_train_data(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        raise NotImplementedError

    def get_test_data(self, idx: int) -> Optional[Dict[str, np.ndarray]]:
        raise NotImplementedError

    def __getitem__(self, idx: int):
        if self.mode == "train":
            sample = self.get_train_data(idx)
            tries = 0
            while sample is None and tries < 10:  # retry-on-None (base.py:70-75)
                idx = int(self._rng(idx).integers(0, len(self)))
                sample = self.get_train_data(idx)
                tries += 1
            return sample
        return self.get_test_data(idx)

    def evaluate(self, results, logger=None):
        from ..metrics import RDFGANMetric

        return RDFGANMetric().evaluate_all(results, logger)
