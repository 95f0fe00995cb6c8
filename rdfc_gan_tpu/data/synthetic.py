"""Synthetic fixture dataset — random tensors with the exact key/shape
contract of the real loaders (SURVEY.md §7.2 step 3), so model/engine work is
never blocked on dataset availability.

Sample keys (nyuv2_dataset_training.py:148-156):
  rgb (H,W,3) in [-1,1], raw_depth (H,W,1), gt_depth (H,W,1) both normalized
  by (mean=5, std=5), depth_masks (H,W,1) bool, gt_normal (H,W,3) unit,
  normal_masks (H,W) bool, labels (H,W) int in [0, num_classes).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..registry import DATASETS


class SyntheticDataset:
    def __init__(self, length: int = 64, height: int = 224, width: int = 304,
                 num_classes: int = 14, seed: int = 0, **unused):
        self.length = length
        self.h, self.w = height, width
        self.num_classes = num_classes
        self.seed = seed
        # eval protocol constants (evaluator.py:22-30)
        self.depth_mean, self.depth_std = 5.0, 5.0
        self.rgb_mean, self.rgb_std = 0.5, 0.5

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        rng = np.random.RandomState(self.seed * 100003 + idx)
        h, w = self.h, self.w
        depth_m = rng.uniform(0.7, 10.0, size=(h, w, 1)).astype(np.float32)
        # sparse/corrupted input: drop 60% of pixels
        keep = rng.uniform(size=(h, w, 1)) > 0.6
        raw_m = depth_m * keep
        normal = rng.normal(size=(h, w, 3)).astype(np.float32)
        normal /= np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-8
        return dict(
            rgb=rng.uniform(-1, 1, size=(h, w, 3)).astype(np.float32),
            raw_depth=((raw_m - self.depth_mean) / self.depth_std
                       * keep).astype(np.float32),
            gt_depth=((depth_m - self.depth_mean) / self.depth_std
                      ).astype(np.float32),
            depth_masks=(depth_m > 1e-4).astype(np.float32),
            gt_normal=normal,
            normal_masks=np.ones((h, w), np.float32),
            labels=rng.randint(0, self.num_classes,
                               size=(h, w)).astype(np.int32),
        )

    def evaluate(self, results, logger=None):
        from ..metrics import RDFGANMetric

        return RDFGANMetric().evaluate_all(results, logger)


DATASETS.register("synthetic")(SyntheticDataset)
