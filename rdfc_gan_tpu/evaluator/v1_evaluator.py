"""v1-style evaluator: resize predictions back to the ground-truth's origin
resolution before computing metrics.

Parity target: RDF-GAN/lib/evaluator/rdf_gan_evaluator.py:10-150 — the v1
generator returns a 5-tuple whose last element is the fused depth; if the
batch carries ``gt_depth_origin`` the prediction is bilinearly resized
(align_corners=False) to its resolution and compared un-normalized.

XLA needs static shapes, so the resize-back runs host-side in numpy (eval is
IO-bound anyway); batches whose origins share a shape are still metric-
accumulated with the jitted path.
"""

from __future__ import annotations

from typing import Dict, List

import cv2
import numpy as np

from ..metrics import RDFGANMetric


class EvalV1:
    def __init__(self, dataloader, depth_mean: float = 5.0,
                 depth_std: float = 5.0):
        self.dataloader = dataloader
        self.depth_mean = depth_mean
        self.depth_std = depth_std

    def inference(self, model, state) -> List[Dict]:
        results = []
        for data in self.dataloader:
            ret = model.forward_test(state, rgb=data["rgb"],
                                     raw_depth=data["raw_depth"])
            pred = np.asarray(ret["pred_depth"])[..., 0]  # (B, h, w) normed
            if "gt_depth_origin" in data:
                gts = np.asarray(data["gt_depth_origin"])  # meters
            else:
                gts = (np.asarray(data["gt_depth"])[..., 0] * self.depth_std
                       + self.depth_mean)
            for i in range(pred.shape[0]):
                gt = gts[i]
                h, w = gt.shape[-2:]
                pd_ = cv2.resize(pred[i], (w, h),
                                 interpolation=cv2.INTER_LINEAR)
                pd_ = pd_ * self.depth_std + self.depth_mean
                sample = dict(gt=gt, pd=pd_)
                if "evaluate_mask" in data:
                    sample["evaluate_mask"] = np.asarray(
                        data["evaluate_mask"])[i]
                results.append(sample)
        return results

    def evaluate(self, model, state, logger=None) -> Dict[str, float]:
        results = self.inference(model, state)
        dataset = getattr(self.dataloader, "dataset", None)
        if dataset is not None and hasattr(dataset, "evaluate"):
            return dataset.evaluate(results, logger)
        return RDFGANMetric().evaluate_all(results, logger)
