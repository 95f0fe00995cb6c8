"""Depth-completion metric suite: RMSE / MAE / iRMSE / iMAE / REL / delta^1,2,3.

Behavioral parity with the reference RDFGANMetric
(RDFC-GAN/lib/metrics/rdf_gan_metric.py:6-151):
  * valid mask = (gt > t_valid) & evaluate_mask, t_valid = 1e-4
  * per-image metrics, then unweighted mean over the split
  * inverse metrics on raw 1/depth (same units as the reference)
  * eps constants 1e-8 identical

TPU-native design: ``compute_depth_metrics`` is a pure jnp function over
fixed-shape batches (masked reductions, no boolean indexing) so evaluation can
run jitted and sharded; the host-side ``RDFGANMetric`` mirrors the reference
API for list-of-results evaluation.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

METRIC_NAMES = ["RMSE", "MAE", "iRMSE", "iMAE", "REL", "D^1", "D^2", "D^3"]

T_VALID = 1e-4
_EPS = 1e-8


def compute_depth_metrics(gt, pred, evaluate_mask=None, t_valid: float = T_VALID):
    """Per-image metrics over a batch, jit-friendly (no dynamic shapes).

    Args:
      gt, pred: (B, H, W) or (B, H, W, 1) depth in meters (un-normalized).
      evaluate_mask: optional boolean mask, same shape.
    Returns:
      (B, 8) array of [RMSE, MAE, iRMSE, iMAE, REL, D1, D2, D3] per image.
    """
    gt = gt.reshape(gt.shape[0], -1).astype(jnp.float32)
    pred = pred.reshape(pred.shape[0], -1).astype(jnp.float32)

    mask = gt > t_valid
    if evaluate_mask is not None:
        mask = mask & evaluate_mask.reshape(evaluate_mask.shape[0], -1)
    maskf = mask.astype(jnp.float32)
    num_valid = maskf.sum(axis=1)

    diff = (pred - gt) * maskf
    diff_abs = jnp.abs(diff)
    diff_sqr = diff * diff

    rmse = jnp.sqrt(diff_sqr.sum(axis=1) / (num_valid + _EPS))
    mae = diff_abs.sum(axis=1) / (num_valid + _EPS)

    # Inverse metrics. Reference zeroes inv values where depth <= t_valid;
    # with the masked reduction this is equivalent.
    pred_inv = jnp.where(mask & (pred > t_valid), 1.0 / (pred + _EPS), 0.0)
    gt_inv = jnp.where(mask, 1.0 / (gt + _EPS), 0.0)
    diff_inv = (pred_inv - gt_inv) * maskf
    irmse = jnp.sqrt((diff_inv * diff_inv).sum(axis=1) / (num_valid + _EPS))
    imae = jnp.abs(diff_inv).sum(axis=1) / (num_valid + _EPS)

    rel = (diff_abs / (gt + _EPS) * maskf).sum(axis=1) / (num_valid + _EPS)

    r1 = gt / (pred + _EPS)
    r2 = pred / (gt + _EPS)
    ratio = jnp.maximum(r1, r2)
    d1 = ((ratio < 1.25) & mask).sum(axis=1) / (num_valid + _EPS)
    d2 = ((ratio < 1.25**2) & mask).sum(axis=1) / (num_valid + _EPS)
    d3 = ((ratio < 1.25**3) & mask).sum(axis=1) / (num_valid + _EPS)

    return jnp.stack([rmse, mae, irmse, imae, rel, d1, d2, d3], axis=1)


class RDFGANMetric:
    """Host-side list-of-results evaluator, API-parity with the reference."""

    def __init__(self, t_valid: float = T_VALID):
        self.t_valid = t_valid
        self.metric_name = list(METRIC_NAMES)

    def evaluate_batch(self, gt, pred) -> np.ndarray:
        """Batch-level quick metrics [RMSE, MAE, REL, D1, D2, D3] (1, 6).

        Parity: reference evaluate_batch (rdf_gan_metric.py:15-59) computes a
        single metric over the *whole batch* jointly.
        """
        gt = np.asarray(gt, dtype=np.float64)
        pred = np.asarray(pred, dtype=np.float64)
        mask = gt > self.t_valid
        num_valid = mask.sum()
        p, g = pred[mask], gt[mask]
        diff = p - g
        rmse = np.sqrt((diff**2).sum() / (num_valid + _EPS))
        mae = np.abs(diff).sum() / (num_valid + _EPS)
        rel = (np.abs(diff) / (g + _EPS)).sum() / (num_valid + _EPS)
        ratio = np.maximum(g / (p + _EPS), p / (g + _EPS))
        dels = [
            (ratio < 1.25**k).sum() / (num_valid + _EPS) for k in (1, 2, 3)
        ]
        return np.array([[rmse, mae, rel, *dels]])

    def evaluate_all(self, results: List[Dict], logger=None) -> Dict[str, float]:
        """results: list of dicts with 'gt', 'pd' and optional 'evaluate_mask'."""
        rows = []
        for result in results:
            gt = np.asarray(result["gt"], dtype=np.float32)[None]
            pd_ = np.asarray(result["pd"], dtype=np.float32)[None]
            em = result.get("evaluate_mask")
            em = None if em is None else np.asarray(em, dtype=bool)[None]
            rows.append(
                np.asarray(compute_depth_metrics(jnp.asarray(gt), jnp.asarray(pd_),
                                                 None if em is None else jnp.asarray(em),
                                                 self.t_valid))
            )
        metrics = np.concatenate(rows, axis=0).mean(axis=0)
        ret = {name: float(metrics[i]) for i, name in enumerate(self.metric_name)}
        sink = logger.log if logger is not None else print
        for k, v in ret.items():
            sink(f"{k}: {v}")
        return ret
