"""Evaluator: batched no-grad inference + metric aggregation.

Parity target: lib/evaluator/evaluator.py:12-98 — per batch, run
``model(**data)``, un-normalize prediction and gt by depth std/mean (x5+5,
evaluator.py:22-30), collect {gt, pd} per image, then RDFGANMetric. The
DistEval tmpdir-pickle gather (misc.py:12-57) is replaced by on-device
accumulation under jit; when the eval loader is sharded over a mesh, each
metric sum is computed globally by XLA — no host gather at all.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from ..metrics import METRIC_NAMES, compute_depth_metrics


class Eval:
    def __init__(self, dataloader, depth_mean: float = None,
                 depth_std: float = None, t_valid: float = 1e-4,
                 depth_only: bool = False):
        self.dataloader = dataloader
        # skip aux heads (G_label) whose outputs the metric never consumes
        # (reference quirk rdfc_gan.py:172-180 / SURVEY §7.4)
        self.depth_only = depth_only
        # un-normalization stats come from the dataset (the v1 S2D datasets
        # use their own mean/std, not the NYUv2 (5,5) — VERDICT.md weak #6)
        ds = getattr(dataloader, "dataset", None)
        self.depth_mean = (depth_mean if depth_mean is not None
                           else float(getattr(ds, "depth_mean", 5.0)))
        self.depth_std = (depth_std if depth_std is not None
                          else float(getattr(ds, "depth_std", 5.0)))
        self.t_valid = t_valid
        self._metric_fn = jax.jit(
            lambda gt, pd, em: compute_depth_metrics(gt, pd, em, t_valid))

    def inference(self, model, state):
        """Returns (per-image metric rows (N, 8), sample indices (N,) or
        None). Pad rows of a non-full final batch (sample_idx == -1) are
        dropped so the split is covered exactly once (rdf_gan_metric.py:
        135-151 per-image semantics)."""
        multi = jax.process_count() > 1
        if multi:
            from jax.experimental import multihost_utils

        def to_host(x):
            """Global (possibly non-addressable) device array -> full numpy.
            np.asarray raises on arrays spanning other hosts; the tiled
            allgather materializes the global value on every process — the
            TPU-native replacement for the reference's tmpdir-pickle
            collection (misc.py:12-57)."""
            if multi:
                return np.asarray(
                    multihost_utils.process_allgather(x, tiled=True))
            return np.asarray(x)

        rows, idxs = [], []
        for data in self.dataloader:
            ret = model.forward_test(state, rgb=data["rgb"],
                                     raw_depth=data["raw_depth"],
                                     depth_only=self.depth_only)
            pd_ = ret["pred_depth"][..., 0] * self.depth_std + self.depth_mean
            gt = data["gt_depth"][..., 0] * self.depth_std + self.depth_mean
            em = data.get("evaluate_mask")
            r = to_host(self._metric_fn(gt, pd_, em))
            si = data.get("sample_idx")
            if si is not None:
                si = to_host(si)
                keep = si >= 0
                r, si = r[keep], si[keep]
                idxs.append(si)
            rows.append(r)
        rows = np.concatenate(rows, axis=0)
        idx = np.concatenate(idxs) if idxs else None
        return rows, idx

    def evaluate(self, model, state, logger=None) -> Dict[str, float]:
        # inference() already materializes GLOBAL rows on every process
        # (tiled allgather per batch under multi-host)
        rows, idx = self.inference(model, state)
        if idx is not None:
            # drop cross-host shard-padding duplicates (same index loaded by
            # two hosts when len(dataset) % process_count != 0)
            _, first = np.unique(idx, return_index=True)
            rows = rows[first]
        metrics = rows.mean(axis=0)
        ret = {name: float(metrics[i]) for i, name in enumerate(METRIC_NAMES)}
        sink = logger.log if logger is not None else print
        for k, v in ret.items():
            sink(f"{k}: {v}")
        return ret
