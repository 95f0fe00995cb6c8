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
                 seed: int = 0, decode_cache: Optional[str] = None):
        self.data_root = data_root
        self.mode = mode
        self.rgb_mean = np.asarray(rgb_mean, np.float32)
        self.rgb_std = np.asarray(rgb_std, np.float32)
        self.max_depth = max_depth
        self.depth_mean = float(np.asarray(depth_mean).reshape(-1)[0])
        self.depth_std = float(np.asarray(depth_std).reshape(-1)[0])
        self.seed = seed
        self.epoch = 0
        # decoded-sample cache (docs/PERF_NOTES.md round-4 loader work):
        # PNG decode dominates the per-sample cost (~2/3 of the 64 ms on a
        # 1-core host) and is identical every epoch — datasets route their
        # _load_raw through _cache_load/_cache_store keyed by the sample's
        # relative path, storing the decoded (pre-augment) arrays as
        # uncompressed .npz. Opt-in: RDFC_DECODE_CACHE=<dir> or the
        # ``decode_cache`` ctor arg. First epoch pays decode+write; later
        # epochs are a page-cached file read.
        import os

        self.decode_cache = decode_cache or os.environ.get(
            "RDFC_DECODE_CACHE")
        if self.decode_cache:
            os.makedirs(self.decode_cache, exist_ok=True)

    # bump when any _load_raw decode/preprocess step changes meaning
    _CACHE_FORMAT = 2

    def _cache_salt(self) -> str:
        """Extra decode-affecting parameters; subclasses append theirs."""
        return ""

    def _cache_path(self, rel_key: str) -> str:
        """Cache filename = <salt-hash>__<rel_key>.npz. The salt folds in a
        format-version constant, the dataset class, the data_root and any
        subclass decode params so a cache dir shared across datasets/roots
        or populated before a decode change MISSES instead of serving
        stale samples (advisor r4)."""
        import hashlib
        import os

        salt = (f"v{self._CACHE_FORMAT}|{type(self).__name__}|"
                f"{os.path.abspath(self.data_root)}|{self._cache_salt()}")
        h = hashlib.sha1(salt.encode()).hexdigest()[:10]
        return os.path.join(self.decode_cache,
                            f"{h}__{rel_key.replace('/', '__')}.npz")

    def _cache_load(self, rel_key: str):
        if not self.decode_cache:
            return None
        try:
            with np.load(self._cache_path(rel_key)) as z:
                return {k: z[k] for k in z.files}
        except (OSError, ValueError, EOFError):
            return None

    def _cache_store(self, rel_key: str, sample: Dict[str, np.ndarray]):
        if not self.decode_cache:
            return
        import os

        p = self._cache_path(rel_key)
        try:
            # np.savez appends ".npz" unless the name already ends with it
            tmp = f"{p}.{os.getpid()}.tmp.npz"
            np.savez(tmp, **sample)
            os.replace(tmp, p)
        except OSError:
            pass

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

    def show(self, samples, iters: int = 0, save_dir: str = ".",
             max_show_num: int = 6):
        """Colormapped per-sample debug dumps (lib/datasets/base.py:103-163):
        un-normalize with the dataset stats and write
        ``{i}_{rgb,raw_depth,pred_depth,gt_depth,pred_gray}.png`` under
        ``save_dir/{iters:010d}/``. NHWC numpy arrays in, uint8 pngs out
        (cv2's plasma colormap stands in for matplotlib's)."""
        import os

        import cv2

        out = os.path.join(save_dir, f"{int(iters):010d}")
        os.makedirs(out, exist_ok=True)
        rgb = np.asarray(samples["rgb"], np.float32)
        rgb = (rgb * self.rgb_std + self.rgb_mean) * 255.0
        deps = {}
        for k in ("raw_depth", "pred_depth", "gt_depth"):
            d = np.asarray(samples[k], np.float32)
            deps[k] = np.clip(
                (d * self.depth_std + self.depth_mean) / self.max_depth,
                0.0, 1.0)
        for i in range(min(rgb.shape[0], max_show_num)):
            cv2.imwrite(os.path.join(out, f"{i}_rgb.png"),
                        np.clip(rgb[i], 0, 255).astype(np.uint8)[..., ::-1])
            for k in ("raw_depth", "pred_depth", "gt_depth"):
                g8 = (255.0 * deps[k][i, ..., 0]).astype(np.uint8)
                cv2.imwrite(os.path.join(out, f"{i}_{k}.png"),
                            cv2.applyColorMap(g8, cv2.COLORMAP_PLASMA))
            g8 = (255.0 * deps["pred_depth"][i, ..., 0]).astype(np.uint8)
            cv2.imwrite(os.path.join(out, f"{i}_pred_gray.png"), g8)
        return out
