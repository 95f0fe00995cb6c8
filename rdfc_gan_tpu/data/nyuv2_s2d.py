"""NYUv2 sparse-to-dense HDF5 dataset (v1's Fangchang-Ma 47k-frame corpus).

Parity target: RDF-GAN/lib/dataset/nyuv2/nyuv2_sparse_to_dense_dataset.py:
41-438 — nyu.json split file, h5 files with 'rgb' (3,H,W) and 'depth' (H,W)
keys; train: hflip p=0.5, ±5° nearest rotation, scale-jitter 1.0-1.5 (resize
shorter side to 240*s, CenterCrop (228,304), depth values / s), ColorJitter
(0.4,0.4,0.4); 500-pt sparse input with zero-preserving normalization;
test: resize 240 / CenterCrop, plus 'gt_depth_origin' passthrough (the v1
evaluator resizes predictions back, rdf_gan_evaluator.py:36-45).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import cv2
import numpy as np

from ..registry import DATASETS
from .base import BaseDataset

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _color_jitter(rgb01: np.ndarray, rng: np.random.Generator,
                  strength: float = 0.4) -> np.ndarray:
    """torchvision ColorJitter(brightness, contrast, saturation) analog:
    random order, each factor ~ U[1-s, 1+s]."""
    ops = ["brightness", "contrast", "saturation"]
    rng.shuffle(ops)
    out = rgb01
    for op in ops:
        f = float(rng.uniform(1 - strength, 1 + strength))
        if op == "brightness":
            out = out * f
        elif op == "contrast":
            mean = out.mean(axis=(0, 1), keepdims=True).mean()
            out = (out - mean) * f + mean
        else:  # saturation
            gray = out @ np.array([0.299, 0.587, 0.114], np.float32)
            out = (out - gray[..., None]) * f + gray[..., None]
        out = np.clip(out, 0.0, 1.0)
    return out


class NYUV2S2DDataset(BaseDataset):
    def __init__(self, data_root: str, mode: str = "train",
                 rgb_mean=_IMAGENET_MEAN, rgb_std=_IMAGENET_STD,
                 max_depth: float = 10.0, depth_mean=(5.0,), depth_std=(5.0,),
                 num_sample: int = 500, seed: int = 0, **unused):
        super().__init__(data_root, mode, rgb_mean, rgb_std, max_depth,
                         depth_mean, depth_std, seed)
        split_json = os.path.join(data_root, "nyu.json")
        if not os.path.exists(split_json):
            raise FileNotFoundError(
                "Please put the nyu.json file under the nyudepthv2 root")
        with open(split_json) as f:
            self.sample_list = json.load(f)[mode]
        self.num_sample = num_sample
        self.height, self.width = 240, 320
        self.crop_size = (228, 304)

    def __len__(self):
        return len(self.sample_list)

    def _load(self, idx):
        import h5py

        path = os.path.join(self.data_root, self.sample_list[idx]["filename"])
        with h5py.File(path, "r") as f:
            rgb = f["rgb"][:].transpose(1, 2, 0)  # (H,W,3) uint8
            depth = f["depth"][:].astype(np.float32)  # (H,W)
        return rgb, depth

    @staticmethod
    def _resize_shorter(img, target, nearest=False):
        h, w = img.shape[:2]
        if h <= w:
            nh, nw = target, int(round(w * target / h))
        else:
            nh, nw = int(round(h * target / w)), target
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(img, (nw, nh), interpolation=interp)

    def _center_crop(self, img):
        h, w = img.shape[:2]
        ch, cw = self.crop_size
        y, x = max((h - ch) // 2, 0), max((w - cw) // 2, 0)
        return img[y:y + ch, x:x + cw]

    def _sparse(self, depth: np.ndarray, rng) -> np.ndarray:
        flat = depth.reshape(-1)
        nnz = np.flatnonzero(flat > 1e-4)
        keep = rng.permutation(nnz.size)[: self.num_sample]
        mask = np.zeros_like(flat)
        mask[nnz[keep]] = 1.0
        return (flat * mask).reshape(depth.shape)

    def _pack(self, rgb01, depth, sparse):
        rgb = (rgb01 - self.rgb_mean) / self.rgb_std
        valid = (depth > 1e-4).astype(np.float32)[..., None]
        gt = (depth - self.depth_mean) / self.depth_std
        hole = sparse == 0.0
        sp = (sparse - self.depth_mean) / self.depth_std
        sp[hole] = 0.0
        return dict(rgb=rgb.astype(np.float32),
                    raw_depth=sp.astype(np.float32)[..., None],
                    gt_depth=gt.astype(np.float32)[..., None],
                    depth_masks=valid)

    def get_train_data(self, idx) -> Optional[Dict[str, np.ndarray]]:
        try:
            rgb, depth = self._load(idx)
        except Exception:
            return None
        rng = self._rng(idx)
        scale = float(rng.uniform(1.0, 1.5))
        degree = float(rng.uniform(-5.0, 5.0))
        if rng.uniform() > 0.5:
            rgb, depth = rgb[:, ::-1], depth[:, ::-1]

        def rot(img):
            m = cv2.getRotationMatrix2D((img.shape[1] / 2, img.shape[0] / 2),
                                        degree, 1.0)
            return cv2.warpAffine(np.ascontiguousarray(img), m,
                                  (img.shape[1], img.shape[0]),
                                  flags=cv2.INTER_NEAREST)

        rgb, depth = rot(rgb), rot(depth)
        tgt = int(self.height * scale)
        rgb = self._resize_shorter(rgb, tgt)
        depth = self._resize_shorter(depth, tgt)
        rgb01 = _color_jitter(rgb.astype(np.float32) / 255.0, rng)
        rgb01 = self._center_crop(rgb01)
        depth = self._center_crop(depth) / scale
        sparse = self._sparse(depth, rng)
        return self._pack(rgb01, depth, sparse)

    def get_test_data(self, idx) -> Optional[Dict[str, np.ndarray]]:
        try:
            rgb, depth = self._load(idx)
        except Exception:
            return None
        rng = self._rng(idx)
        rgb = self._center_crop(self._resize_shorter(rgb, self.height))
        depth = self._center_crop(self._resize_shorter(depth, self.height))
        rgb01 = rgb.astype(np.float32) / 255.0
        sample = self._pack(rgb01, depth, self._sparse(depth, rng))
        sample["gt_depth_origin"] = depth.astype(np.float32)
        return sample

    def stat_depth(self, log=print):
        """Corpus depth statistics sweep (nyuv2_sparse_to_dense_dataset.py:
        401-438): min/max over all frames plus per-frame-averaged mean/std of
        the raw h5 depth maps. Returns (min, max, mean, std)."""
        lo, hi = np.inf, -np.inf
        mean = std = 0.0
        for i in range(len(self)):
            _, depth = self._load(i)
            lo = min(lo, float(depth.min()))
            hi = max(hi, float(depth.max()))
            mean += float(depth.mean())
            std += float(depth.std())
            if log is print:
                print(f"\r{i + 1}/{len(self)}", end="")
        mean /= max(len(self), 1)
        std /= max(len(self), 1)
        if log is print:
            print()
        log(f"min depth: {lo}, max depth: {hi}")
        log(f"mean: [{mean}], std: [{std}]")
        return lo, hi, mean, std


DATASETS.register("nyuv2_s2d")(NYUV2S2DDataset)
