"""Depth-image utility & corruption library.

Parity target: lib/utils/data_augmentation.py (502 LoC, cleargrasp heritage;
not on the shipped training path but part of the public utils surface):
EXR depth io, depth<->RGB colormapping, point-cloud export, and the synthetic
sensor-corruption family (gaussian noise, ellipse dropouts).
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


# ----------------------------------------------------------------- EXR io --
def exr_loader(path: str, ndim: int = 3) -> np.ndarray:
    """Load an EXR depth/image file via OpenCV (float32)."""
    img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise FileNotFoundError(path)
    if ndim == 1 and img.ndim == 3:
        img = img[..., 0]
    return img.astype(np.float32)


def exr_saver(path: str, arr: np.ndarray):
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if not cv2.imwrite(path, arr):
        raise IOError(f"failed to write {path}")


# ------------------------------------------------------------- colormaps ---
def depth2rgb(depth: np.ndarray, min_depth: Optional[float] = None,
              max_depth: Optional[float] = None,
              color_mode: int = cv2.COLORMAP_JET,
              reverse_scale: bool = False) -> np.ndarray:
    """Colormap a depth image to uint8 RGB (data_augmentation depth2rgb)."""
    d = np.asarray(depth, np.float32)
    lo = d.min() if min_depth is None else min_depth
    hi = d.max() if max_depth is None else max_depth
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0, 1)
    if reverse_scale:
        norm = 1.0 - norm
    img = cv2.applyColorMap((norm * 255).astype(np.uint8), color_mode)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def scale_depth(depth: np.ndarray, scale: float = 1000.0) -> np.ndarray:
    """meters -> uint16 millimeters (or custom scale)."""
    return np.clip(depth * scale, 0, 65535).astype(np.uint16)


# ----------------------------------------------------------- point clouds --
def depth_to_point_cloud(depth: np.ndarray, fx: float, fy: float,
                         cx: float, cy: float,
                         rgb: Optional[np.ndarray] = None
                         ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Back-project a depth map (meters) to an (N, 3) point cloud."""
    h, w = depth.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w]
    z = depth.reshape(-1)
    x = ((xs.reshape(-1) - cx) / fx) * z
    y = ((ys.reshape(-1) - cy) / fy) * z
    pts = np.stack([x, y, z], axis=1)
    valid = z > 1e-6
    cols = rgb.reshape(-1, 3)[valid] if rgb is not None else None
    return pts[valid], cols


def write_point_cloud(path: str, points: np.ndarray,
                      colors: Optional[np.ndarray] = None):
    """ASCII PLY writer (replaces the reference's open3d dependency)."""
    n = points.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i,0]:.6f} {points[i,1]:.6f} {points[i,2]:.6f}"
            if colors is not None:
                c = colors[i].astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")


# ------------------------------------------------------------ corruptions --
def add_gaussian_noise(depth: np.ndarray, rng: np.random.Generator,
                       sigma_frac: float = 0.01) -> np.ndarray:
    """Depth-proportional gaussian sensor noise."""
    noise = rng.normal(0.0, 1.0, depth.shape).astype(np.float32)
    return np.where(depth > 0, depth * (1.0 + sigma_frac * noise), depth)


def ellipse_dropout(depth: np.ndarray, rng: np.random.Generator,
                    num_ellipses: int = 10,
                    max_axis: int = 20) -> np.ndarray:
    """Zero out random ellipses — the cleargrasp ellipse-dropout corruption."""
    out = depth.copy()
    h, w = depth.shape[:2]
    mask = np.ones((h, w), np.uint8)
    for _ in range(int(rng.integers(1, num_ellipses + 1))):
        center = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        axes = (int(rng.integers(1, max_axis)), int(rng.integers(1, max_axis)))
        angle = float(rng.uniform(0, 180))
        cv2.ellipse(mask, center, axes, angle, 0, 360, 0, -1)
    return out * mask.reshape(h, w, *([1] * (depth.ndim - 2)))
