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


def save_uint16_png(path: str, image: np.ndarray):
    """Write a uint16 png (data_augmentation.py:105-118 contract: refuses
    non-uint16 input instead of silently converting)."""
    arr = np.asarray(image)
    if arr.dtype != np.uint16:
        raise ValueError(f"expected uint16, got {arr.dtype}")
    if not cv2.imwrite(path, arr):
        raise IOError(f"failed to write {path}")


def normalize_depth_img(depth: np.ndarray, dtype=np.uint8,
                        min_depth: float = 0.0,
                        max_depth: float = 1.0) -> np.ndarray:
    """Scale a float depth map into the full range of an integer dtype
    (data_augmentation.py:121-153): values outside [min,max] clamp, invalid
    (<=0) pixels map to 0."""
    d = np.asarray(depth, np.float32)
    lo, hi = float(min_depth), float(max_depth)
    full = np.iinfo(dtype).max
    norm = np.clip((d - lo) / max(hi - lo, 1e-8), 0.0, 1.0) * full
    norm = np.where(d > 0, norm, 0)
    return norm.astype(dtype)


def unscale_depth(depth: np.ndarray, scale: float = 1000.0) -> np.ndarray:
    """uint16 millimeters -> float32 meters (inverse of scale_depth)."""
    return np.asarray(depth, np.float32) / scale


def add_noise(image: np.ndarray, rng: np.random.Generator,
              level: float = 0.1) -> np.ndarray:
    """RGB corruption (data_augmentation.py:302-328): 90% additive gaussian
    noise at a random sigma, 10% axis-aligned motion blur."""
    if rng.random() < 0.9:
        sigma = rng.random() * rng.uniform(0, level) * 256
        gauss = sigma * rng.standard_normal(image.shape[:2])
        noisy = image + gauss[..., None]
        return np.clip(noisy, 0, 255).astype(np.uint8)
    size = int(rng.choice([3, 5, 7, 9, 11, 15]))
    k = np.zeros((size, size), np.float32)
    if rng.random() < 0.5:
        k[(size - 1) // 2, :] = 1.0
    else:
        k[:, (size - 1) // 2] = 1.0
    return cv2.filter2D(image, -1, k / size).astype(np.uint8)


def chromatic_transform(image: np.ndarray, rng: np.random.Generator,
                        label: Optional[np.ndarray] = None,
                        d_h: Optional[float] = None,
                        d_s: Optional[float] = None,
                        d_l: Optional[float] = None) -> np.ndarray:
    """Random hue/luminosity/saturation jitter in HLS space
    (data_augmentation.py:332-358); labeled pixels keep original colors."""
    if d_h is None:
        d_h = (rng.random() - 0.5) * 0.1 * 180
    if d_l is None:
        d_l = (rng.random() - 0.5) * 0.2 * 256
    if d_s is None:
        d_s = (rng.random() - 0.5) * 0.2 * 256
    hls = cv2.cvtColor(image, cv2.COLOR_BGR2HLS)
    h, l, s = cv2.split(hls)
    new = cv2.merge(((h + d_h) % 180, np.clip(l + d_l, 0, 255),
                     np.clip(s + d_s, 0, 255))).astype(np.uint8)
    out = cv2.cvtColor(new, cv2.COLOR_HLS2BGR)
    if label is not None:
        iy, ix = np.where(label > 0)
        out[iy, ix, :] = image[iy, ix, :]
    return out


def build_matrix_of_indices(height: int, width: int) -> np.ndarray:
    """[H, W, 2] array with B[...,0]=y, B[...,1]=x
    (data_augmentation.py:361-365)."""
    return np.indices((height, width), dtype=np.float32).transpose(1, 2, 0)


def compute_xyz(depth: np.ndarray, camera_params: dict) -> np.ndarray:
    """Ordered [H, W, 3] point cloud from a metric depth image
    (data_augmentation.py:368-388)."""
    idx = build_matrix_of_indices(camera_params["yres"],
                                  camera_params["xres"])
    z = depth
    x = (idx[..., 1] - camera_params["cx"]) * z / camera_params["fx"]
    y = (idx[..., 0] - camera_params["cy"]) * z / camera_params["fy"]
    return np.stack([x, y, z], axis=-1)


def _dropout_ellipses(mask: np.ndarray, rng: np.random.Generator,
                      noise_params: dict, seed_from_zero: bool,
                      paint: int) -> np.ndarray:
    out = mask.copy()
    n = rng.poisson(noise_params["ellipse_dropout_mean"])
    pool = np.array(np.where(out == 0 if seed_from_zero else out > 0)).T
    if n == 0 or pool.shape[0] == 0:
        return out
    centers = pool[rng.choice(pool.shape[0], size=n)]
    xr = rng.gamma(noise_params["ellipse_gamma_shape"],
                   noise_params["ellipse_gamma_scale"], size=n)
    yr = rng.gamma(noise_params["ellipse_gamma_shape"],
                   noise_params["ellipse_gamma_scale"], size=n)
    angles = rng.integers(0, 360, size=n)
    # paint is constant, so drawing straight into the output is identical
    # to the reference's temp-mask + scatter (and loader-hot-path cheap)
    out = np.ascontiguousarray(out)
    for i in range(n):
        cv2.ellipse(out, tuple(centers[i][::-1].astype(int)),
                    (int(round(xr[i])), int(round(yr[i]))),
                    angle=int(angles[i]), startAngle=0, endAngle=360,
                    color=int(paint), thickness=-1)
    return out


def dropout_random_ellipses_4corruptmask(mask: np.ndarray,
                                         rng: np.random.Generator,
                                         noise_params: dict) -> np.ndarray:
    """Grow a corruption mask by random ellipses seeded at its zero pixels
    (DexNet-2.0 heritage, data_augmentation.py:391-424)."""
    return _dropout_ellipses(mask, rng, noise_params, seed_from_zero=True,
                             paint=1)


def dropout_random_ellipses_4mask(valid_mask: np.ndarray,
                                  rng: np.random.Generator,
                                  noise_params: dict) -> np.ndarray:
    """Drop random ellipses out of a validity mask
    (data_augmentation.py:427-462)."""
    return _dropout_ellipses(valid_mask, rng, noise_params,
                             seed_from_zero=False, paint=0)


def add_noise_to_depth(depth: np.ndarray, rng: np.random.Generator,
                       noise_params: dict) -> np.ndarray:
    """Multiplicative gamma noise (data_augmentation.py:465-476)."""
    return depth * rng.gamma(noise_params["gamma_shape"],
                             noise_params["gamma_scale"])


def add_noise_to_xyz(xyz: np.ndarray, depth: np.ndarray,
                     rng: np.random.Generator,
                     noise_params: dict) -> np.ndarray:
    """Approximate Gaussian-process noise: low-res anisotropic gaussian,
    bicubic-upscaled, applied at valid depth (data_augmentation.py:479-495;
    returns the noised copy instead of mutating in place — the reference's
    `return` without a value is a latent bug)."""
    out = xyz.copy()
    h, w, c = xyz.shape
    sh, sw = (np.array([h, w]) / noise_params["gp_rescale_factor"]).astype(int)
    noise = rng.normal(0.0, noise_params["gaussian_scale"], size=(sh, sw, c))
    noise = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC)
    out[depth > 0, :] += noise[depth > 0, :]
    return out


def imread_indexed(path: str) -> np.ndarray:
    """Load a palette-indexed segmentation png as its index array
    (data_augmentation.py:498-502)."""
    from PIL import Image

    return np.atleast_3d(np.array(Image.open(path)))[..., 0]
