"""End-to-end dataset loader tests against generated on-disk fixtures that
mimic each corpus's real layout — the reference has no such coverage (its
dataset_checker needs the actual datasets)."""

import os
import pickle

import cv2
import numpy as np
import pytest


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    assert cv2.imwrite(path, arr)


@pytest.fixture
def nyuv2_root(tmp_path):
    root = str(tmp_path / "nyuv2")
    ids = ["0001", "0042"]
    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    for split in ("train", "test"):
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.write("\n".join(ids))
        for i in ids:
            h, w = 480, 640
            _write_png(f"{root}/{split}/rgb/{i}.png",
                       rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
            depth = rng.randint(700, 9000, (h, w)).astype(np.uint16)
            _write_png(f"{root}/{split}/depth/{i}.png", depth)
            raw = depth.copy()
            raw[::3] = 0  # holes
            _write_png(f"{root}/{split}/depth_raw/{i}.png", raw)
            _write_png(f"{root}/{split}/norm_v2/{i}.png",
                       rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
            _write_png(f"{root}/{split}/labels_13/{i}.png",
                       rng.randint(0, 13, (h, w), dtype=np.uint8))
    return root


def test_nyuv2_train_and_test(nyuv2_root):
    from rdfc_gan_tpu.data.nyuv2 import NYUV21400Dataset

    ds = NYUV21400Dataset(nyuv2_root, mode="train")
    assert len(ds) == 2
    s = ds[0]
    assert s["rgb"].shape == (224, 304, 3)
    assert s["raw_depth"].shape == (224, 304, 1)
    assert s["gt_depth"].shape == (224, 304, 1)
    assert s["labels"].shape == (224, 304) and s["labels"].dtype == np.int32
    assert s["gt_normal"].shape == (224, 304, 3)
    assert s["depth_masks"].shape == (224, 304, 1)
    # gt depth normalized by (5,5): values in roughly [-1, 1]
    assert -1.1 < s["gt_depth"].min() and s["gt_depth"].max() < 1.1

    dt = NYUV21400Dataset(nyuv2_root, mode="test")
    st = dt[1]
    assert st["rgb"].shape == (224, 304, 3)
    assert np.isfinite(st["gt_depth"]).all()


def test_nyuv2_sparse_variant(nyuv2_root):
    from rdfc_gan_tpu.data.nyuv2 import NYUV21400SparseDataset

    ds = NYUV21400SparseDataset(nyuv2_root, mode="train", num_sample=100)
    s = ds[0]
    assert s["raw_depth"].shape == (256, 256, 1)
    nonzero = (s["raw_depth"] != 0).sum()
    assert nonzero <= 100  # sparse protocol


def test_nyuv2_pseudo_variant(nyuv2_root):
    from rdfc_gan_tpu.data.nyuv2 import NYUV21400PseudoDataset

    ds = NYUV21400PseudoDataset(nyuv2_root, mode="train")
    s = ds[0]
    assert s["raw_depth"].shape == (224, 304, 1)


@pytest.fixture
def sunrgbd_root(tmp_path):
    root = str(tmp_path / "sunrgbd")
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(1)
    names = {"rgb": [], "depth": [], "depth_bfx": [], "seg_label": [],
             "normal": []}
    for i in range(2):
        h, w = 120, 160
        rgb_p = f"img/{i}_rgb.png"
        _write_png(os.path.join(root, rgb_p),
                   rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        mm = rng.randint(500, 8000, (h, w)).astype(np.uint32)
        enc = ((mm << 3) & 0xFFFF | (mm >> 13)).astype(np.uint16)
        d_p = f"img/{i}_depth.png"
        _write_png(os.path.join(root, d_p), enc)
        bfx_p = f"img/{i}_bfx.png"
        _write_png(os.path.join(root, bfx_p), enc)
        n_p = f"img/{i}_norm.png"
        _write_png(os.path.join(root, n_p),
                   rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        l_p = f"img/{i}_label.pkl"
        with open(os.path.join(root, l_p), "wb") as f:
            pickle.dump(rng.randint(0, 37, (h, w)).astype(np.uint8), f)
        names["rgb"].append(rgb_p)
        names["depth"].append(d_p)
        names["depth_bfx"].append(bfx_p)
        names["normal"].append(n_p)
        names["seg_label"].append(l_p)
    for prefix in ("train_", "test_"):
        for k, files in names.items():
            with open(os.path.join(root, f"{prefix}{k}.txt"), "w") as f:
                f.write("\n".join(files))
    return root


def test_sunrgbd_train_and_test(sunrgbd_root):
    from rdfc_gan_tpu.data.sunrgbd import SUNRGBDPseudoDataset

    ds = SUNRGBDPseudoDataset(sunrgbd_root, mode="train")
    s = ds[0]
    assert s["rgb"].shape == (256, 256, 3)
    assert s["gt_depth"].shape == (256, 256, 1)
    assert s["labels"].shape == (256, 256)
    # bit-shift decode: depths in meters then (5,5)-normalized
    assert -1.2 < float(s["gt_depth"].min()) < 1.2

    dt = SUNRGBDPseudoDataset(sunrgbd_root, mode="test")
    st = dt[0]
    assert int(st["origin_h"]) == 120 and int(st["origin_w"]) == 160


def test_loader_over_real_fixture(nyuv2_root):
    from rdfc_gan_tpu.data import DataLoader
    from rdfc_gan_tpu.data.nyuv2 import NYUV21400Dataset

    ds = NYUV21400Dataset(nyuv2_root, mode="train")
    dl = DataLoader(ds, 2, shuffle=True, seed=0)
    batch = next(iter(dl))
    assert batch["rgb"].shape == (2, 224, 304, 3)
    assert batch["labels"].dtype == np.int32


@pytest.fixture
def s2d_root(tmp_path):
    import h5py
    import json

    root = str(tmp_path / "s2d")
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(2)
    split = {"train": [], "val": []}
    for mode in ("train", "val"):
        for i in range(2):
            fn = f"{mode}_{i}.h5"
            with h5py.File(os.path.join(root, fn), "w") as f:
                f["rgb"] = rng.randint(0, 255, (3, 480, 640), dtype=np.uint8)
                f["depth"] = rng.uniform(0.5, 9, (480, 640)).astype(np.float32)
            split[mode].append({"filename": fn})
    with open(os.path.join(root, "nyu.json"), "w") as f:
        json.dump(split, f)
    return root


def test_nyuv2_s2d_hdf5(s2d_root):
    from rdfc_gan_tpu.data.nyuv2_s2d import NYUV2S2DDataset

    ds = NYUV2S2DDataset(s2d_root, mode="train", num_sample=50)
    s = ds[0]
    assert s["rgb"].shape == (228, 304, 3)
    assert s["raw_depth"].shape == (228, 304, 1)
    assert (s["raw_depth"] != 0).sum() <= 50

    dt = NYUV2S2DDataset(s2d_root, mode="val", num_sample=50)
    st = dt[0]
    assert "gt_depth_origin" in st
    assert st["gt_depth_origin"].shape == (228, 304)


def test_s2d_stat_depth(s2d_root):
    """stat_depth parity (nyuv2_sparse_to_dense_dataset.py:401-438): corpus
    min/max and per-frame-averaged mean/std of the raw h5 depth maps."""
    from rdfc_gan_tpu.data.nyuv2_s2d import NYUV2S2DDataset

    ds = NYUV2S2DDataset(s2d_root, mode="train")
    lines = []
    lo, hi, mean, std = ds.stat_depth(log=lines.append)
    assert 0.4 < lo < hi < 9.1
    assert 0.5 < mean < 9.0 and std > 0
    assert any("min depth" in ln for ln in lines)


def test_base_show_dumps(nyuv2_root, tmp_path):
    """BaseDataset.show parity (lib/datasets/base.py:103-163): colormapped
    uint8 pngs per sample under save_dir/{iters:010d}/."""
    import cv2

    from rdfc_gan_tpu.data.nyuv2 import NYUV21400Dataset

    ds = NYUV21400Dataset(nyuv2_root, mode="val")
    s = ds[0]
    samples = {k: np.stack([s[k]]) for k in ("rgb", "raw_depth", "gt_depth")}
    samples["pred_depth"] = samples["gt_depth"] + 0.01
    out = ds.show(samples, iters=42, save_dir=str(tmp_path))
    assert out.endswith("0000000042")
    for name in ("rgb", "raw_depth", "pred_depth", "gt_depth", "pred_gray"):
        p = os.path.join(out, f"0_{name}.png")
        assert os.path.exists(p), name
        img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        assert img is not None and img.dtype == np.uint8


def test_nyuv2_r2r_hdf5(s2d_root):
    from rdfc_gan_tpu.data.nyuv2_r2r import NYUV2R2RDataset

    ds = NYUV2R2RDataset(s2d_root, mode="train")
    s = ds[0]
    assert s["rgb"].shape == (256, 320, 3)
    assert s["gt_depth"].shape == (256, 320, 1)


@pytest.fixture
def ddrnet_root(tmp_path):
    root = str(tmp_path / "ddr")
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(3)
    rows = []
    for i in range(2):
        h, w = 480, 640
        paths = {}
        for kind, arr in (
            ("rgb", rng.randint(0, 255, (h, w, 3), dtype=np.uint8)),
            ("raw", rng.randint(500, 2900, (h, w)).astype(np.uint16)),
            ("gt", rng.randint(500, 2900, (h, w)).astype(np.uint16)),
            ("mask", (rng.uniform(size=(h, w)) > 0.3).astype(np.uint8) * 255),
        ):
            p = os.path.join(root, f"{i}_{kind}.png")
            _write_png(p, arr)
            paths[kind] = p
        rows.append(f"{paths['rgb']},{paths['raw']},{paths['gt']},{paths['mask']}")
    for mode in ("train", "val"):
        with open(os.path.join(root, f"{mode}.csv"), "w") as f:
            f.write("\n".join(rows))
    return root


def test_ddrnet_human(ddrnet_root):
    from rdfc_gan_tpu.data.ddrnet_human import DDRNetHumanDataset

    ds = DDRNetHumanDataset(ddrnet_root, mode="train", times=3)
    assert len(ds) == 6  # epoch multiplier
    s = ds.get_train_data(0)
    assert s["rgb"].shape == (480, 640, 3)
    assert s["raw_depth"].shape == (480, 640, 1)
    dt = DDRNetHumanDataset(ddrnet_root, mode="val")
    st = dt.get_test_data(0)
    assert "evaluate_mask" in st


@pytest.fixture
def folder_root(tmp_path):
    root = str(tmp_path / "cg")
    rng = np.random.RandomState(4)
    for split in ("train", "val"):
        for i in range(2):
            _write_png(f"{root}/{split}/rgb/{i}.png",
                       rng.randint(0, 255, (100, 120, 3), dtype=np.uint8))
            _write_png(f"{root}/{split}/depth/{i}.png",
                       rng.randint(500, 9000, (100, 120)).astype(np.uint16))
    return root


def test_folder_dataset_cleargrasp(folder_root):
    from rdfc_gan_tpu.data.folder_dataset import FolderDepthDataset

    ds = FolderDepthDataset(folder_root, mode="train")
    s = ds[0]
    assert s["rgb"].shape == (256, 256, 3)
    # raw synthesized via ellipse dropout (no depth_raw dir)
    assert (s["raw_depth"] == 0).sum() >= 0
    dt = FolderDepthDataset(folder_root, mode="val")
    assert dt[0]["gt_depth"].shape == (256, 256, 1)


def test_nyuv2_decode_cache(nyuv2_root, tmp_path):
    """The decoded-sample cache must be a pure accelerator: identical
    samples with and without it, cache files created on first touch and
    hit on the second (loader perf, docs/PERF_NOTES.md round-4)."""
    import numpy as np

    from rdfc_gan_tpu.data.nyuv2 import NYUV21400Dataset

    plain = NYUV21400Dataset(nyuv2_root, mode="train")
    cache_dir = str(tmp_path / "decode_cache")
    cached = NYUV21400Dataset(nyuv2_root, mode="train",
                              decode_cache=cache_dir)
    import os

    a = plain[0]
    b = cached[0]                      # miss: decode + store
    files = os.listdir(cache_dir)
    assert files, "cache dir should have entries after first access"
    c = cached[0]                      # hit: load from .npz
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        np.testing.assert_array_equal(a[k], c[k], err_msg=k)
