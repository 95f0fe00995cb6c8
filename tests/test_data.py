import numpy as np
import pytest

from rdfc_gan_tpu.data import DataLoader, SyntheticDataset
from rdfc_gan_tpu.data.pseudo_hole import (MaskBlacks, SegmentationHighLight,
                                           Spatter, hole_image)
from rdfc_gan_tpu.data.sunrgbd import SUNRGBDPseudoDataset
from rdfc_gan_tpu.data.transforms import (CenterCrop, Compose,
                                          CutOffBlackBorder, Normalize,
                                          RandomCrop, RandomFlip,
                                          RandomRescale, Rescale,
                                          SparseSampler)


def _sample(h=40, w=50, rng=None):
    rng = rng or np.random.RandomState(0)
    return dict(
        rgb=rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
        raw_depth=rng.uniform(0, 10, (h, w, 1)).astype(np.float32),
        gt_depth=rng.uniform(0.5, 10, (h, w, 1)).astype(np.float32),
        gt_normal=rng.normal(size=(h, w, 3)).astype(np.float32),
        labels=rng.randint(0, 14, (h, w)).astype(np.int32),
    )


def test_normalize_zero_preserving():
    s = _sample()
    s["raw_depth"][5:10, 5:10] = 0.0
    out = Normalize()(dict(s), np.random.default_rng(0))
    assert np.all(out["raw_depth"][5:10, 5:10] == 0.0)
    # non-hole pixels normalized by (5,5)
    assert out["gt_depth"].max() <= 1.0 + 1e-5
    assert out["rgb"].min() >= -1.0 - 1e-5


def test_flip_negates_normal_x():
    s = _sample()
    g = np.random.default_rng(0)
    flipped = RandomFlip(p=1.0)(dict(s), g)
    np.testing.assert_allclose(flipped["gt_normal"][..., 0],
                               -s["gt_normal"][:, ::-1, 0])
    np.testing.assert_allclose(flipped["rgb"], s["rgb"][:, ::-1])


def test_crops_and_rescale():
    s = _sample(40, 50)
    g = np.random.default_rng(0)
    out = Compose([RandomRescale(1.2, 1.2), RandomCrop(32, 40)])(dict(s), g)
    assert out["rgb"].shape == (32, 40, 3)
    assert out["labels"].shape == (32, 40)
    out2 = CenterCrop(16, 20)(dict(out), g)
    assert out2["raw_depth"].shape == (16, 20, 1)
    out3 = Rescale(8, 10)(dict(out2), g)
    assert out3["gt_normal"].shape == (8, 10, 3)


def test_cutoff_black_border():
    s = _sample(480, 640)
    out = CutOffBlackBorder()(dict(s))
    assert out["rgb"].shape == (480 - 45 - 15, 640 - 45 - 40, 3)


def test_sparse_sampler_counts():
    s = _sample()
    g = np.random.default_rng(0)
    out = SparseSampler(num_samples=100)(dict(s), g)
    assert (out["raw_depth"] > 0).sum() == 100


def test_hole_image_zeroes():
    img = np.ones((40, 50), np.float32)
    out = hole_image(img, 8, 8, 3, np.random.default_rng(0))
    holes = (out == 0).sum()
    # the reference's no-overlap bookkeeping indexes the optional-region
    # grid transposed (pseudo_hole.py:26-30), so rectangles CAN overlap;
    # we reproduce that behavior: 1..3 rectangles of 64 px
    assert 64 <= holes <= 3 * 8 * 8


def test_spatter_fraction():
    s = {"raw_depth": np.ones((64, 64), np.float32)}
    mask = Spatter(percentile_void=0.05)(s, np.random.default_rng(0))
    frac = mask.mean()
    assert 0.02 < frac < 0.10


def test_mask_blacks_and_highlight():
    rgb = np.full((8, 8, 3), 128.0)
    rgb[:2, :2] = 0.0  # black corner
    m = MaskBlacks()({"rgb": rgb})
    assert m[:2, :2].all() and not m[2:, 2:].any()
    rgb2 = np.full((8, 8, 3), 250.0)  # saturated white -> highlight
    m2 = SegmentationHighLight()({"rgb": rgb2})
    assert m2.all()


def test_sunrgbd_bitshift_decode():
    # encode depth 1.234m into the SUNRGBD uint16 format: value stored
    # left-shifted by 3 (with wraparound bits)
    mm = np.uint16(1234)
    encoded = np.uint16((int(mm) << 3) & 0xFFFF | (int(mm) >> 13))
    out = SUNRGBDPseudoDataset.get_depth_inpaint(np.array([[encoded]]))
    np.testing.assert_allclose(out, 1.234, atol=1e-6)


def test_loader_epoch_determinism():
    ds = SyntheticDataset(length=16, height=8, width=8)
    dl = DataLoader(ds, 4, shuffle=True, seed=3)
    dl.set_epoch(1)
    b1 = [b["rgb"].sum() for b in dl]
    dl.set_epoch(1)
    b2 = [b["rgb"].sum() for b in dl]
    assert b1 == b2
    dl.set_epoch(2)
    b3 = [b["rgb"].sum() for b in dl]
    assert b1 != b3


def test_loader_shapes_and_len():
    ds = SyntheticDataset(length=10, height=8, width=8)
    dl = DataLoader(ds, 4, shuffle=False, drop_last=True)
    assert len(dl) == 2
    batch = next(iter(dl))
    assert batch["rgb"].shape == (4, 8, 8, 3)
    assert batch["labels"].dtype == np.int32


def test_random_rotate_preserves_shapes():
    from rdfc_gan_tpu.data.transforms import RandomRotate

    s = _sample(30, 40)
    out = RandomRotate(5.0)(dict(s), np.random.default_rng(0))
    assert out["rgb"].shape == (30, 40, 3)
    assert out["raw_depth"].shape == (30, 40, 1)
    assert out["labels"].shape == (30, 40)
    # labels rotated with NEAREST: value set must not grow
    assert set(np.unique(out["labels"])) <= set(np.unique(s["labels"])) | {0}


def test_save_vis_grid_and_labels(tmp_path):
    from rdfc_gan_tpu.utils import save_vis

    rng = np.random.RandomState(0)
    imgs = [rng.uniform(-1, 1, (2, 8, 10, 1)).astype(np.float32)
            for _ in range(3)]
    merged = save_vis.merge_images([save_vis.to_data(x) for x in imgs],
                                   num_imgs_per_scene=3, batch_size=2)
    assert merged.shape == (2 * 8, 3 * 10, 3)
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0)]
    lab = save_vis.color_label(np.array([[0, 1], [2, 1]]), pal, 3)
    assert lab.shape == (2, 2, 3)
    assert tuple(lab[0, 1]) == (255.0, 0.0, 0.0)
    path = str(tmp_path / "grid.jpg")
    save_vis.save_image_grid(path, imgs, 3, 2)
    import os

    assert os.path.exists(path)


def test_loader_pad_and_indices():
    """drop_last=False pads the final batch to full size and flags pad rows
    with sample_idx == -1 so Eval covers the split exactly once."""
    ds = SyntheticDataset(length=10, height=8, width=8)
    dl = DataLoader(ds, 4, shuffle=False, drop_last=False, with_indices=True)
    assert len(dl) == 3
    batches = list(dl)
    assert all(b["rgb"].shape[0] == 4 for b in batches)
    idx = np.concatenate([b["sample_idx"] for b in batches])
    assert (idx >= 0).sum() == 10
    np.testing.assert_array_equal(idx[:10], np.arange(10))
    np.testing.assert_array_equal(idx[10:], [-1, -1])


def test_loader_per_process_shards_equal_length(monkeypatch):
    """Shards are padded to equal per-host length (DistributedSampler
    semantics): unequal __len__ across hosts would deadlock SPMD collectives
    (ADVICE round-1 #1). n=7, pc=2, bs=2 must give 2 batches on BOTH hosts."""
    import jax

    ds = SyntheticDataset(length=7, height=8, width=8)
    seen = {}
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        dl = DataLoader(ds, 2, shuffle=False, drop_last=True,
                        per_process=True, with_indices=True)
        assert len(dl) == 2
        seen[rank] = np.concatenate(
            [b["sample_idx"] for b in dl])
    # union of shards covers the dataset; the pad duplicates a leading index
    union = set(seen[0].tolist()) | set(seen[1].tolist())
    assert union == set(range(7))
    assert len(seen[0]) == len(seen[1]) == 4


def test_multiscale_label_and_formatters():
    """MultiScaleLabel pyramids + TypeCheck/EnsureChannels formatters
    (RDF-GAN/lib/dataset/transforms/ parity)."""
    import numpy as np

    from rdfc_gan_tpu.data.transforms import (EnsureChannels, MultiScaleLabel,
                                              TypeCheck)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 14, size=(64, 96)).astype(np.uint8)
    sample = {"labels": labels, "rgb": rng.integers(
        0, 255, size=(64, 96, 3)).astype(np.uint16)}

    sample = TypeCheck(["labels", "rgb"])(sample, rng)
    assert sample["labels"].dtype == np.float32
    assert sample["rgb"].dtype == np.float32

    sample = MultiScaleLabel()(sample, rng)
    for rate in (8, 16, 32):
        ld = sample[f"label_down_{rate}"]
        assert ld.shape == (64 // rate, 96 // rate)
        # nearest-neighbor: every downsampled value exists in the source
        assert np.isin(ld, labels).all()
    # rate 32 oracle: cv2 INTER_NEAREST picks source pixel floor(i*scale)
    want = sample["labels"][::32, ::32][:2, :3]
    np.testing.assert_array_equal(sample["label_down_32"], want)

    sample = EnsureChannels(["labels"])(sample, rng)
    assert sample["labels"].shape == (64, 96, 1)


def test_data_augmentation_corruption_zoo(tmp_path):
    """The cleargrasp-heritage corruption/io family
    (lib/utils/data_augmentation.py parity)."""
    import numpy as np

    from rdfc_gan_tpu.utils import data_augmentation as da

    rng = np.random.default_rng(0)
    depth = np.abs(rng.normal(2.0, 0.5, (48, 64))).astype(np.float32)
    rgb = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)

    # uint16 png roundtrip + refusal of wrong dtype
    import cv2
    import pytest as _pytest
    p = str(tmp_path / "d.png")
    da.save_uint16_png(p, da.scale_depth(depth))
    back = da.unscale_depth(cv2.imread(p, cv2.IMREAD_ANYDEPTH))
    np.testing.assert_allclose(back, depth, atol=1e-3)
    with _pytest.raises(ValueError):
        da.save_uint16_png(p, depth)

    norm = da.normalize_depth_img(depth, np.uint8, 0.0, 4.0)
    assert norm.dtype == np.uint8 and norm.max() > 0

    noisy = da.add_noise(rgb, rng)
    assert noisy.shape == rgb.shape and noisy.dtype == np.uint8
    chrom = da.chromatic_transform(rgb, rng)
    assert chrom.shape == rgb.shape

    cam = dict(fx=500.0, fy=500.0, cx=32.0, cy=24.0, xres=64, yres=48)
    xyz = da.compute_xyz(depth, cam)
    assert xyz.shape == (48, 64, 3)
    np.testing.assert_allclose(xyz[..., 2], depth)
    # back-projection oracle: x at the principal point is 0
    assert abs(xyz[24, 32, 0]) < 1e-4 and abs(xyz[24, 32, 1]) < 1e-4

    params = dict(ellipse_dropout_mean=5, ellipse_gamma_shape=5.0,
                  ellipse_gamma_scale=1.0, gamma_shape=1000.0,
                  gamma_scale=0.001, gaussian_scale=0.005,
                  gp_rescale_factor=4)
    vm = (depth > 0).astype(np.uint8)
    dropped = da.dropout_random_ellipses_4mask(vm, rng, params)
    assert dropped.sum() <= vm.sum()
    cm = np.zeros_like(vm)
    grown = da.dropout_random_ellipses_4corruptmask(cm, rng, params)
    assert grown.sum() >= cm.sum()

    nd = da.add_noise_to_depth(depth, rng, params)
    assert nd.shape == depth.shape and (nd > 0).all()
    nxyz = da.add_noise_to_xyz(xyz, depth, rng, params)
    assert nxyz.shape == xyz.shape
    assert not np.allclose(nxyz, xyz)  # reference returned None here


def test_multiscale_label_feeds_pyramid_supervision():
    """MultiScaleLabel's label_down pyramid matches the ESANet side-output
    resolutions (1/8, 1/16, 1/32) and feeds the seg losses — the v1
    pyramid-supervision training contract (RDF-GAN decoder.py:74-130)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdfc_gan_tpu.data.transforms import MultiScaleLabel
    from rdfc_gan_tpu.losses.gan_loss import softmax_cross_entropy_loss
    from rdfc_gan_tpu.models.esanet import ESANetOneModality

    H, W, C = 64, 64, 5
    rng = np.random.default_rng(0)
    sample = {"labels": rng.integers(0, C, size=(H, W)).astype(np.int32)}
    sample = MultiScaleLabel()(sample, rng)

    m = ESANetOneModality(height=H, width=W, num_classes=C,
                          channels_decoder=(16, 16, 16),
                          pyramid_supervision=True)
    x = jnp.asarray(rng.normal(size=(1, H, W, 3)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    out, s8, s16, s32 = m.apply(variables, x, train=True,
                                mutable=["batch_stats"])[0]
    assert out.shape == (1, H, W, C)
    total = softmax_cross_entropy_loss(out, jnp.asarray(
        sample["labels"])[None])
    for side, rate in ((s8, 8), (s16, 16), (s32, 32)):
        lbl = jnp.asarray(sample[f"label_down_{rate}"])[None]
        assert side.shape[1:3] == lbl.shape[1:3], rate
        total = total + softmax_cross_entropy_loss(side, lbl)
    assert np.isfinite(float(total))


def test_process_loader_matches_thread_loader():
    """worker_backend='process' must be bit-identical to the thread loader:
    per-sample RNG is a pure fn of (seed, epoch, idx) (base.py:92), and the
    workers sync the epoch before fetching."""
    ds = SyntheticDataset(length=12, height=8, width=8)
    thr = DataLoader(ds, 4, shuffle=True, seed=3)
    prc = DataLoader(ds, 4, shuffle=True, seed=3, num_workers=2,
                     worker_backend="process")
    try:
        for epoch in (0, 1):
            thr.set_epoch(epoch)
            prc.set_epoch(epoch)
            for bt, bp in zip(thr, prc):
                assert set(bt) == set(bp)
                for k in bt:
                    np.testing.assert_array_equal(bt[k], bp[k])
    finally:
        prc.close()


def test_process_loader_pads_and_indices():
    ds = SyntheticDataset(length=10, height=8, width=8)
    dl = DataLoader(ds, 4, shuffle=False, drop_last=False, with_indices=True,
                    num_workers=2, worker_backend="process")
    try:
        batches = list(dl)
        assert len(batches) == 3
        si = batches[-1]["sample_idx"]
        assert (si == np.array([8, 9, -1, -1], np.int32)).all()
    finally:
        dl.close()
