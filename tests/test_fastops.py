"""Native fastops vs numpy-fallback equivalence (skipped when the .so is
absent — CI builds it with native/build.sh)."""

import numpy as np
import pytest

from rdfc_gan_tpu.data import fastops as F


def test_normalize_matches_numpy(rng):
    d = rng.uniform(0, 10, (32, 40)).astype(np.float32)
    d[:4] = 0.0
    got = F.depth_normalize_zero_preserve(d, 5.0, 5.0)
    want = (d - 5.0) / 5.0
    want[d <= 1e-8] = 0.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sparse_sample_counts(rng):
    d = rng.uniform(0.5, 10, (64, 64)).astype(np.float32)
    out = F.sparse_sample(d, 200, seed=7)
    assert int((out > 0).sum()) == 200
    # kept values identical to source
    m = out > 0
    np.testing.assert_array_equal(out[m], d[m])


def test_sunrgbd_decode_roundtrip():
    mm = np.arange(0, 60000, 777, dtype=np.uint16)
    enc = ((mm.astype(np.uint32) << 3) & 0xFFFF |
           (mm.astype(np.uint32) >> 13)).astype(np.uint16)
    dec = F.sunrgbd_depth_decode(enc)
    np.testing.assert_allclose(dec, mm.astype(np.float32) / 1000.0,
                               atol=1e-6)


def test_hole_image_zeroes():
    img = np.ones((40, 50), np.float32)
    out = F.hole_image(img, 8, 8, 3, seed=3)
    holes = int((out == 0).sum())
    assert 64 <= holes <= 3 * 64  # overlaps possible (reference behavior)


def test_pepper_mask_distribution():
    m = F.pepper_mask((256, 256), snr=0.98, seed=1)
    frac = (m > 0).mean()
    assert 0.01 < frac < 0.03  # ~2% corrupted
    assert set(np.unique(m)) <= {0, 1, 2}


def test_depth_mm_to_m():
    d = np.array([[0, 1000, 12345]], np.uint16)
    out = F.depth_mm_to_m(d)
    np.testing.assert_allclose(out, [[0.0, 1.0, 12.345]], atol=1e-5)
