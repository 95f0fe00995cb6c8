"""Deformable PSROI pooling semantics tests (the reference exports this op
but never uses it on a model path — we keep functional parity anyway)."""

import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.ops.deform_roi import deform_psroi_pooling


def test_constant_feature_pools_to_constant():
    feat = jnp.full((1, 16, 16, 4), 2.5)
    rois = jnp.asarray([[0, 4, 4, 60, 60]], jnp.float32)
    out = deform_psroi_pooling(feat, rois, None, pooled_size=3,
                               spatial_scale=0.25)
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)


def test_roi_batch_indexing(rng):
    feat = np.zeros((2, 8, 8, 2), np.float32)
    feat[0] = 1.0
    feat[1] = 5.0
    rois = jnp.asarray([[0, 0, 0, 8, 8], [1, 0, 0, 8, 8]], jnp.float32)
    out = deform_psroi_pooling(jnp.asarray(feat), rois, None, pooled_size=2,
                               spatial_scale=1.0)
    assert abs(float(out[0].mean()) - 1.0) < 0.2
    assert abs(float(out[1].mean()) - 5.0) < 1.0


def test_offsets_shift_sampling(rng):
    # horizontal ramp: positive x-offset increases pooled values
    ramp = np.tile(np.arange(16, dtype=np.float32)[None, :, None], (16, 1, 1))
    feat = jnp.asarray(ramp[None])
    rois = jnp.asarray([[0, 2, 2, 14, 14]], jnp.float32)
    base = deform_psroi_pooling(feat, rois, None, pooled_size=2,
                                spatial_scale=1.0)
    off = jnp.zeros((1, 2, 2, 2)).at[..., 1].set(0.5)  # +x normalized offset
    shifted = deform_psroi_pooling(feat, rois, off, pooled_size=2,
                                   spatial_scale=1.0)
    assert float((shifted - base).mean()) > 0.1
