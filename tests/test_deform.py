"""Oracle tests for deformable ops — port of the reference extension's test
strategy (deformconv/test.py:36-181): zero-offset equivalence against a dense
conv, bilinear sampling semantics, and autodiff gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from rdfc_gan_tpu.ops import (
    bilinear_sample,
    deform_gather,
    kernel_grid_offsets,
    modulated_deform_conv,
)
from rdfc_gan_tpu.ops.nlspn import (
    NLSPNParamsSpec,
    nlspn_offset_affinity,
    nlspn_propagate,
    nlspn_refine,
)


def _dense_conv(feat, weight_kio, kh, kw):
    """Oracle: lax conv with SAME padding, NHWC/HWIO."""
    w = weight_kio.reshape(kh, kw, feat.shape[-1], weight_kio.shape[-1])
    return jax.lax.conv_general_dilated(
        feat, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_zero_offset_equals_conv(rng):
    B, H, W, Cin, Cout, k = 2, 9, 11, 3, 4, 3
    feat = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(k * k, Cin, Cout)).astype(np.float32))
    offsets = jnp.zeros((B, H, W, k * k, 2))
    mask = jnp.ones((B, H, W, k * k))
    got = modulated_deform_conv(feat, offsets, mask, weight, kernel_size=(k, k))
    want = _dense_conv(feat, weight, k, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_zero_offset_grouped_equals_depthwise(rng):
    B, H, W, C, k = 1, 7, 8, 4, 3
    feat = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    # groups == channels, per-channel kernels
    weight = jnp.asarray(rng.normal(size=(k * k, 1, C)).astype(np.float32))
    offsets = jnp.zeros((B, H, W, k * k, 2))
    mask = jnp.ones((B, H, W, k * k))
    got = modulated_deform_conv(feat, offsets, mask, weight, kernel_size=(k, k),
                                groups=C)
    w = weight.reshape(k, k, 1, C)
    want = jax.lax.conv_general_dilated(
        feat, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_integer_offset_is_shift(rng):
    """Offsetting every tap by (0,1) equals convolving a shifted image."""
    B, H, W, C, k = 1, 8, 8, 2, 3
    feat = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    weight = jnp.asarray(rng.normal(size=(k * k, C, 3)).astype(np.float32))
    offsets = jnp.zeros((B, H, W, k * k, 2)).at[..., 1].set(1.0)  # dx=+1
    mask = jnp.ones((B, H, W, k * k))
    got = modulated_deform_conv(feat, offsets, mask, weight, kernel_size=(k, k))
    shifted = jnp.pad(feat, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    want = _dense_conv(shifted, weight, k, k)
    # interior columns only (boundary treatment differs at the seam)
    np.testing.assert_allclose(
        np.asarray(got[:, 1:-1, 1:-2]), np.asarray(want[:, 1:-1, 1:-2]),
        rtol=1e-4, atol=1e-4,
    )


def test_bilinear_sample_integer_and_oob(rng):
    feat = jnp.asarray(rng.normal(size=(1, 5, 6, 2)).astype(np.float32))
    y = jnp.array([[2.0, -3.0, 1.5]])
    x = jnp.array([[3.0, 2.0, 2.0]])
    out = bilinear_sample(feat, y, x)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(feat[0, 2, 3]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[0, 1]), 0.0)  # OOB -> 0
    mid = 0.5 * (feat[0, 1, 2] + feat[0, 2, 2])
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(mid), rtol=1e-5)


def test_fractional_offset_interpolates(rng):
    """0.5-pixel offset on a linear ramp = exact half-step value."""
    H, W = 8, 8
    ramp = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    feat = jnp.broadcast_to(ramp, (1, H, W, 1))
    k = 1
    offsets = jnp.full((1, H, W, 1, 2), 0.0).at[..., 1].set(0.5)
    samples = deform_gather(feat, offsets, None, kernel_size=(1, 1))
    np.testing.assert_allclose(
        np.asarray(samples[0, :, 1:-1, 0, 0]),
        np.asarray(feat[0, :, 1:-1, 0]) + 0.5,
        rtol=1e-5,
    )


def test_deform_conv_gradients(rng):
    jax.config.update("jax_enable_x64", True)
    try:
        B, H, W, Cin, Cout, k = 1, 6, 6, 2, 2, 3
        feat = jnp.asarray(rng.normal(size=(B, H, W, Cin)))
        weight = jnp.asarray(rng.normal(size=(k * k, Cin, Cout)))
        offsets = jnp.asarray(
            rng.uniform(-0.4, 0.4, size=(B, H, W, k * k, 2)))
        mask = jnp.asarray(rng.uniform(0.2, 1.0, size=(B, H, W, k * k)))

        def f(feat, offsets, mask, weight):
            return modulated_deform_conv(feat, offsets, mask, weight,
                                         kernel_size=(k, k)).sum()

        check_grads(f, (feat, offsets, mask, weight), order=1, modes=["rev"],
                    atol=1e-3, rtol=1e-3)
    finally:
        jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------- NLSPN ----


def _spec(**kw):
    return NLSPNParamsSpec(**kw)


def test_nlspn_affinity_normalization(rng):
    spec = _spec()
    B, H, W = 2, 6, 6
    raw = jnp.asarray(rng.normal(size=(B, H, W, 3 * spec.num_neighbors)).astype(np.float32) * 3)
    conf = jnp.asarray(rng.uniform(0, 1, size=(B, H, W, 1)).astype(np.float32))
    gamma = jnp.asarray(spec.affinity_gamma * spec.num_neighbors)
    offsets, aff = nlspn_offset_affinity(raw, conf, gamma, spec)
    assert offsets.shape == (B, H, W, 9, 2)
    assert aff.shape == (B, H, W, 9)
    # center tap: zero offset, aff_ref = 1 - sum(neighbors)
    np.testing.assert_allclose(np.asarray(offsets[..., 4, :]), 0.0)
    np.testing.assert_allclose(np.asarray(aff.sum(-1)), 1.0, atol=1e-5)
    # neighbor |aff| sums to <= 1 after abs-sum normalization
    nb = jnp.concatenate([aff[..., :4], aff[..., 5:]], axis=-1)
    assert float(jnp.abs(nb).sum(-1).max()) <= 1.0 + 1e-4


def test_nlspn_identity_affinity_preserves(rng):
    """All-neighbor affinity 0 (raw aff=0 under TGASS) => aff_ref=1 =>
    propagation is the identity regardless of prop_time."""
    spec = _spec(prop_time=5, conf_prop=False)
    B, H, W = 1, 6, 7
    raw = jnp.zeros((B, H, W, 3 * spec.num_neighbors))
    # random offsets should not matter because their affinities are 0
    raw = raw.at[..., : 2 * spec.num_neighbors].set(
        jnp.asarray(rng.uniform(-2, 2, size=(B, H, W, 2 * spec.num_neighbors)))
    )
    gamma = jnp.asarray(4.0)
    offsets, aff = nlspn_offset_affinity(raw, None, gamma, spec)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    out = nlspn_propagate(feat, offsets, aff, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-5)


def test_nlspn_single_step_matches_manual_gather(rng):
    """One propagation step with zero offsets == spatially-varying 3x3 conv."""
    spec = _spec(prop_time=1, conf_prop=False)
    B, H, W = 1, 5, 5
    num = spec.num_neighbors
    raw = jnp.asarray(rng.normal(size=(B, H, W, 3 * num)).astype(np.float32))
    raw = raw.at[..., : 2 * num].set(0.0)  # zero offsets
    gamma = jnp.asarray(4.0)
    offsets, aff = nlspn_offset_affinity(raw, None, gamma, spec)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    out = nlspn_propagate(feat, offsets, aff, spec)

    # manual: zero-padded neighborhood weighted by aff (row-major taps)
    fpad = np.zeros((H + 2, W + 2), np.float32)
    fpad[1:-1, 1:-1] = np.asarray(feat[0, ..., 0])
    want = np.zeros((H, W), np.float32)
    taps = kernel_grid_offsets(3, 3).astype(int)
    a = np.asarray(aff[0])
    for t, (dy, dx) in enumerate(taps):
        want += a[..., t] * fpad[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
    np.testing.assert_allclose(np.asarray(out[0, ..., 0]), want, atol=1e-5)


def test_nlspn_preserve_input(rng):
    spec = _spec(prop_time=3, conf_prop=False, preserve_input=True)
    B, H, W = 1, 6, 6
    raw = jnp.asarray(rng.normal(size=(B, H, W, 3 * spec.num_neighbors)).astype(np.float32))
    gamma = jnp.asarray(4.0)
    offsets, aff = nlspn_offset_affinity(raw, None, gamma, spec)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    fix = jnp.zeros((B, H, W, 1)).at[0, 2, 3, 0].set(5.0)
    out = nlspn_propagate(feat, offsets, aff, spec, feat_fix=fix)
    assert out.shape == feat.shape  # smoke: runs with preservation enabled


def test_nlspn_refine_end_to_end_and_grads(rng):
    jax.config.update("jax_enable_x64", True)
    try:
        spec = _spec(prop_time=2)
        B, H, W = 1, 5, 5
        raw = jnp.asarray(
            rng.normal(size=(B, H, W, 3 * spec.num_neighbors)) * 0.1)
        # keep learned offsets away from integer boundaries: floor() is
        # discontinuous there and the numerical diff would cross a tap
        num = spec.num_neighbors
        raw = raw.at[..., : 2 * num].set(
            0.3 + 0.1 * jnp.tanh(raw[..., : 2 * num]))
        conf = jnp.asarray(rng.uniform(0.2, 1, size=(B, H, W, 1)))
        pred = jnp.asarray(rng.normal(size=(B, H, W, 1)))
        gamma = jnp.asarray(4.0)

        def f(pred, raw, conf, gamma):
            return nlspn_refine(pred, raw, conf, gamma, spec).sum()

        # |aff| and the >=1 abs-sum clamp are non-smooth; 0.5% slack
        check_grads(f, (pred, raw, conf, gamma), order=1, modes=["rev"],
                    atol=5e-3, rtol=5e-3)
    finally:
        jax.config.update("jax_enable_x64", False)
