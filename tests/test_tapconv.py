"""Tap-decomposed dilated conv (ops/tapconv.py): the 9-GEMM rewrite must
match XLA's dilated conv exactly in math (fwd + grads) and leave the
Bottleneck variable tree untouched, so the RDFC_TAPCONV_DILATED flag can
flip per deployment without breaking checkpoints."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rdfc_gan_tpu.ops.tapconv import dilated_conv3x3_tapsum


def _ref_conv(x, kernel, d):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=[(d, d), (d, d)],
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("d", [1, 2, 4])
def test_tapsum_matches_conv_fwd_and_grad(d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 5)) * 0.1, jnp.float32)

    got = dilated_conv3x3_tapsum(x, k, d)
    want = _ref_conv(x, k, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss_tap(x, k):
        return jnp.sum(jnp.sin(dilated_conv3x3_tapsum(x, k, d)))

    def loss_conv(x, k):
        return jnp.sum(jnp.sin(_ref_conv(x, k, d)))

    gx_t, gk_t = jax.grad(loss_tap, argnums=(0, 1))(x, k)
    gx_c, gk_c = jax.grad(loss_conv, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_t), np.asarray(gk_c),
                               rtol=1e-4, atol=1e-5)


def test_bottleneck_flag_is_checkpoint_transparent(monkeypatch):
    """Same init tree + same outputs for the dilated Bottleneck whether the
    flag is on or off (bf16, the engine's compute dtype)."""
    from rdfc_gan_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 7, 10, 16)), jnp.bfloat16)
    blk = Bottleneck(planes=8, dilation=2)

    monkeypatch.setenv("RDFC_TAPCONV_DILATED", "0")
    v_off = blk.init(jax.random.PRNGKey(0), x, train=False)
    y_off = blk.apply(v_off, x, train=False)

    monkeypatch.setenv("RDFC_TAPCONV_DILATED", "1")
    v_on = blk.init(jax.random.PRNGKey(0), x, train=False)
    y_on = blk.apply(v_off, x, train=False)  # OFF-init params through ON path

    paths_off = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(v_off)}
    paths_on = {jax.tree_util.keystr(p)
                for p, _ in jax.tree_util.tree_leaves_with_path(v_on)}
    assert paths_off == paths_on

    np.testing.assert_allclose(
        np.asarray(y_on, np.float32), np.asarray(y_off, np.float32),
        rtol=2e-2, atol=2e-2)  # bf16 tap-sum vs conv accumulation


def test_undilated_and_strided_blocks_ignore_flag(monkeypatch):
    """The rewrite only targets stride-1 dilation>1 blocks; everything else
    keeps the standard conv path bit-for-bit."""
    from rdfc_gan_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    for blk in (Bottleneck(planes=4, dilation=1),
                Bottleneck(planes=4, stride=2, dilation=1)):
        monkeypatch.setenv("RDFC_TAPCONV_DILATED", "0")
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        y0 = blk.apply(v, x, train=False)
        monkeypatch.setenv("RDFC_TAPCONV_DILATED", "1")
        y1 = blk.apply(v, x, train=False)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
