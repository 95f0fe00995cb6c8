"""Exactness tests for the W-packed conv transforms (ops/packed.py).

Every packed case must reproduce the plain NHWC conv bit-for-bit up to
f32 reassociation (the packed kernel is the same linear map with
structural zeros)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdfc_gan_tpu.ops.packed import (conv_packed, convt_packed_out, wpack,
                                     wunpack)


def _conv_ref(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def test_wpack_roundtrip():
    x = _rand(jax.random.PRNGKey(0), (2, 5, 8, 3))
    np.testing.assert_array_equal(wunpack(wpack(x)), x)
    # c-major: packed channel 2c+f holds column phase f of channel c
    p = wpack(x)
    np.testing.assert_array_equal(p[:, :, :, 2 * 1 + 1], x[:, :, 1::2, 1])


@pytest.mark.parametrize("k,p,cin,cout", [(3, 1, 5, 7), (1, 0, 4, 6),
                                          (7, 3, 3, 4), (7, 0, 3, 4)])
def test_conv_s1_packed(k, p, cin, cout):
    kx, kw = jax.random.split(jax.random.PRNGKey(k * 10 + p))
    x = _rand(kx, (2, 9, 12 + (0 if p else 2 * 3), cin))
    w = _rand(kw, (k, k, cin, cout))
    ref = _conv_ref(x, w, (1, 1), (p, p))
    out = wunpack(conv_packed(wpack(x), w, p))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,p,s", [(3, 1, 2), (1, 0, 2), (4, 1, 2),
                                   (7, 3, 2)])
def test_conv_s2_packed_in(k, p, s):
    kx, kw = jax.random.split(jax.random.PRNGKey(k + s))
    x = _rand(kx, (2, 10, 16, 5))
    w = _rand(kw, (k, k, 5, 6))
    ref = _conv_ref(x, w, (s, s), (p, p))
    out = conv_packed(wpack(x), w, p, stride=(s, s), out_packed=False)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,p,s", [(3, 1, 2), (4, 1, 2)])
def test_conv_s2_packed_in_out(k, p, s):
    kx, kw = jax.random.split(jax.random.PRNGKey(k * 3 + s))
    x = _rand(kx, (2, 12, 16, 5))
    w = _rand(kw, (k, k, 5, 6))
    ref = _conv_ref(x, w, (s, s), (p, p))
    out = wunpack(conv_packed(wpack(x), w, p, stride=(s, s)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_convt_packed_out():
    from rdfc_gan_tpu.models.layers import TorchConvTranspose

    x = _rand(jax.random.PRNGKey(3), (2, 7, 10, 5))
    m = TorchConvTranspose(6, kernel=3, stride=2, padding=1,
                           output_padding=1, use_bias=False)
    params = m.init(jax.random.PRNGKey(4), x)
    ref = m.apply(params, x)
    w = params["params"]["kernel"]
    out = wunpack(convt_packed_out(x, w, k=3, p=1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_conv_packed_grouped_depthwise():
    C = 6
    kx, kw_ = jax.random.split(jax.random.PRNGKey(11))
    x = _rand(kx, (2, 8, 12, C))
    w = _rand(kw_, (3, 3, 1, C))  # depthwise HWIO (I=1, groups=C)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = wunpack(conv_packed(wpack(x), w, 1, groups=C))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # stride-2 depthwise, k5, SAME-asymmetric (timm effnet geometry)
    w5 = _rand(jax.random.PRNGKey(12), (5, 5, 1, C))
    ref2 = jax.lax.conv_general_dilated(
        x, w5, window_strides=(2, 2), padding=((1, 2), (1, 2)),
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out2 = conv_packed(wpack(x), w5, 1, stride=(2, 2), out_packed=False,
                       h_pad=(1, 2), p_right=2, groups=C)
    np.testing.assert_allclose(out2, ref2, rtol=1e-5, atol=1e-5)


def test_conv_packed_depthwise_s2_packed_out_and_grads():
    # dual-depthwise dispatch (ops/packed.py _conv_packed_depthwise):
    # packed-out stride-2 case + gradient parity through the phase-swap
    C = 6
    kx, kw_ = jax.random.split(jax.random.PRNGKey(21))
    x = _rand(kx, (2, 8, 16, C))
    w = _rand(kw_, (3, 3, 1, C))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        feature_group_count=C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = wunpack(conv_packed(wpack(x), w, 1, stride=(2, 2), groups=C))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def f_ref(w):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(y))

    def f_pk(w):
        return jnp.sum(jnp.sin(wunpack(conv_packed(wpack(x), w, 1,
                                                   groups=C))))

    g1, g2 = jax.grad(f_ref)(w), jax.grad(f_pk)(w)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_conv_packed_grouped_non_depthwise_stays_generic():
    # groups=2 with I=3 per group is NOT depthwise — must keep the generic
    # packed-scatter path and stay exact
    kx, kw_ = jax.random.split(jax.random.PRNGKey(22))
    x = _rand(kx, (2, 8, 12, 6))
    w = _rand(kw_, (3, 3, 3, 8))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        feature_group_count=2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = wunpack(conv_packed(wpack(x), w, 1, groups=2))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_conv_packed_asymmetric_same():
    # k3 s2 SAME on even W: torch/timm pads (0,1)
    kx, kw_ = jax.random.split(jax.random.PRNGKey(13))
    x = _rand(kx, (2, 8, 12, 4))
    w = _rand(kw_, (3, 3, 4, 6))
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # out packed (1/2-res output stays packed)
    out = wunpack(conv_packed(wpack(x), w, 0, stride=(2, 2), h_pad=(0, 1),
                              p_right=1))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    out2 = conv_packed(wpack(x), w, 0, stride=(2, 2), h_pad=(0, 1),
                       p_right=1, out_packed=False)
    np.testing.assert_allclose(out2, ref, rtol=1e-5, atol=1e-5)


def test_conv_packed_grads_match():
    k, p = 3, 1
    kx, kw = jax.random.split(jax.random.PRNGKey(9))
    x = _rand(kx, (1, 6, 8, 4))
    w = _rand(kw, (k, k, 4, 4))

    def f_ref(w):
        return jnp.sum(jnp.sin(_conv_ref(x, w, (1, 1), (p, p))))

    def f_pk(w):
        return jnp.sum(jnp.sin(wunpack(conv_packed(wpack(x), w, p))))

    g1, g2 = jax.grad(f_ref)(w), jax.grad(f_pk)(w)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)
