"""Model-zoo shape/finiteness tests at test-size widths (analytic shape
goldens — SURVEY.md §4 implication (b))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_nnet_tiny_shapes(key):
    from rdfc_gan_tpu.models import NNET

    m = NNET(out_height=32, out_width=40, width=0.35, depth=0.3)
    x = jnp.zeros((1, 32, 40, 3))
    v = jax.jit(lambda k, x: m.init(k, x, train=False))(key, x)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 32, 40, 4)  # xyz + kappa
    assert np.isfinite(np.asarray(out)).all()


def test_pspnet_18_train_aux(key):
    from rdfc_gan_tpu.models import PSPNet

    m = PSPNet(num_classes=5, backbone_depth=18)
    x = jnp.zeros((1, 32, 32, 3))
    v = jax.jit(lambda k, x: m.init({"params": k, "dropout": k}, x,
                                    train=True))(key, x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"],
                     rngs={"dropout": key})
    assert isinstance(out, list) and len(out) == 2  # [main, aux]
    assert out[0].shape == (1, 32, 32, 5) and out[1].shape == (1, 32, 32, 5)
    # eval mode: single tensor
    out_eval = m.apply(v, x, train=False)
    assert out_eval.shape == (1, 32, 32, 5)


def test_esanet_one_modality_pyramid(key):
    from rdfc_gan_tpu.models import ESANetOneModality

    m = ESANetOneModality(num_classes=6, channels_decoder=(16, 16, 16),
                          pyramid_supervision=True)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda k, x: m.init(k, x, train=True))(key, x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    full, s8, s16, s32 = out
    assert full.shape == (1, 64, 64, 6)
    assert s8.shape[1:3] == (8, 8)
    assert s16.shape[1:3] == (4, 4)
    assert s32.shape[1:3] == (2, 2)
    # eval: single output
    out_eval = m.apply(v, x, train=False)
    assert out_eval.shape == (1, 64, 64, 6)


def test_norm_normalize_kappa():
    from rdfc_gan_tpu.models.normal_net import norm_normalize_kappa

    x = jnp.asarray(np.random.RandomState(0).normal(
        size=(1, 4, 4, 4)).astype(np.float32))
    out = norm_normalize_kappa(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., :3]), axis=-1), 1.0, atol=1e-5)
    assert float(out[..., 3].min()) >= 0.01  # kappa ELU floor


def test_equal_linear_scaling(key):
    """EqualLinear output = x @ (w * sqrt(2/fan_in)) + b."""
    from rdfc_gan_tpu.models.layers import EqualLinear

    m = EqualLinear(4)
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, 6)).astype(
        np.float32))
    v = m.init(key, x)
    w, b = v["params"]["weight"], v["params"]["bias"]
    want = x @ (w * np.sqrt(2.0 / 6.0)) + b
    got = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_wadain_init_identity_style(key):
    """At init the style bias is (gamma=1, beta=0): W-AdaIN == instance norm."""
    from rdfc_gan_tpu.models.layers import AdaptiveInstanceNorm, instance_norm

    rng = np.random.RandomState(0)
    content = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
    style = jnp.zeros((1, 6, 6, 8))  # zero style -> linear gives bias only
    m = AdaptiveInstanceNorm(in_channel=8, style_dim=8)
    v = m.init(key, content, style)
    got = m.apply(v, content, style)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(instance_norm(content)),
                               rtol=1e-4, atol=1e-5)
