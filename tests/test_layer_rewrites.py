"""Byte-reduction rewrites in models/layers.py stay mathematically exact.

Round-3 HLO audit (docs/PERF_NOTES.md) found two avoidable HBM costs in the
G_B2A (ResnetGenerator) backward: jnp.var's two-pass instance norm
materializing full f32 activation copies, and reflect padding's derived
transpose running full-tensor slice+add chains. Both got exact rewrites;
these tests pin them to the naive reference formulations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdfc_gan_tpu.models.layers import instance_norm, reflect_pad
from rdfc_gan_tpu.ops.packed import wpack, wunpack


def _in_ref(x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = x32.var(axis=(1, 2), keepdims=True)
    scale = jnp.reciprocal(jnp.sqrt(var + eps)).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * scale


@pytest.mark.parametrize("pad", [1, 3])
def test_reflect_pad_custom_vjp_matches_autodiff(pad):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 11, 5))
    ref = lambda x: jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                            mode="reflect")
    np.testing.assert_allclose(reflect_pad(x, pad), ref(x))
    g = jax.random.normal(jax.random.PRNGKey(pad),
                          (2, 9 + 2 * pad, 11 + 2 * pad, 5))
    gx_ref = jax.vjp(ref, x)[1](g)[0]
    gx = jax.vjp(lambda x: reflect_pad(x, pad), x)[1](g)[0]
    np.testing.assert_allclose(gx, gx_ref, atol=1e-5)


def test_instance_norm_one_pass_matches_two_pass():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 17, 13, 8)) * 3 + 1
    np.testing.assert_allclose(instance_norm(x), _in_ref(x), atol=1e-4)
    xb = x.astype(jnp.bfloat16)
    # bf16: same math, different rounding — one-ulp class agreement
    np.testing.assert_allclose(
        instance_norm(xb).astype(np.float32),
        _in_ref(xb).astype(np.float32), atol=0.03)


def test_instance_norm_packed_matches_unpacked():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 12, 6))
    got = wunpack(instance_norm(wpack(x), pack=2))
    np.testing.assert_allclose(got, _in_ref(x), atol=1e-4)


def test_instance_norm_grad_matches():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 9, 4))
    f_new = lambda x: jnp.sum(jnp.sin(instance_norm(x)))
    f_ref = lambda x: jnp.sum(jnp.sin(_in_ref(x)))
    np.testing.assert_allclose(jax.grad(f_new)(x), jax.grad(f_ref)(x),
                               atol=1e-4)


def test_bn_train_custom_vjp_matches_autodiff():
    """_bn_train's output-residual backward == plain autodiff of the same
    forward, for dx, dscale, dbias, packed and unpacked."""
    from rdfc_gan_tpu.models.layers import _bn_train, _bn_train_fwd_impl

    rng = np.random.RandomState(0)
    for pack in (1, 2):
        C = 6
        x = jnp.asarray(rng.uniform(-2, 3, (3, 5, 8, C * pack))
                        .astype(np.float32))
        g = jnp.asarray(rng.uniform(0.3, 2.0, (C,)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, (C,)).astype(np.float32))

        def f_c(x_, g_, b_):
            y, _, _ = _bn_train(x_, g_, b_, 1e-5, pack, None)
            return jnp.sum(jnp.sin(y))

        def f_a(x_, g_, b_):
            y = _bn_train_fwd_impl(x_, g_, b_, 1e-5, pack, None)[0]
            return jnp.sum(jnp.sin(y))

        gc = jax.grad(f_c, argnums=(0, 1, 2))(x, g, b)
        ga = jax.grad(f_a, argnums=(0, 1, 2))(x, g, b)
        for c, a in zip(gc, ga):
            np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                       rtol=2e-4, atol=2e-4)


def test_bn_train_custom_vjp_syncbn_psum():
    """Under pmap with an axis_name, _bn_train's backward (psum'd correction
    sums, global N) == autodiff of the pmean'd forward."""
    from rdfc_gan_tpu.models.layers import _bn_train, _bn_train_fwd_impl

    ndev = min(2, jax.local_device_count())
    rng = np.random.RandomState(1)
    C = 4
    x = jnp.asarray(rng.uniform(-2, 3, (ndev, 2, 5, 8, C))
                    .astype(np.float32))
    g = jnp.asarray(rng.uniform(0.3, 2.0, (C,)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-1, 1, (C,)).astype(np.float32))
    gs = jnp.broadcast_to(g, (ndev, C))
    bs = jnp.broadcast_to(b, (ndev, C))

    def loss_c(x_, g_, b_):
        y, _, _ = _bn_train(x_, g_, b_, 1e-5, 1, "d")
        return jax.lax.psum(jnp.sum(jnp.sin(y)), "d")

    def loss_a(x_, g_, b_):
        y = _bn_train_fwd_impl(x_, g_, b_, 1e-5, 1, "d")[0]
        return jax.lax.psum(jnp.sum(jnp.sin(y)), "d")

    gc = jax.pmap(jax.grad(loss_c, argnums=(0, 1, 2)), axis_name="d")(
        x, gs, bs)
    ga = jax.pmap(jax.grad(loss_a, argnums=(0, 1, 2)), axis_name="d")(
        x, gs, bs)
    for c, a in zip(gc, ga):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=2e-4, atol=2e-4)


def test_instance_norm_output_residual_bwd_packed():
    """instance_norm's custom backward on packed inputs == autodiff."""
    from rdfc_gan_tpu.models.layers import (_instance_norm_fwd_impl,
                                            instance_norm)

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 8, 8))

    def f_new(x_):
        return jnp.sum(jnp.sin(instance_norm(x_, pack=2)))

    def f_ref(x_):
        return jnp.sum(jnp.sin(_instance_norm_fwd_impl(x_, 1e-5, 2)[0]))

    np.testing.assert_allclose(np.asarray(jax.grad(f_new)(x)),
                               np.asarray(jax.grad(f_ref)(x)), atol=1e-4)
