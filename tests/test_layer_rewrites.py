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
