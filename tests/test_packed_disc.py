"""PatchGANDiscriminator packed_width equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.models.discriminators import PatchGANDiscriminator


def test_patchgan_packed_equivalence():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 48, 1))
    kw = dict(out_channels=(16, 32, 32, 1), kernel_size=(4, 4, 4, 4),
              stride=(2, 2, 1, 1), padding=(1, 1, 1, 1))
    ref = PatchGANDiscriminator(**kw)
    pkd = PatchGANDiscriminator(packed_width=True, **kw)
    variables = ref.init(rng, x, train=True)
    v2 = pkd.init(rng, x, train=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 variables, v2)
    out_r, vr = ref.apply(variables, x, train=True, mutable=["batch_stats"])
    out_p, vp = pkd.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(out_p, out_r, rtol=2e-4, atol=2e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-4, atol=2e-4), vr["batch_stats"], vp["batch_stats"])

    def loss(model, params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          x, train=True, mutable=["batch_stats"])[0]
        return jnp.sum(out ** 2)

    g_r = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_p = jax.grad(lambda p: loss(pkd, p))(variables["params"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=5e-3, atol=5e-4), g_r, g_p)


def test_patchgan_packed_odd_width_falls_back():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 18, 30, 1))  # W % 4 != 0 -> unpacked
    pkd = PatchGANDiscriminator(out_channels=(8, 8, 1),
                                kernel_size=(4, 4, 4), stride=(2, 2, 1),
                                padding=(1, 1, 1), packed_width=True)
    variables = pkd.init(rng, x, train=True)
    out = pkd.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    assert out.shape[0] == 1
