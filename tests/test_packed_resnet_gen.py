"""ResnetGenerator (G_B2A) packed_width equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.models.resnet_generator import ResnetGenerator


def test_resnet_generator_packed_equivalence():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 20, 32, 1))
    ref = ResnetGenerator(ngf=16, n_blocks=2)
    pkd = ResnetGenerator(ngf=16, n_blocks=2, packed_width=True)
    variables = ref.init(rng, x, train=True)
    v2 = pkd.init(rng, x, train=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 variables, v2)
    out_r = ref.apply(variables, x, train=True)
    out_p = pkd.apply(variables, x, train=True)
    np.testing.assert_allclose(out_p, out_r, rtol=2e-4, atol=2e-4)

    def loss(model, params):
        return jnp.sum(model.apply({"params": params}, x, train=True) ** 2)

    g_r = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_p = jax.grad(lambda p: loss(pkd, p))(variables["params"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=5e-3, atol=5e-4), g_r, g_p)
