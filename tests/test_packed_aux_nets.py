"""NNET (EfficientNet encoder) and PSPNet (DeepStem) packed_width
equivalence — same params, same outputs as the unpacked graph."""

import jax
import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.models.label_net import PSPNet
from rdfc_gan_tpu.models.normal_net import NNET


def test_nnet_packed_equivalence():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 48, 3))
    ref = NNET(32, 48, width=0.35, depth=0.3)
    pkd = NNET(32, 48, width=0.35, depth=0.3, packed_width=True)
    variables = ref.init(rng, x, train=True)
    v2 = pkd.init(rng, x, train=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 variables, v2)
    out_r, vr = ref.apply(variables, x, train=True, mutable=["batch_stats"])
    out_p, vp = pkd.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(out_p, out_r, rtol=2e-4, atol=2e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-4, atol=2e-4), vr["batch_stats"], vp["batch_stats"])


def test_nnet_packed_odd_width_falls_back():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 32, 50, 3))  # W % 4 != 0
    pkd = NNET(32, 50, width=0.35, depth=0.3, packed_width=True)
    variables = pkd.init(rng, x, train=False)
    out = pkd.apply(variables, x, train=False)
    assert out.shape == (1, 32, 50, 4)


def test_pspnet_packed_equivalence():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 32, 48, 3))
    kw = dict(num_classes=5, backbone_depth=50, planes=(8, 8, 16, 16),
              stem_features=8)
    ref = PSPNet(**kw)
    pkd = PSPNet(packed_width=True, **kw)
    variables = ref.init({"params": rng, "dropout": rng}, x, train=True)
    v2 = pkd.init({"params": rng, "dropout": rng}, x, train=True)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 variables, v2)
    rngs = {"dropout": jax.random.PRNGKey(7)}
    out_r, _ = ref.apply(variables, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    out_p, _ = pkd.apply(variables, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(out_r), jax.tree.leaves(out_p)):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)
