"""RDFGenerator packed_width equivalence: the W-packed full-res region
must produce identical outputs/grads/batch-stats to the unpacked graph
with the SAME parameter tree (ops/packed.py is a layout change, not a
model change)."""

import jax
import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.models.rdf_generator import RDFGenerator


def _mk(packed, **kw):
    enc = [16, 16, 24, 24, 32, 32]
    dec = [24, 16, 16, 16]
    return RDFGenerator(
        rgb_channels_encoder=enc, depth_channels_encoder=enc,
        rgb_channels_decoder=dec, depth_channels_decoder=dec,
        packed_width=packed, **kw)


def test_packed_width_equivalence():
    rng = jax.random.PRNGKey(0)
    B, H, W = 2, 32, 48
    rgb = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, W, 3))
    depth = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, W, 1))

    ref = _mk(False)
    pkd = _mk(True)
    variables = ref.init(rng, rgb, depth, rgb, train=True)

    out_r, vr = ref.apply(variables, rgb, depth, rgb, train=True,
                          mutable=["batch_stats"])
    out_p, vp = pkd.apply(variables, rgb, depth, rgb, train=True,
                          mutable=["batch_stats"])
    # identical param trees by construction
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a.shape, b.shape),
                 variables, pkd.init(rng, rgb, depth, rgb, train=True))
    for k in out_r:
        np.testing.assert_allclose(out_p[k], out_r[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-4, atol=2e-4), vr["batch_stats"], vp["batch_stats"])


def test_packed_width_eval_and_grads():
    rng = jax.random.PRNGKey(3)
    B, H, W = 1, 16, 32
    rgb = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, W, 3))
    depth = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, W, 1))
    ref, pkd = _mk(False), _mk(True)
    variables = ref.init(rng, rgb, depth, rgb, train=True)

    def loss(model, params):
        out = model.apply({"params": params,
                           "batch_stats": variables["batch_stats"]},
                          rgb, depth, rgb, train=False)
        return jnp.sum(out["pred_depth"] ** 2)

    g_r = jax.grad(lambda p: loss(ref, p))(variables["params"])
    g_p = jax.grad(lambda p: loss(pkd, p))(variables["params"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=5e-3, atol=5e-4), g_r, g_p)


def test_packed_width_nlspn_variant():
    rng = jax.random.PRNGKey(5)
    B, H, W = 1, 16, 32
    rgb = jax.random.normal(jax.random.fold_in(rng, 1), (B, H, W, 3))
    depth = jax.random.normal(jax.random.fold_in(rng, 2), (B, H, W, 1))
    kw = dict(use_nlspn_refine=True,
              nlspn_configs=dict(prop_time=3), nlspn_impl="stencil")
    ref, pkd = _mk(False, **kw), _mk(True, **kw)
    variables = ref.init(rng, rgb, depth, rgb, train=True)
    out_r = ref.apply(variables, rgb, depth, rgb, train=False)
    out_p = pkd.apply(variables, rgb, depth, rgb, train=False)
    for k in out_r:
        np.testing.assert_allclose(out_p[k], out_r[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)
