import jax
import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.losses import (
    GANLoss,
    binary_cross_entropy_loss,
    gradient_penalty,
    l1_loss,
    manhattan_loss,
    mse_loss,
    nor_loss,
    norm_normalize,
    softmax_cross_entropy_loss,
)


def test_l1_default_weight_is_mean(rng):
    pred = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    tgt = jnp.zeros_like(pred)
    # uniform weight 1/N => sum reduces to mean
    np.testing.assert_allclose(
        float(l1_loss(pred, tgt)), float(jnp.abs(pred).mean()), rtol=1e-4
    )


def test_l1_mask_weight_broadcast(rng):
    pred = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    tgt = jnp.zeros_like(pred)
    mask = jnp.asarray((rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32))
    w = mask / (mask.sum() + 1e-6)
    got = float(l1_loss(pred, tgt, weight=w))
    want = float((jnp.abs(pred) * w).sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ganloss_lsgan_is_mse_mean(rng):
    crit = GANLoss("lsgan")
    pred = jnp.asarray(rng.normal(size=(2, 1, 30, 38)).astype(np.float32))
    np.testing.assert_allclose(
        float(crit(pred, True)), float(((pred - 1.0) ** 2).mean()), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(crit(pred, False)), float((pred**2).mean()), rtol=1e-4
    )


def test_ganloss_vanilla_matches_bce(rng):
    crit = GANLoss("vanilla")
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    got = float(crit(logits, True))
    # BCE-with-logits mean against all-ones target
    p = jax.nn.log_sigmoid(logits)
    np.testing.assert_allclose(got, float(-p.mean()), rtol=1e-4)


def test_ganloss_wgan_sign(rng):
    crit = GANLoss("wgan")
    pred = jnp.asarray(rng.normal(size=(4, 5, 5, 1)).astype(np.float32))
    assert float(crit(pred, True)) == -float(pred.mean())
    assert float(crit(pred, False)) == float(pred.mean())


def test_norm_normalize_unit_length(rng):
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 3)).astype(np.float32))
    n = norm_normalize(x)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(n, axis=-1)), 1.0, atol=1e-4
    )


def test_nor_loss_zero_for_identical(rng):
    x = norm_normalize(jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32)))
    mask = jnp.ones((1, 8, 8))
    # identical normals saturate the |cos|<0.999 gate -> zero valid -> 0 loss
    assert float(nor_loss(x, x, mask)) < 1e-5


def test_nor_loss_positive_for_orthogonal():
    # pred +x, target +z everywhere: cos = 0 -> loss = 1 per pixel
    pred = np.zeros((1, 8, 8, 3), dtype=np.float32)
    pred[..., 0] = 1.0
    tgt = np.zeros((1, 8, 8, 3), dtype=np.float32)
    tgt[..., 2] = 1.0
    mask = jnp.ones((1, 8, 8))
    loss = float(nor_loss(jnp.asarray(pred), jnp.asarray(tgt), mask))
    np.testing.assert_allclose(loss, 1.0, rtol=1e-3)


def test_nor_loss_saturation_gate():
    # exactly flipped normals have cos = -1, outside the (-0.999, 0.999)
    # validity gate -> zero loss (reference gan_loss.py:128 behavior)
    x = np.zeros((1, 8, 8, 3), dtype=np.float32)
    x[..., 0] = 1.0
    mask = jnp.ones((1, 8, 8))
    assert float(nor_loss(jnp.asarray(x), jnp.asarray(-x), mask)) == 0.0


def test_manhattan_loss_perfect_scene():
    # floor pixels with +y normals, ceiling with -y, wall with z-facing
    b, h, w, c = 1, 8, 8, 3
    normal = np.zeros((b, h, w, 3), dtype=np.float32)
    sem = np.zeros((b, h, w), dtype=np.int64)
    normal[:, :3, :, 1] = 1.0   # floor region normal +y
    sem[:, :3, :] = 5           # label_floor
    normal[:, 3:5, :, 1] = -1.0  # ceiling region normal -y
    sem[:, 3:5, :] = 3          # label_ceiling
    normal[:, 5:, :, 2] = 1.0   # wall region normal +z (perp to y)
    sem[:, 5:, :] = 12          # label_wall
    logits = jax.nn.one_hot(jnp.asarray(sem), 14) * 10.0
    mask = jnp.ones((b, h, w))
    fl, wl, cl = manhattan_loss(jnp.asarray(normal), logits, mask, 12, 5, 3, 1.0)
    assert float(fl) < 1e-4 and float(wl) < 1e-4 and float(cl) < 1e-4


def test_manhattan_loss_penalizes_violation():
    b, h, w = 1, 8, 8
    normal = np.zeros((b, h, w, 3), dtype=np.float32)
    normal[..., 1] = -1.0  # everything points -y
    sem = np.full((b, h, w), 5, dtype=np.int64)  # all floor -> should be +y
    logits = jax.nn.one_hot(jnp.asarray(sem), 14) * 10.0
    mask = jnp.ones((b, h, w))
    fl, wl, cl = manhattan_loss(jnp.asarray(normal), logits, mask, 12, 5, 3, 100.0)
    assert float(fl) > 100.0  # (1-(-1)) * weight 100 = 200
    assert float(wl) == 0.0 and float(cl) == 0.0


def test_manhattan_weight_none_returns_values():
    """Reference bug (gan_loss.py:96-99) returns None when weight falsy; we fix."""
    normal = jnp.zeros((1, 4, 4, 3))
    logits = jnp.zeros((1, 4, 4, 14))
    out = manhattan_loss(normal, logits, jnp.ones((1, 4, 4)), 12, 5, 3, None)
    assert all(v is not None for v in out)


def test_softmax_ce(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 14)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 14, size=(2, 4, 4)))
    loss = float(softmax_cross_entropy_loss(logits, labels))
    assert 0 < loss < 10
    # perfect logits -> ~0
    perfect = jax.nn.one_hot(labels, 14) * 50.0
    assert float(softmax_cross_entropy_loss(perfect, labels)) < 1e-4


def test_gradient_penalty_unit_for_linear_critic(key, rng):
    # critic(x) = sum(x) has gradient exactly 1 per element ->
    # ||grad||_2 = sqrt(numel); penalty = 10*(sqrt(numel)-1)^2 deterministic
    real = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    fake = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    gp = float(gradient_penalty(lambda x: x, real, fake, key))
    want = 10.0 * (np.sqrt(16.0) - 1.0) ** 2
    np.testing.assert_allclose(gp, want, rtol=1e-4)
