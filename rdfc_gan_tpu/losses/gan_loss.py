"""Loss suite: weighted L1/L2, GAN losses, normal-cosine and Manhattan losses.

Behavioral parity with RDFC-GAN/lib/losses/gan_loss.py (NHWC instead of NCHW):
  * ``l1_loss(pred, target, weight=None)``: elementwise |d|, multiplied by a
    per-element weight and SUM-reduced. Default weight is uniform
    ``1/(numel + 1e-6)`` — i.e. a mean (gan_loss.py:6-22).
  * ``GANLoss``: lsgan (mse), vanilla (bce-with-logits), wgan / wgangp
    (signed mean) (gan_loss.py:169-206).
  * ``nor_loss``: (1 - cos) over valid & non-saturated normals
    (gan_loss.py:122-132).
  * ``manhattan_loss``: semantic-conditioned normal prior — floor -> +y,
    ceiling -> -y, wall ⟂ y (gan_loss.py:50-99). The reference's latent bug
    (returns None when ``weight`` is falsy, :96-99) is consciously FIXED here:
    we always return the three scalars, scaled by ``weight or 1.0``.

All functions are pure jnp and jit/grad-safe (masked reductions instead of
boolean indexing; data-dependent ``if mask.sum()>0`` guards become +eps
denominators which yield exactly 0.0 loss for empty masks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_EPS6 = 1e-6


def _apply_weight(loss: jnp.ndarray, weight: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Weight semantics of the reference: default = uniform 1/numel; a rank-
    deficient weight (e.g. (B,H,W) vs (B,H,W,C)) broadcasts over channels."""
    if weight is None:
        weight = jnp.ones_like(loss) / (loss.size + _EPS6)
    else:
        weight = weight.astype(loss.dtype)
        if weight.ndim != loss.ndim:
            weight = jnp.expand_dims(weight, axis=-1)
    return loss * weight


def l1_loss(pred, target, weight=None, reduction: str = "sum"):
    assert reduction == "sum"
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    loss = jnp.abs(pred - target)
    return _apply_weight(loss, weight).sum()


def l2_loss(pred, target, weight=None, reduction: str = "sum"):
    assert reduction == "sum"
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    loss = (pred - target) ** 2
    return _apply_weight(loss, weight).sum()


# Reference defines mse_loss == L2_loss (gan_loss.py:104-120).
mse_loss = l2_loss


def binary_cross_entropy_loss(pred, target, weight=None, reduction: str = "sum"):
    """BCE with logits, weighted-sum reduced (gan_loss.py:158-171)."""
    assert reduction == "sum"
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    # log(1 + exp(-|x|)) formulation for stability
    loss = jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    return _apply_weight(loss, weight).sum()


def softmax_cross_entropy_loss(logits, labels, num_classes: Optional[int] = None):
    """Mean softmax CE over integer labels; logits NHWC (B,H,W,C), labels (B,H,W).

    Parity with torch.nn.CrossEntropyLoss() default (mean reduction) used by
    the RDFCGAN engine (rdfc_gan.py:57).
    """
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction instead of take_along_axis: per-pixel gathers are
    # slow on TPU; C is small so the multiply-add is effectively free
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[-1],
                            dtype=logz.dtype)
    return -(logz * onehot).sum(-1).mean()


def norm_normalize(norm_out):
    """L2-normalize the first 3 channels of a normal map, NHWC
    (reference helper.py:404-409 / gan_loss.py:44-48).

    eps lives INSIDE the sqrt: d(sqrt(s))/ds at s=0 is inf, and bf16
    activations make exactly-zero vectors common — sqrt(s+eps) keeps the
    gradient finite everywhere."""
    n = jnp.sqrt(jnp.sum(norm_out[..., :3] ** 2, axis=-1, keepdims=True)
                 + 1e-12)
    return norm_out[..., :3] / n


def _safe_norm(x, axis=-1, eps=1e-12):
    """sqrt(sum(x^2) + eps): finite gradient at x == 0 (plain norm has
    d|x|/dx = x/|x| -> NaN at zero, and a maximum() clamp does not stop the
    NaN from propagating through the losing branch)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def _cosine_similarity(a, b, axis=-1, eps=1e-8):
    """torch.cosine_similarity semantics: dot / (max(|a|,eps) * max(|b|,eps))."""
    an = jnp.maximum(_safe_norm(a, axis), eps)
    bn = jnp.maximum(_safe_norm(b, axis), eps)
    return jnp.sum(a * b, axis=axis) / (an * bn)


def nor_loss(pred, target, norm_masks):
    """(1 - cos(pred, target)) over valid & non-saturated pixels.

    pred/target: (B,H,W,3); norm_masks: (B,H,W) or (B,H,W,C) boolean/float.
    Parity: gan_loss.py:122-132.
    """
    dot = _cosine_similarity(pred.astype(jnp.float32),
                             target.astype(jnp.float32), axis=-1)  # (B,H,W)
    if norm_masks.ndim == 4:
        m = norm_masks[..., 0]
    else:
        m = norm_masks
    dsg = jax.lax.stop_gradient(dot)
    valid = (m.astype(jnp.float32) * (dsg < 0.999) * (dsg > -0.999)) > 0.0
    contrib = (1.0 - dot) * valid
    count = jnp.sum(contrib != 0.0)
    return contrib.sum() / (count + _EPS6)


def manhattan_loss(normal, semantic_logits, norm_mask,
                   label_wall: int, label_floor: int, label_ceiling: int,
                   weight: Optional[float] = None):
    """Semantic-conditioned Manhattan-world normal priors.

    normal: (B,H,W,3) predicted (normalized) normals.
    semantic_logits: (B,H,W,C) segmentation logits (argmax taken inside).
    norm_mask: unused for the masks themselves in the reference (only the
      semantic argmax gates each term); kept for API parity.
    Returns (floor_loss, wall_loss, ceiling_loss), each scaled by ``weight``.
    """
    sem = jnp.argmax(semantic_logits, axis=-1)  # (B,H,W)

    normal = normal.astype(jnp.float32)
    ny = normal[..., 1]  # y component

    def _directional(mask, sign):
        # cos(normal*mask, ±y). Where mask==0 the masked normal is the zero
        # vector -> cos==0 -> contribution (1-0)*0 = 0 after the outer *mask.
        maskf = mask.astype(jnp.float32)
        cos = sign * (ny * maskf) / jnp.maximum(
            _safe_norm(normal * maskf[..., None], axis=-1), 1e-8
        )
        contrib = (1.0 - cos) * maskf
        count = jnp.sum(contrib != 0.0)
        return contrib.sum() / (count + _EPS6)

    floor_loss = _directional(sem == label_floor, +1.0)
    ceiling_loss = _directional(sem == label_ceiling, -1.0)

    # wall: |cos(normal, +y)| should be 0 (wall normals ⟂ gravity).
    wall_mask = (sem == label_wall).astype(jnp.float32)
    wall_cos = (ny * wall_mask) / jnp.maximum(
        _safe_norm(normal * wall_mask[..., None], axis=-1), 1e-8
    )
    wall_contrib = wall_cos * wall_mask * 2.0
    wall_count = jnp.sum(wall_contrib != 0.0)
    wall_loss = jnp.abs(wall_contrib).sum() / (wall_count + _EPS6)

    w = 1.0 if weight is None else weight
    return floor_loss * w, wall_loss * w, ceiling_loss * w


class GANLoss:
    """lsgan / vanilla / wgan / wgangp adversarial loss (gan_loss.py:169-206)."""

    def __init__(self, gan_mode: str, target_real_label: float = 1.0,
                 target_fake_label: float = 0.0):
        if gan_mode not in ("lsgan", "vanilla", "wgan", "wgangp"):
            raise NotImplementedError(f"gan mode {gan_mode} not implemented")
        self.gan_mode = gan_mode
        self.real_label = target_real_label
        self.fake_label = target_fake_label

    def __call__(self, prediction, target_is_real: bool, weight=None):
        if self.gan_mode in ("lsgan", "vanilla"):
            tgt = self.real_label if target_is_real else self.fake_label
            target = jnp.full_like(prediction, tgt)
            crit = mse_loss if self.gan_mode == "lsgan" else binary_cross_entropy_loss
            return crit(prediction, target, weight)
        # wgan / wgangp
        p = prediction.astype(jnp.float32)
        return -p.mean() if target_is_real else p.mean()


def gradient_penalty(disc_apply, real, fake, rng, lam: float = 10.0):
    """WGAN-GP penalty: (||∇_x D(x̂)||₂ - 1)² on x̂ = εx + (1-ε)x̃.

    ``disc_apply``: params-closed callable image -> critic map.
    Parity: the reference inlines this in rdf_gan.py:114-129 and the
    gan_loss.py __main__ snippet.
    """
    b = real.shape[0]
    eps = jax.random.uniform(rng, (b,) + (1,) * (real.ndim - 1), dtype=real.dtype)
    x_hat = eps * real + (1.0 - eps) * fake

    def critic_sum(x):
        return disc_apply(x).sum()

    grads = jax.grad(critic_sum)(x_hat)
    gnorm = jnp.sqrt(jnp.sum(grads.reshape(b, -1) ** 2, axis=1) + 1e-12)
    return lam * ((gnorm - 1.0) ** 2).mean()
