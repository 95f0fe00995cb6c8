"""Image-space utilities (reference helper.py:384-409)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_pepper_noise(img: jnp.ndarray, rng, snr: float = 0.98,
                     p: float = 0.9) -> jnp.ndarray:
    """Salt-and-pepper corruption of the generated depth map.

    Parity with helper.py:384-402: with probability ``p`` (per batch), each
    pixel independently becomes +1 with prob (1-snr)/2, -1 with prob
    (1-snr)/2; the mask is shared across channels. Gradients flow only
    through unperturbed pixels (the reference's in-place write detaches the
    others).
    """
    b, h, w, c = img.shape
    k_active, k_mask = jax.random.split(rng)
    active = jax.random.uniform(k_active) < p
    u = jax.random.uniform(k_mask, (b, h, w, 1))
    noise_pct = 1.0 - snr
    salt = (u >= snr) & (u < snr + noise_pct / 2.0) & active
    pepper = (u >= snr + noise_pct / 2.0) & active
    img = jnp.where(salt, jnp.ones_like(img), img)
    img = jnp.where(pepper, -jnp.ones_like(img), img)
    return img
