import jax.numpy as jnp
import numpy as np

from rdfc_gan_tpu.config import default_config
from rdfc_gan_tpu.engines import make_lr_factor_fn


def test_warmup_ramp():
    cfg = default_config()
    cfg.merge(dict(warm_up=True, warm_up_lr=1e-6, warm_up_steps=2, lr=1e-2,
                   scheduler="linear", epoch=0, decay_epoch=100, n_epochs=150))
    # reconstruct the schedule exactly as make_optimizer does
    spe = 10
    factor = make_lr_factor_fn(cfg)

    def schedule(count):
        epoch = jnp.floor_divide(count, spe).astype(jnp.float32)
        lr = cfg.lr * factor(epoch)
        frac = jnp.clip(count / (spe * 2), 0.0, 1.0)
        ramp = cfg.warm_up_lr + (cfg.lr - cfg.warm_up_lr) * frac
        return jnp.where(count < spe * 2, ramp, lr)

    assert float(schedule(0)) < 1e-5  # starts at warm_up_lr
    np.testing.assert_allclose(float(schedule(10)), cfg.lr / 2, rtol=1e-3)
    np.testing.assert_allclose(float(schedule(20)), cfg.lr, rtol=1e-5)
    np.testing.assert_allclose(float(schedule(500)), cfg.lr, rtol=1e-5)


def test_step_and_cosine_schedules():
    cfg = default_config()
    cfg.merge(dict(scheduler="step", lr_decay_epochs=[2, 4],
                   lr_decay_rate=0.1))
    f = make_lr_factor_fn(cfg)
    np.testing.assert_allclose(float(f(jnp.asarray(1.0))), 1.0)
    np.testing.assert_allclose(float(f(jnp.asarray(3.0))), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(f(jnp.asarray(5.0))), 0.01, rtol=1e-5)

    cfg2 = default_config()
    cfg2.merge(dict(scheduler="cosine", n_epochs=100))
    g = make_lr_factor_fn(cfg2)
    np.testing.assert_allclose(float(g(jnp.asarray(0.0))), 1.0)
    np.testing.assert_allclose(float(g(jnp.asarray(50.0))), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(g(jnp.asarray(100.0))), 0.0, atol=1e-6)
