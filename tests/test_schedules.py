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


def test_onecycle_matches_torch_oracle():
    """OneCycleLR stepped per epoch with total_steps=max_epoch
    (RDF-GAN/lib/tools/main.py:259-273)."""
    import pytest

    torch = pytest.importorskip("torch")

    total, max_lr, div, pct = 20, 1e-2, 25.0, 0.3
    m = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(m.parameters(), lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, div_factor=div,
        pct_start=pct, anneal_strategy="cos", final_div_factor=1e4)
    want = []
    for _ in range(total):
        want.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    cfg = default_config()
    cfg.merge(dict(scheduler="onecycle", n_epochs=total, div_factor=div,
                   pct_start=pct, final_div_factor=1e4, lr=max_lr))
    f = make_lr_factor_fn(cfg)
    got = [max_lr * float(f(jnp.asarray(float(e)))) for e in range(total)]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)


def test_lambda_schedule_matches_lrfactor():
    """LambdaLR over LRFactor(decay, gamma) (helper.py:393-404)."""
    decay, gamma = [3, 6, 9], [1.0, 0.4, 0.05]

    def ref_factor(epoch):  # the reference loop, verbatim semantics
        for d, g in zip(decay, gamma):
            if epoch < d:
                return g
        return gamma[-1]

    cfg = default_config()
    cfg.merge(dict(scheduler="lambda", lambda_lr_decay=decay,
                   lambda_lr_gamma=gamma))
    f = make_lr_factor_fn(cfg)
    for e in range(12):
        np.testing.assert_allclose(float(f(jnp.asarray(float(e)))),
                                   ref_factor(e), rtol=1e-6,
                                   err_msg=f"epoch {e}")
