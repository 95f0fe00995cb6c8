"""Engine smoke + behavior tests on tiny shapes (CPU-mesh friendly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdfc_gan_tpu.config import default_config, load_config
from rdfc_gan_tpu.data import DataLoader, SyntheticDataset
from rdfc_gan_tpu.engines import build_engine

H, W = 16, 16


def _tiny_cfg(model_yaml: dict):
    cfg = default_config()
    cfg.merge(dict(out_height=H, out_width=W, batch_size=2, num_classes=5,
                   donate=False))
    cfg.merge({"model": model_yaml})
    return cfg


def _batch(n=2):
    ds = SyntheticDataset(length=n, height=H, width=W, num_classes=5)
    return next(iter(DataLoader(ds, n, shuffle=False)))


# tiny torso widths: full topology, test-size compile cost (1-core CPU CI)
TINY_ENC = [16, 16, 16, 16, 16, 16]
TINY_DEC = [16, 16, 16, 16]

RDFGAN_MODEL = {
    "type": "RDFGAN",
    "G": {"type": "RDFGenerator", "semantic_channels_in": 3,
          "rgb_channels_encoder": TINY_ENC, "depth_channels_encoder": TINY_ENC,
          "rgb_channels_decoder": TINY_DEC, "depth_channels_decoder": TINY_DEC,
          "use_nlspn_refine": True,
          "nlspn_configs": {"prop_kernel": 3, "prop_time": 2}},
    "D": {"type": "PatchGANDiscriminator", "in_channels": 1,
          "out_channels": (8, 8, 1), "kernel_size": (4, 4, 4),
          "stride": (2, 2, 1), "padding": (1, 1, 1),
          "activation": "LeakyReLU"},
}


@pytest.fixture(scope="module")
def rdfgan_setup():
    cfg = _tiny_cfg(RDFGAN_MODEL)
    eng = build_engine(cfg, steps_per_epoch=2)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    return eng, state, batch


def test_rdfgan_train_step_runs_and_updates(rdfgan_setup):
    eng, state, batch = rdfgan_setup
    new_state, stats = eng.train_step(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    for k in ("loss_G_GAN", "loss_L1_rgb_branch", "loss_L1_depth_branch",
              "loss_L1_fusion", "loss_D", "loss_D_real", "loss_D_fake"):
        v = float(stats[k])
        assert np.isfinite(v), k
    # params actually moved (some leaves — e.g. the zero-init offset conv's
    # aff_scale_const — legitimately have zero gradient at init)
    moved = any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(jax.tree.leaves(state.params["G"]),
                        jax.tree.leaves(new_state.params["G"]))
    )
    assert moved


def test_rdfgan_forward_test(rdfgan_setup):
    eng, state, batch = rdfgan_setup
    ret = eng.forward_test(state, rgb=batch["rgb"], raw_depth=batch["raw_depth"])
    assert ret["pred_depth"].shape == (2, H, W, 1)
    assert np.isfinite(np.asarray(ret["pred_depth"])).all()
    # fused output within tanh range
    assert float(jnp.abs(ret["pred_depth"]).max()) <= 1.0 + 1e-5


def test_rdfgan_two_steps_deterministic(rdfgan_setup):
    eng, state, batch = rdfgan_setup
    s1, _ = eng.train_step(state, batch, jax.random.PRNGKey(7))
    s2, _ = eng.train_step(state, batch, jax.random.PRNGKey(7))
    for l1, l2 in zip(jax.tree.leaves(s1.params["G"]),
                      jax.tree.leaves(s2.params["G"])):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2))


def test_checkpoint_roundtrip(rdfgan_setup, tmp_path):
    from rdfc_gan_tpu.utils.checkpoint import (load_checkpoint, resume_from,
                                               save_checkpoint)

    eng, state, batch = rdfgan_setup
    new_state, _ = eng.train_step(state, batch, jax.random.PRNGKey(3))
    path = str(tmp_path / "ckpt.bin")
    save_checkpoint(new_state, path, meta=dict(epoch=7, batch_size=2))
    restored, meta = load_checkpoint(state, path)
    assert meta["epoch"] == 7
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume returns the start epoch and restores optimizer state
    restored2, epoch = resume_from(state, path)
    assert epoch == 7
    for a, b in zip(jax.tree.leaves(new_state.opt_states),
                    jax.tree.leaves(restored2.opt_states)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_schedule_linear_decay():
    from rdfc_gan_tpu.engines import make_lr_factor_fn

    cfg = default_config()
    cfg.merge(dict(scheduler="linear", epoch=0, decay_epoch=100, n_epochs=150))
    f = make_lr_factor_fn(cfg)
    assert float(f(jnp.asarray(0.0))) == 1.0
    assert float(f(jnp.asarray(99.0))) == 1.0
    np.testing.assert_allclose(float(f(jnp.asarray(125.0))), 0.5)
    np.testing.assert_allclose(float(f(jnp.asarray(150.0))), 0.0)


def test_orbax_checkpoint_roundtrip(rdfgan_setup, tmp_path):
    """Async orbax checkpoint path (save/load_checkpoint_orbax) round-trips
    a GANTrainState exactly — the large-scale alternative to the msgpack
    default."""
    pytest.importorskip("orbax.checkpoint")
    from rdfc_gan_tpu.utils.checkpoint import (load_checkpoint_orbax,
                                               save_checkpoint_orbax)

    eng, state, batch = rdfgan_setup
    save_checkpoint_orbax(state, str(tmp_path / "ckpt"), step=3,
                          meta=dict(epoch=2))
    restored, meta = load_checkpoint_orbax(state, str(tmp_path / "ckpt"),
                                           step=3)
    assert meta.get("epoch") == 2
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
