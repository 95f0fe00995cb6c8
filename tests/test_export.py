"""AOT serving export (tools/export_model.py): the serialized jax.export
artifact must deserialize standalone and reproduce the live engine's
forward_test outputs — the serving analog of the reference's
``model(**data) -> pred_depth`` contract (RDFC-GAN/lib/models/base.py:156).
"""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))

# every test here exports/deserializes the tiny flagship end-to-end —
# multi-minute compiles each; slow-lane by the README contract
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from export_model import main

    out = str(tmp_path_factory.mktemp("exp") / "tiny.jaxexp")
    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "rdfc_gan_tiny.yaml")
    rc = main(["--model_cfg_path", cfg, "--out", out, "--batch_size", "2",
               "--out_height", "32", "--out_width", "48", "--check"])
    assert rc == 0
    return out


def test_export_roundtrip_runs_standalone(exported):
    """Deserialize from bytes alone and call it — no engine objects."""
    from jax import export as jexport

    with open(exported, "rb") as f:
        restored = jexport.deserialize(f.read())
    # the calling convention is (params, batch_stats, rgb, raw_depth);
    # rebuild matching inputs from the recorded avals
    flat = [np.zeros(a.shape, a.dtype) for a in restored.in_avals]
    args = restored.in_tree.unflatten(flat)
    out = restored.call(*args[0], **args[1])
    assert set(out) >= {"pred_depth"}
    assert out["pred_depth"].shape == (2, 32, 48, 1)
    assert np.isfinite(np.asarray(out["pred_depth"])).all()


def test_export_is_deterministic_vs_live(exported):
    """Same weights through artifact vs live jit: identical pred_depth."""
    # the --check flag in the fixture already asserted this; keep a
    # standalone assertion so a --check regression can't silently pass
    from jax import export as jexport

    import export_model as em

    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "rdfc_gan_tiny.yaml")
    args = em.parse_args(["--model_cfg_path", cfg, "--out", "/dev/null",
                          "--batch_size", "2", "--out_height", "32",
                          "--out_width", "48"])
    import jax
    import jax.numpy as jnp

    engine, state, sample = em.build(args)
    rgb = jnp.asarray(sample["rgb"])
    depth = jnp.asarray(sample["raw_depth"])
    with open(exported, "rb") as f:
        restored = jexport.deserialize(f.read())
    got = restored.call(state.params, state.batch_stats, rgb, depth)
    want = jax.jit(engine._forward_test_impl)(
        state.params, state.batch_stats, rgb, depth)
    np.testing.assert_allclose(np.asarray(got["pred_depth"]),
                               np.asarray(want["pred_depth"]),
                               rtol=2e-5, atol=2e-5)


def test_jit_wrapped_serving_call_matches_raw(exported):
    """The recommended serving loop — ``jax.jit(restored.call)`` traced
    once, then cached-dispatch per request (kills the +57 ms/call eager
    re-flatten overhead, tools/bench_export_latency.py) — must produce
    the same outputs as the raw eager ``restored.call``."""
    import jax
    from jax import export as jexport

    with open(exported, "rb") as f:
        restored = jexport.deserialize(f.read())
    flat = [np.random.default_rng(3).standard_normal(a.shape).astype(a.dtype)
            for a in restored.in_avals]
    args = restored.in_tree.unflatten(flat)
    raw = restored.call(*args[0], **args[1])
    serve = jax.jit(restored.call)
    jitted = serve(*args[0], **args[1])
    jitted2 = serve(*args[0], **args[1])  # second call = cached fast path
    for k in raw:
        np.testing.assert_allclose(np.asarray(jitted[k]), np.asarray(raw[k]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(jitted2[k]),
                                      np.asarray(jitted[k]))


def test_depth_only_export_prunes_g_label_and_matches(tmp_path):
    """--depth_only: G_label pruned from the calling convention, artifact
    smaller, pred_depth identical to the full path (it never consumed the
    labels — reference quirk rdfc_gan.py:172-180, SURVEY §7.4)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    import export_model as em

    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "rdfc_gan_tiny.yaml")
    out = str(tmp_path / "tiny_do.jaxexp")
    rc = em.main(["--model_cfg_path", cfg, "--out", out, "--batch_size", "2",
                  "--out_height", "32", "--out_width", "48", "--check",
                  "--depth_only"])
    assert rc == 0

    args = em.parse_args(["--model_cfg_path", cfg, "--out", "/dev/null",
                          "--batch_size", "2", "--out_height", "32",
                          "--out_width", "48"])
    engine, state, sample = em.build(args)
    rgb = jnp.asarray(sample["rgb"])
    depth = jnp.asarray(sample["raw_depth"])

    with open(out, "rb") as f:
        restored = jexport.deserialize(f.read())
    pruned_p = {k: v for k, v in state.params.items() if k != "G_label"}
    pruned_s = {k: v for k, v in state.batch_stats.items() if k != "G_label"}
    got = restored.call(pruned_p, pruned_s, rgb, depth)
    assert "pred_label" not in got and "pred_depth" in got

    want = jax.jit(engine._forward_test_impl)(
        state.params, state.batch_stats, rgb, depth)
    np.testing.assert_allclose(np.asarray(got["pred_depth"]),
                               np.asarray(want["pred_depth"]),
                               rtol=2e-5, atol=2e-5)


def test_forward_test_depth_only_flag_matches_full():
    """Engine-level: forward_test(depth_only=True) returns the same
    pred_depth/pred_normal as the full call, minus pred_label."""
    import jax

    import export_model as em

    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "rdfc_gan_tiny.yaml")
    args = em.parse_args(["--model_cfg_path", cfg, "--out", "/dev/null",
                          "--batch_size", "2", "--out_height", "32",
                          "--out_width", "48"])
    engine, state, sample = em.build(args)
    full = engine.forward_test(state, rgb=sample["rgb"],
                               raw_depth=sample["raw_depth"])
    do = engine.forward_test(state, rgb=sample["rgb"],
                             raw_depth=sample["raw_depth"], depth_only=True)
    assert "pred_label" in full and "pred_label" not in do
    np.testing.assert_allclose(np.asarray(do["pred_depth"]),
                               np.asarray(full["pred_depth"]),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(do["pred_normal"]),
                               np.asarray(full["pred_normal"]),
                               rtol=2e-5, atol=2e-5)
