"""Data-parallel and spatial-parallel sharding tests on the virtual 8-device
CPU mesh — the multi-device coverage the reference never had (SURVEY.md §4:
no fakes/mocks for torch.distributed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rdfc_gan_tpu.parallel import (data_sharding, init_replicated, make_mesh,
                                   replicate_state, shard_batch)
from rdfc_gan_tpu.parallel.mesh import spatial_sharding


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh({"data": 8})


def test_make_mesh_shapes():
    m = make_mesh({"data": 4, "model": 2})
    assert m.axis_names == ("data", "model")
    assert m.devices.shape == (4, 2)


def test_shard_batch_places_batch_dim(mesh8):
    batch = {"rgb": np.zeros((8, 4, 4, 3), np.float32)}
    sharded = shard_batch(batch, mesh8)
    shard_shapes = [s.data.shape for s in sharded["rgb"].addressable_shards]
    assert all(s == (1, 4, 4, 3) for s in shard_shapes)


def test_data_parallel_sum_matches_single_device(mesh8):
    """A jitted global reduction over a sharded batch equals the unsharded
    result — XLA inserts the psum (the DDP all-reduce analog)."""
    x = np.random.RandomState(0).normal(size=(8, 16)).astype(np.float32)

    def loss(x):
        return (x**2).mean()

    want = float(loss(jnp.asarray(x)))
    xs = jax.device_put(jnp.asarray(x), data_sharding(mesh8))
    got = float(jax.jit(loss)(xs))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_spatial_sharding_conv_matches_unsharded():
    """Width-sharded conv (context-parallel analog): XLA's halo exchange
    reproduces the unsharded result exactly."""
    mesh = make_mesh({"data": 2, "model": 4})
    x = np.random.RandomState(0).normal(size=(2, 8, 32, 3)).astype(np.float32)
    w = np.random.RandomState(1).normal(size=(3, 3, 3, 4)).astype(np.float32)

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    want = np.asarray(conv(jnp.asarray(x)))
    xs = jax.device_put(jnp.asarray(x), spatial_sharding(mesh))
    got = np.asarray(jax.jit(conv)(xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_replicate_state(mesh8):
    state = {"w": jnp.ones((4, 4))}
    repl = replicate_state(state, mesh8)
    assert len(repl["w"].addressable_shards) == 8
    for s in repl["w"].addressable_shards:
        assert s.data.shape == (4, 4)  # fully replicated


def test_init_replicated_matches_eager_init(mesh8):
    """init_replicated = engine.init_state + replicate_state as ONE compiled
    program with replicated out-shardings (no host-side per-device
    device_put): every leaf lands replicated and numerically identical to
    the eager init."""
    from rdfc_gan_tpu.config import default_config
    from rdfc_gan_tpu.data import SyntheticDataset
    from rdfc_gan_tpu.engines import build_engine
    from tests.test_engines import RDFGAN_MODEL

    cfg = default_config()
    cfg.merge(dict(out_height=16, out_width=16, batch_size=1, num_classes=5,
                   donate=False))
    cfg.merge({"model": RDFGAN_MODEL})
    eng = build_engine(cfg, steps_per_epoch=2)
    ds = SyntheticDataset(length=8, height=16, width=16, num_classes=5)
    batch = {k: np.stack([ds[i][k] for i in range(8)]) for k in ds[0]}

    state = init_replicated(eng, mesh8, batch, jax.random.PRNGKey(0))
    want = eng.init_state(jax.random.PRNGKey(0),
                          jax.tree.map(jnp.asarray, batch))
    for got_leaf, want_leaf in zip(jax.tree.leaves(state),
                                   jax.tree.leaves(want)):
        assert len(got_leaf.addressable_shards) == 8  # replicated over mesh
        np.testing.assert_allclose(np.asarray(got_leaf),
                                   np.asarray(want_leaf), rtol=1e-6)


def test_syncbn_semantics_under_jit(mesh8):
    """Under jit + NamedSharding DP, BatchNorm batch statistics are GLOBAL
    (cross-replica) by construction — the SyncBN the reference only has a
    registry entry for (module/norm.py:10)."""
    import flax.linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9)
    x = np.random.RandomState(0).normal(
        size=(8, 4, 4, 3)).astype(np.float32) * 3 + 1
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def step(v, x):
        out, mut = bn.apply(v, x, mutable=["batch_stats"])
        return mut["batch_stats"]["mean"]

    want = np.asarray(step(variables, jnp.asarray(x)))
    xs = jax.device_put(jnp.asarray(x), data_sharding(mesh8))
    got = np.asarray(jax.jit(step)(variables, xs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
