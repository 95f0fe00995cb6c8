"""Fused BasicBlock (ops/fused_block.py): forward + every gradient must
match jax.grad of the plain-XLA reference implementation. CPU runs the
Pallas kernels in interpret mode (conv_block_kernel dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdfc_gan_tpu.ops.fused_block import (basic_block_fused,
                                          basic_block_reference)


def _setup(rng, B=2, H=8, W=12, C=8, dtype=jnp.float32):
    def t(*shape, scale=1.0):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype)

    x = t(B, H, W, C)
    w1 = t(3, 3, C, C, scale=0.2)
    w2 = t(3, 3, C, C, scale=0.2)
    g1 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)), jnp.float32)
    g2 = jnp.asarray(1.0 + 0.1 * rng.normal(size=(C,)), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.normal(size=(C,)), jnp.float32)
    return x, w1, g1, b1, w2, g2, b2


def test_forward_matches_reference(rng):
    args = _setup(rng)
    out_f, st_f = basic_block_fused(*args)
    out_r, st_r = basic_block_reference(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)
    for a, b, name in zip(st_f, st_r, ("m1", "v1", "m2", "v2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=name)


def test_gradients_match_reference(rng):
    args = _setup(rng)
    # downstream weighting makes every gradient component non-trivial
    seed = jnp.asarray(rng.normal(size=(2, 8, 12, 8)), jnp.float32)

    def loss_f(*a):
        out, _ = basic_block_fused(*a)
        return jnp.sum(out * seed)

    def loss_r(*a):
        out, _ = basic_block_reference(*a)
        return jnp.sum(out * seed)

    gf = jax.grad(loss_f, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(*args)
    names = ("dx", "dW1", "dg1", "db1", "dW2", "dg2", "db2")
    for a, b, name in zip(gf, gr, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_gradients_match_reference_taller(rng):
    # H=16 exercises the multi-tile halo paths (TH=16 -> n_h=1; H=32 -> 2)
    args = _setup(rng, B=1, H=32, W=10, C=4)
    seed = jnp.asarray(rng.normal(size=(1, 32, 10, 4)), jnp.float32)

    def loss_f(*a):
        return jnp.sum(basic_block_fused(*a)[0] * seed)

    def loss_r(*a):
        return jnp.sum(basic_block_reference(*a)[0] * seed)

    gf = jax.grad(loss_f, argnums=(0, 1, 4))(*args)
    gr = jax.grad(loss_r, argnums=(0, 1, 4))(*args)
    for a, b, name in zip(gf, gr, ("dx", "dW1", "dW2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_bf16_runs(rng):
    args = _setup(rng, dtype=jnp.bfloat16)
    out, _ = basic_block_fused(*args)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize("pack_mode", ["none", "full"])
def test_basicblock_fused_equals_standard(rng, pack_mode, monkeypatch):
    """models.resnet.BasicBlock fused=True must reproduce the standard
    branch bit-for-bit-ish on the SAME params: output, input grad, param
    grads, and the BN running-stat updates (packed and unpacked)."""
    monkeypatch.setenv("RDFC_FUSED_BLOCK_FORCE", "1")
    from rdfc_gan_tpu.models.resnet import BasicBlock
    from rdfc_gan_tpu.ops.packed import wpack

    C = 8
    x = jnp.asarray(rng.normal(size=(2, 8, 12, C)), jnp.float32)
    if pack_mode == "full":
        x = wpack(x)
    ref = BasicBlock(planes=C, pack_mode=pack_mode)
    fus = BasicBlock(planes=C, pack_mode=pack_mode, fused=True)
    variables = ref.init(jax.random.PRNGKey(0), x, train=False)
    # non-trivial BN params + running stats
    variables = jax.tree.map(
        lambda v: v + 0.05 * jnp.arange(v.size, dtype=v.dtype)
        .reshape(v.shape) / v.size, variables)
    seed = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    def run(mod, v):
        def loss(params, xx):
            out, mut = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return jnp.sum(out * seed), (out, mut["batch_stats"])

        (l, (out, bs)), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(v["params"], x)
        return out, bs, grads

    out_r, bs_r, gr_r = run(ref, variables)
    out_f, bs_f, gr_f = run(fus, variables)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=2e-4, atol=2e-4)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(bs_f),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(bs_r),
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=str(pa))
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gr_f),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(gr_r),
                   key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=8e-4, atol=8e-5, err_msg=str(pa))


def test_syncbn_sharded_grads_match_unsharded(rng):
    """Under a 'data' axis (SyncBN), psum of the per-replica param grads
    must equal the unsharded full-batch grad — i.e. the returned dg/db are
    PER-REPLICA sums, the repo's BatchNorm convention (advisor r4: the
    fused path used to return psum'd sums, num_devices x too large)."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    args = _setup(rng, B=8, H=8, W=12, C=8)
    x, params = args[0], args[1:]
    seed = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("data",))

    def loss_global(x, *p):
        out, _ = basic_block_fused(x, *p, 1e-5, None, 1)
        return jnp.sum(out * seed)

    want = jax.grad(loss_global, argnums=tuple(range(1, 7)))(x, *params)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("data"), P("data")) + (P(),) * 6,
             out_specs=P(), check_vma=False)
    def sharded_grads(x, seed, *p):
        def loss_local(*pp):
            out, _ = basic_block_fused(x, *pp, 1e-5, "data", 1)
            return jnp.sum(out * seed)

        g = jax.grad(loss_local, argnums=tuple(range(6)))(*p)
        return jax.tree.map(lambda v: jax.lax.psum(v, "data"), g)

    got = sharded_grads(x, seed, *params)
    names = ("dW1", "dg1", "db1", "dW2", "dg2", "db2")
    for a, b, name in zip(got, want, names):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)
