"""Stencil-vs-gather equivalence: the gather-free reformulation must match
the reference-exact bilinear-gather NLSPN whenever offsets are within the
clamp radius."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from rdfc_gan_tpu.ops.nlspn import (NLSPNParamsSpec, nlspn_offset_affinity,
                                    nlspn_propagate)
from rdfc_gan_tpu.ops.nlspn_stencil import (build_shift_masks,
                                            stencil_propagate)


def _setup(rng, prop_time=3, conf=True, off_scale=0.3):
    spec = NLSPNParamsSpec(prop_time=prop_time, conf_prop=conf)
    B, H, W = 2, 10, 12
    num = spec.num_neighbors
    raw = np.zeros((B, H, W, 3 * num), np.float32)
    raw[..., : 2 * num] = rng.uniform(-off_scale, off_scale,
                                      (B, H, W, 2 * num))
    raw[..., 2 * num:] = rng.normal(size=(B, H, W, num))
    conf_map = (jnp.asarray(rng.uniform(0.2, 1, (B, H, W, 1)).astype(np.float32))
                if conf else None)
    gamma = jnp.asarray(spec.affinity_gamma * num)
    offsets, aff = nlspn_offset_affinity(jnp.asarray(raw), conf_map, gamma, spec)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    return spec, offsets, aff, feat


def test_stencil_matches_gather_small_offsets(rng):
    spec, offsets, aff, feat = _setup(rng)
    want = nlspn_propagate(feat, offsets, aff, spec)
    M = build_shift_masks(offsets, aff, spec.prop_kernel, R=2)
    got = stencil_propagate(feat, M, spec.prop_time, R=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_stencil_matches_gather_larger_offsets(rng):
    # offsets up to 1.8 still inside R=2 clamp
    spec, offsets, aff, feat = _setup(rng, off_scale=1.8)
    want = nlspn_propagate(feat, offsets, aff, spec)
    M = build_shift_masks(offsets, aff, spec.prop_kernel, R=2)
    got = stencil_propagate(feat, M, spec.prop_time, R=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_stencil_preserve_input(rng):
    spec = NLSPNParamsSpec(prop_time=4, conf_prop=False, preserve_input=True)
    B, H, W = 1, 8, 8
    num = spec.num_neighbors
    raw = jnp.asarray(np.random.RandomState(0).normal(
        size=(B, H, W, 3 * num)).astype(np.float32) * 0.2)
    gamma = jnp.asarray(4.0)
    offsets, aff = nlspn_offset_affinity(raw, None, gamma, spec)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))
    fix = jnp.zeros((B, H, W, 1)).at[0, 3, 3, 0].set(2.0)
    want = nlspn_propagate(feat, offsets, aff, spec, feat_fix=fix)
    M = build_shift_masks(offsets, aff, spec.prop_kernel, R=2)
    got = stencil_propagate(feat, M, spec.prop_time, R=2, feat_fix=fix,
                            preserve_input=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_stencil_gradients(rng):
    spec, offsets, aff, feat = _setup(rng, prop_time=2)
    # keep fractional parts away from 0/1 everywhere (incl. the structural
    # zero at the center tap): floor() is discontinuous there and numerical
    # differencing would cross a tap boundary
    offsets = 0.3 + 0.35 * jnp.tanh(offsets)

    def f(feat, offsets, aff):
        M = build_shift_masks(offsets, aff, spec.prop_kernel, R=2)
        return stencil_propagate(feat, M, spec.prop_time, R=2).sum()

    check_grads(f, (feat, offsets, aff), order=1, modes=["rev"],
                atol=5e-2, rtol=5e-2)


def test_pallas_interpret_matches_xla(rng):
    """Pallas kernel (interpret mode on CPU) == XLA stencil."""
    from jax.experimental import pallas as pl  # noqa: F401
    import rdfc_gan_tpu.ops.pallas.nlspn_kernel as nk

    spec, offsets, aff, feat = _setup(rng, prop_time=3)
    M = build_shift_masks(offsets, aff, spec.prop_kernel, R=2)
    want = stencil_propagate(feat, M, spec.prop_time, R=2)

    import functools
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = nk.nlspn_stencil_propagate_pallas(
            feat, M, jnp.zeros_like(feat), spec.prop_time, 2, False)
    finally:
        pl.pallas_call = orig
    # bf16 masks inside the kernel compound over iterations
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-2, atol=2e-2)


def test_stencil_custom_vjp_matches_autodiff(rng):
    """The hand-written O(T) backward of stencil_propagate must match
    jax.grad of a plain (non-custom-vjp) re-implementation, both with and
    without preserve_input."""
    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.ops.nlspn_stencil import (_apply_stencil,
                                                shift_window,
                                                stencil_propagate)

    B, H, W, R, T = 2, 8, 9, 2, 4
    lo, hi = shift_window(R)
    S, pad = hi - lo + 1, max(-lo, hi)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    M = jnp.asarray(rng.normal(size=(B, S, S, H, W)) * 0.2, jnp.float32)
    fix = jnp.asarray(np.abs(rng.normal(size=(B, H, W, 1))) *
                      (rng.random((B, H, W, 1)) > 0.4), jnp.float32)

    def plain(feat_init, M_, fix_, preserve):
        f = feat_init[..., 0]
        if preserve:
            fm = jax.lax.stop_gradient(fix_[..., 0] > 0)
        for _ in range(T):
            if preserve:
                f = jnp.where(fm, fix_[..., 0], f)
            f = _apply_stencil(f, M_, lo, S, pad)
        return f[..., None]

    for preserve in (False, True):
        def loss_custom(a, m, fx):
            return jnp.sum(stencil_propagate(a, m, T, R, feat_fix=fx,
                                             preserve_input=preserve) ** 2)

        def loss_plain(a, m, fx):
            return jnp.sum(plain(a, m, fx, preserve) ** 2)

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(feat, M, fix)
        gp = jax.grad(loss_plain, argnums=(0, 1, 2))(feat, M, fix)
        for c, p, name in zip(gc, gp, ("feat", "M", "fix")):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(p), rtol=1e-3, atol=1e-4,
                err_msg=f"{name} preserve={preserve}")


def test_conf_sample_shifts_matches_gather(rng):
    """The gather-free confidence sampler must equal the bilinear gather for
    offsets within the radius, and equal the CLAMPED gather beyond it."""
    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.ops.deform import bilinear_sample
    from rdfc_gan_tpu.ops.nlspn import _conf_sample_shifts

    B, H, W, num, R = 2, 10, 12, 8, 2
    conf = jnp.asarray(rng.random((B, H, W, 1)), jnp.float32)
    for scale, note in ((1.5, "within"), (4.0, "beyond")):
        off = jnp.asarray(rng.uniform(-scale, scale, (B, H, W, num, 2)),
                          jnp.float32)
        got = _conf_sample_shifts(conf, off, R)
        offc = jnp.clip(off, -R, R)
        yy = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
        want = bilinear_sample(conf, yy + offc[..., 0],
                               xx + offc[..., 1])[..., 0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6, err_msg=note)
    # gradient w.r.t. confidence exists and matches the gather's
    off = jnp.asarray(rng.uniform(-1.5, 1.5, (B, H, W, num, 2)), jnp.float32)
    g1 = jax.grad(lambda c: jnp.sum(_conf_sample_shifts(c, off, R) ** 2))(conf)
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    g2 = jax.grad(lambda c: jnp.sum(bilinear_sample(
        c, yy + off[..., 0], xx + off[..., 1])[..., 0] ** 2))(conf)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_mask_scatter_pallas_interpret_matches_fallback(rng):
    """scatter_shift_masks Pallas kernels (interpret mode) == the one-hot
    einsum fallback, forward AND backward (the gather VJP kernel)."""
    import functools
    from jax.experimental import pallas as pl
    import rdfc_gan_tpu.ops.pallas.mask_kernel as mk

    B, K, H, W, S = 2, 36, 16, 20, 8
    w = jnp.asarray(rng.uniform(-1, 1, (B, K, H, W)).astype(np.float32))
    sy = jnp.asarray(rng.randint(0, S, (B, K, H, W)).astype(np.int32))
    sx = jnp.asarray(rng.randint(0, S, (B, K, H, W)).astype(np.int32))

    ref = mk.scatter_shift_masks(w, sy, sx, S)

    def loss(w_):
        return jnp.sum(jnp.sin(mk.scatter_shift_masks(w_, sy, sx, S)))

    gref = jax.grad(loss)(w)
    orig = pl.pallas_call
    mk._FORCE_PALLAS = True
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = mk.scatter_shift_masks(w, sy, sx, S)
        ggot = jax.grad(loss)(w)
    finally:
        pl.pallas_call = orig
        mk._FORCE_PALLAS = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref),
                               rtol=1e-5, atol=1e-5)


def test_shift_correlation_pallas_interpret_matches_fallback(rng):
    """shift_correlation Pallas kernel (interpret, Element halo windows) ==
    the XLA sliced-reduction fallback."""
    import functools
    from jax.experimental import pallas as pl
    import rdfc_gan_tpu.ops.pallas.mask_kernel as mk

    T, B, H, W, S, lo = 3, 2, 16, 20, 8, -3
    G = jnp.asarray(rng.uniform(-1, 1, (T, B, H, W)).astype(np.float32))
    X = jnp.asarray(rng.uniform(-1, 1, (T, B, H, W)).astype(np.float32))
    ref = mk.shift_correlation(G, X, S, lo)
    orig = pl.pallas_call
    mk._FORCE_PALLAS = True
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = mk.shift_correlation(G, X, S, lo)
    finally:
        pl.pallas_call = orig
        mk._FORCE_PALLAS = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_backward_kernels_match_xla(rng):
    """The Pallas reverse-chain backward (forward-emitted X + VMEM-resident
    mask chain + shift_correlation) == the XLA two-phase custom VJP, for
    grads w.r.t. feat, M and fix, with and without preserve_input. M is
    pre-rounded to bf16 so both paths differentiate the identical rounded
    function (the kernel rounds internally; straight-through convention)."""
    import functools

    from jax.experimental import pallas as pl

    import rdfc_gan_tpu.ops.pallas.nlspn_kernel as nk

    B, H, W, R, T = 2, 8, 9, 2, 4
    from rdfc_gan_tpu.ops.nlspn_stencil import shift_window
    lo, hi = shift_window(R)
    S = hi - lo + 1
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    M = jnp.asarray(rng.normal(size=(B, S, S, H, W)) * 0.2, jnp.float32)
    M = M.astype(jnp.bfloat16).astype(jnp.float32)
    fix = jnp.asarray(np.abs(rng.normal(size=(B, H, W, 1))) *
                      (rng.random((B, H, W, 1)) > 0.4), jnp.float32)

    assert nk._use_pallas_bwd(M, T, R, True), \
        "test shapes must take the kernels"

    for preserve in (False, True):
        def loss_p(a, m, fx):
            return jnp.sum(nk.nlspn_stencil_propagate_pallas(
                a, m, fx, T, R, preserve) ** 2)

        def loss_x(a, m, fx):
            return jnp.sum(stencil_propagate(
                a, m, T, R, feat_fix=fx, preserve_input=preserve) ** 2)

        orig = pl.pallas_call
        try:
            pl.pallas_call = functools.partial(orig, interpret=True)
            outs_p = jax.value_and_grad(loss_p, argnums=(0, 1, 2))(
                feat, M, fix)
        finally:
            pl.pallas_call = orig
        outs_x = jax.value_and_grad(loss_x, argnums=(0, 1, 2))(feat, M, fix)
        np.testing.assert_allclose(outs_p[0], outs_x[0], rtol=2e-3,
                                   err_msg=f"primal preserve={preserve}")
        for c, p, name in zip(outs_p[1], outs_x[1], ("feat", "M", "fix")):
            np.testing.assert_allclose(
                np.asarray(c), np.asarray(p), rtol=2e-3, atol=2e-4,
                err_msg=f"{name} preserve={preserve}")


def test_pallas_backward_kernels_bf16_stacks(rng):
    """The PRODUCTION precision regime: bf16 masks make _stack_dtype emit
    the X/G residual stacks in bf16. Gradients must still track the f32
    XLA two-phase backward within bf16 rounding tolerances."""
    import functools

    from jax.experimental import pallas as pl

    import rdfc_gan_tpu.ops.pallas.nlspn_kernel as nk
    from rdfc_gan_tpu.ops.nlspn_stencil import shift_window

    B, H, W, R, T = 2, 8, 9, 2, 4
    lo, hi = shift_window(R)
    S = hi - lo + 1
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)), jnp.float32)
    M16 = (jnp.asarray(rng.normal(size=(B, S, S, H, W)) * 0.2)
           .astype(jnp.bfloat16))
    fix = jnp.asarray(np.abs(rng.normal(size=(B, H, W, 1))) *
                      (rng.random((B, H, W, 1)) > 0.4), jnp.float32)
    assert nk._stack_dtype(M16) == jnp.bfloat16

    def loss_p(a, m, fx):
        return jnp.sum(nk.nlspn_stencil_propagate_pallas(
            a, m, fx, T, R, True) ** 2)

    def loss_x(a, m, fx):
        return jnp.sum(stencil_propagate(
            a, m.astype(jnp.float32), T, R, feat_fix=fx,
            preserve_input=True) ** 2)

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(feat, M16, fix)
    finally:
        pl.pallas_call = orig
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(feat, M16, fix)
    # dfeat/dfix chain stays f32 in-kernel: tight elementwise. dM sums
    # bf16-rounded G*X products, so individual entries that CANCEL keep
    # an absolute residue of the term scale x bf16 eps (0.17% of 9216
    # entries here) — the honest metric is relative L2 error of the
    # whole mask gradient, plus elementwise agreement at term-scale atol.
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=2e-3, atol=2e-4, err_msg="feat")
    dm_p = np.asarray(gp[1], np.float32)
    dm_x = np.asarray(gx[1], np.float32)
    rel_l2 = np.linalg.norm(dm_p - dm_x) / np.linalg.norm(dm_x)
    assert rel_l2 < 1e-2, f"dM relative L2 error {rel_l2:.4f}"
    scale = np.abs(dm_x).max()
    np.testing.assert_allclose(dm_p, dm_x, rtol=2e-2, atol=0.02 * scale,
                               err_msg="M (term-scale atol)")
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gx[2]),
                               rtol=2e-3, atol=2e-4, err_msg="fix")


def test_bwd_probe_keyed_per_kernel_instantiation(monkeypatch):
    """A lowering failure of ONE (H, W, S, T, preserve, dtype) backward
    instantiation must gate only that shape class — the r4 fused-block
    lesson (a toy probe passed while the real shape failed; ADVICE r3).
    Fakes a per-shape compile failure and checks the verdict cache keys
    it independently and caches both verdicts."""
    import rdfc_gan_tpu.ops.pallas.nlspn_kernel as nk

    calls = []

    def fake_chain(g0, M, fm, T, R, preserve, stack_dtype):
        calls.append(g0.shape)
        if g0.shape[1] == 20:  # the "bad" H class
            raise ValueError("fake Mosaic lowering failure")
        return jnp.zeros((T,) + g0.shape, jnp.float32), \
            jnp.zeros(g0.shape, jnp.float32)

    monkeypatch.setattr(nk, "_pallas_reverse_chain", fake_chain)
    monkeypatch.setattr(nk, "_BWD_LOWERING_OK", {})
    assert nk._bwd_lowering_ok(16, 16, 2, 3, True, jnp.bfloat16)
    assert not nk._bwd_lowering_ok(20, 16, 2, 3, True, jnp.bfloat16)
    # both verdicts recorded under their own keys (S = 2R+4 = 8)
    assert nk._BWD_LOWERING_OK[(16, 16, 8, 3, True, "bfloat16")] is True
    assert nk._BWD_LOWERING_OK[(20, 16, 8, 3, True, "bfloat16")] is False
    # the good class is a cache hit after the bad one failed (no re-probe)
    n = len(calls)
    assert nk._bwd_lowering_ok(16, 16, 2, 3, True, jnp.bfloat16)
    assert len(calls) == n
