"""Engine base: optimizers, epoch-wise LR schedules, state containers.

The reference ``Base`` engine (lib/models/base.py:16-157) mutates a dict of
torch optimizers/schedulers and flips ``requires_grad``. Here an engine owns:
  * Flax module instances keyed exactly like the reference checkpoint schema
    (``G_A2B``, ``G_B2A``, ``disc_A``, ``disc_B``, ``G_normal``, ``G_label``)
    — those keys ARE the checkpoint format (lib/utils/checkpoint.py:27-30);
  * optax optimizers keyed like the reference optimizer dict (G/D/Nor/label);
  * a single jitted functional ``train_step(state, batch, rng)``; "freezing
    the discriminator" is simply not applying its optimizer update.

LR schedules match reference semantics (base.py:50-69): a per-EPOCH factor,
constant within the epoch — implemented as step-count schedules with a known
``steps_per_epoch``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class GANTrainState:
    """Pytree train state for a multi-network GAN engine."""

    step: jnp.ndarray  # scalar int32
    params: Dict[str, Any]  # per net name
    batch_stats: Dict[str, Any]  # per net name (may be empty dicts)
    opt_states: Dict[str, Any]  # per optimizer name (G/D/Nor/label)


def make_lr_factor_fn(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return epoch -> lr multiplier, matching reference get_lr_scheduler
    (base.py:50-69)."""
    sched = cfg.scheduler.lower()
    if sched == "linear":
        start, decay, total = cfg.epoch, cfg.decay_epoch, cfg.n_epochs

        def fn(epoch):
            return 1.0 - jnp.maximum(0.0, epoch + start - decay) / (total - decay)

        return fn
    if sched == "step":
        milestones = jnp.asarray(list(cfg.lr_decay_epochs), jnp.float32)
        gamma = cfg.lr_decay_rate

        def fn(epoch):
            return gamma ** jnp.sum(epoch >= milestones)

        return fn
    if sched == "cosine":
        # reference v1 passes an explicit T_max (main.py:277-284)
        total = cfg.get("t_max", None) or cfg.n_epochs

        def fn(epoch):
            return 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / total))

        return fn
    if sched == "onecycle":
        # torch OneCycleLR stepped per EPOCH with total_steps=max_epoch
        # (main.py:259-273): cos-anneal max_lr/div_factor -> max_lr over
        # pct_start, then max_lr -> max_lr/(div*final_div) over the rest.
        total = cfg.n_epochs
        div = float(cfg.get("div_factor", 25.0))
        pct = float(cfg.get("pct_start", 0.3))
        final_div = float(cfg.get("final_div_factor", 1e4))
        up_end = max(float(pct * total) - 1.0, 1e-6)
        down_len = max(float(total - 1) - up_end, 1e-6)
        f0 = 1.0 / div
        f_min = f0 / final_div

        def fn(epoch):
            def anneal(start, end, p):
                return end + (start - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * p))

            p_up = jnp.clip(epoch / up_end, 0.0, 1.0)
            p_down = jnp.clip((epoch - up_end) / down_len, 0.0, 1.0)
            return jnp.where(epoch <= up_end, anneal(f0, 1.0, p_up),
                             anneal(1.0, f_min, p_down))

        return fn
    if sched == "lambda":
        # LambdaLR over LRFactor(decay, gamma) (helper.py:393-404): the
        # factor is gamma[i] for the first decay[i] > epoch, else gamma[-1]
        decay = jnp.asarray(list(cfg.lambda_lr_decay), jnp.float32)
        gamma = jnp.asarray(list(cfg.lambda_lr_gamma), jnp.float32)

        def fn(epoch):
            idx = jnp.searchsorted(decay, epoch, side="right")
            return gamma[jnp.minimum(idx, gamma.shape[0] - 1)]

        return fn
    raise NotImplementedError(sched)


def make_optimizer(cfg, steps_per_epoch: int, *, lr_mult: float = 1.0,
                   kind: Optional[str] = None,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Optimizer factory (base.py:37-47): adam / sgd / rmsprop / adamw, with
    the epoch-wise LR factor folded into a step-count schedule."""
    kind = (kind or cfg.optimizer).lower()
    factor = make_lr_factor_fn(cfg)
    base_lr = cfg.lr * lr_mult
    spe = max(int(steps_per_epoch), 1)
    warm_up = bool(cfg.get("warm_up", False))
    warm_lr = float(cfg.get("warm_up_lr", 1e-6)) * lr_mult
    warm_epochs = max(int(cfg.get("warm_up_steps", 1)), 1)

    def schedule(count):
        epoch = jnp.floor_divide(count, spe).astype(jnp.float32)
        lr = base_lr * factor(epoch)
        if warm_up:
            # linear ramp warm_lr -> base_lr over warm_up_steps epochs
            # (v1 driver warm-up, RDF-GAN/lib/tools/main.py:453-476)
            frac = jnp.clip(count / (spe * warm_epochs), 0.0, 1.0)
            ramp = warm_lr + (base_lr - warm_lr) * frac
            lr = jnp.where(count < spe * warm_epochs, ramp, lr)
        return lr

    if kind == "adam":
        tx = optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2)
    elif kind == "adamw":
        tx = optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                         weight_decay=weight_decay)
    elif kind == "sgd":
        tx = optax.sgd(schedule)
    elif kind == "rmsprop":
        tx = optax.rmsprop(schedule)
    else:
        raise NotImplementedError(kind)

    if getattr(cfg, "clip_grad", False):
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_norm), tx)
    if cfg.get("fused_optimizer", False):
        # collapse the per-parameter update zoo (a six-net GAN has thousands
        # of small tensors -> thousands of tiny kernels) into ONE flattened
        # elementwise pass over a single concatenated vector
        tx = optax.flatten(tx)
    return tx


class BaseEngine:
    """Non-pytree host object owning modules + optimizers + jitted steps."""

    def __init__(self, cfg, is_train: bool = True, steps_per_epoch: int = 1):
        self.cfg = cfg
        self.is_train = is_train
        self.steps_per_epoch = max(int(steps_per_epoch), 1)
        self.modules: Dict[str, Any] = {}
        self.optimizers: Dict[str, optax.GradientTransformation] = {}
        # mixed precision: bf16 activations/weights inside the train step,
        # f32 master params + optimizer state. Norm statistics stay f32
        # (flax _compute_stats upcasts; our instance_norm does explicitly).
        name = str(cfg.get("compute_dtype", "bfloat16")).lower()
        self.compute_dtype = (
            jnp.bfloat16 if name in ("bf16", "bfloat16") else None)

    # -- helpers -------------------------------------------------------------
    def _init_net(self, rng, name: str, *example_inputs, train=False,
                  extra_rngs=()) -> tuple:
        """Init one flax module; returns (params, batch_stats).

        The init is jitted: un-jitted flax init dispatches thousands of tiny
        eager ops, which is pathological over a remote-tunnel TPU."""
        import functools

        mod = self.modules[name]
        rngs = {"params": rng}
        for i, er in enumerate(extra_rngs):
            rngs[er] = jax.random.fold_in(rng, i + 1)
        init_fn = jax.jit(functools.partial(mod.init, train=train))
        variables = init_fn(rngs, *example_inputs)
        return variables.get("params", {}), variables.get("batch_stats", {})

    def _remat_enabled(self, name: Optional[str]) -> bool:
        """cfg.remat: True (all nets), False, or 'selective' — remat only the
        nets in cfg.remat_nets (default: the big aux torsos). Selective mode
        trades ~0.5 GB of extra activations for skipping the +1 recompute on
        the cheap nets."""
        policy = self.cfg.get("remat", True)
        if policy == "selective":
            nets = set(self.cfg.get("remat_nets",
                                    ["G_normal", "G_label", "G_A2B"]))
            return name in nets
        return bool(policy)

    def _apply(self, mod, params, stats, *args, train: bool, rngs=None,
               name: Optional[str] = None):
        """Apply with batch_stats threading. Returns (out, new_stats).

        Train-mode applications are rematerialized (jax.checkpoint): the GAN
        step applies six sub-nets, several twice, and keeping every
        activation live for the backward pass exceeds v5e HBM at the
        reference's bs4/(224,304) envelope — recompute on the backward pass
        instead (cfg.remat, default on; 'selective' remats cfg.remat_nets)."""
        has_stats = bool(stats)
        cd = self.compute_dtype if train else None

        def cast(t):
            if cd is None:
                return t
            return jax.tree.map(
                lambda x: x.astype(cd)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

        def fn(p, s, *a):
            variables = {"params": cast(p)}
            if has_stats:
                variables["batch_stats"] = s
            a = cast(a)
            if train and has_stats:
                out, mut = mod.apply(variables, *a, train=True,
                                     mutable=["batch_stats"], rngs=rngs)
                return out, mut["batch_stats"]
            return mod.apply(variables, *a, train=train, rngs=rngs), s

        if train and self._remat_enabled(name):
            fn = jax.checkpoint(fn)
        return fn(params, stats, *args)

    # -- multi-step execution ------------------------------------------------
    def make_chunked_step(self, n_steps: int):
        """Return a jitted fn running ``n_steps`` train steps in ONE XLA
        program via lax.scan over a stacked batch (leaves (K, B, ...)).
        Amortizes per-execution dispatch/RTT on remote backends and lets XLA
        overlap step boundaries; loss stats are returned per step (K, ...)."""
        import functools

        def chunked(state, stacked_batch, rng):
            keys = jax.random.split(rng, n_steps)

            def body(st, xs):
                b, k = xs
                st, stats = self._train_step_impl(st, b, k)
                return st, stats

            return jax.lax.scan(body, state, (stacked_batch, keys))

        return jax.jit(chunked,
                       donate_argnums=(0,) if self.cfg.get("donate", True)
                       else ())

    def current_lr(self, state: GANTrainState) -> float:
        factor = make_lr_factor_fn(self.cfg)
        epoch = int(state.step) // self.steps_per_epoch
        return float(self.cfg.lr * factor(jnp.asarray(float(epoch))))
