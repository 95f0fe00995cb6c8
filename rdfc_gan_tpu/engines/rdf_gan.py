"""RDFGAN engine — single generator + discriminator (v1-style, v2 port).

Parity target: lib/models/rdf_gan.py:18-251.
  * forward: G(rgb, raw_depth) -> {depth_map_1/2, pred_depth, ...}
  * D update FIRST, then G (optimize_parameters, rdf_gan.py:189-207 — note
    the v2 cycle engine does the opposite order).
  * D loss: (GAN(D(fake_rgb_branch.detach()), F) + GAN(D(real_B), T)) / 2;
    wgan adds weight clipping, wgangp adds inline gradient penalty on the
    rgb-branch fake (rdf_gan.py:114-133).
  * G loss: GAN(D(fake_rgb_branch), T) + L1(rgb_branch)*λ + L1(depth_branch)*λ
    + L1(fusion)*λ, all weighted by the depth-mask image_loss_weight.

Functional rewrite: one jitted ``train_step``; the reference's requires_grad
flipping becomes "take grads only w.r.t. the right subtree".
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import GANLoss, gradient_penalty, l1_loss
from ..registry import MODELS, build_discriminator, build_generator
from .base import BaseEngine, GANTrainState, make_optimizer


def _as_ret_dict(ret):
    """Normalize a generator output to the dict contract. The v1 vanilla
    generator returns the reference 5-tuple (rdf_gan_generator_vanilla.py
    :294-374); the dict keys are the engine's interface."""
    if isinstance(ret, (tuple, list)):
        d1, c1, d2, c2, f = ret
        return dict(depth_map_1=d1, confidence_map_1=c1, depth_map_2=d2,
                    confidence_map_2=c2, pred_depth=f)
    return ret


class RDFGAN(BaseEngine):
    def __init__(self, cfg, is_train: bool = True, steps_per_epoch: int = 1):
        super().__init__(cfg, is_train, steps_per_epoch)
        self.modules = {
            "G": build_generator(cfg.model.G.to_dict()),
            "D": build_discriminator(cfg.model.D.to_dict()),
        }
        self.criterion_gan = GANLoss(cfg.gan_loss_type)
        if is_train:
            self.optimizers = {
                "G": make_optimizer(cfg, steps_per_epoch),
                "D": make_optimizer(cfg, steps_per_epoch),
            }
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,) if cfg.get("donate", True) else (),
            static_argnames=("update_g",))
        self._forward_test = jax.jit(self._forward_test_impl)

    # ------------------------------------------------------------------ init
    def init_state(self, rng, sample_batch) -> GANTrainState:
        rgb = sample_batch["rgb"]
        raw = sample_batch["raw_depth"]
        kg, kd = jax.random.split(rng)
        g_params, g_stats = self._init_net(kg, "G", rgb, raw,
                                           train=self.is_train)
        d_params, d_stats = self._init_net(kd, "D", raw,
                                           train=self.is_train)
        params = {"G": g_params, "D": d_params}
        stats = {"G": g_stats, "D": d_stats}
        opt_states = {}
        if self.is_train:
            opt_states = {
                "G": self.optimizers["G"].init(g_params),
                "D": self.optimizers["D"].init(d_params),
            }
        pth = self.cfg.get("pretrained_resnet_path")
        if pth:
            # imagenet torsos for the two-branch generator (common.py:12-26);
            # an explicit path that does not exist must fail loudly
            import os

            if not os.path.exists(pth):
                raise FileNotFoundError(
                    f"configured pretrained checkpoint not found: {pth}")
            from ..utils.torch_convert import apply_pretrained_torsos

            params["G"], stats["G"] = apply_pretrained_torsos(
                params["G"], stats["G"], pth)

        return GANTrainState(step=jnp.zeros((), jnp.int32), params=params,
                             batch_stats=stats, opt_states=opt_states)

    # ------------------------------------------------------------- train step
    def _train_step_impl(self, state: GANTrainState, batch: Dict[str, Any],
                         rng, update_g: bool = True
                         ) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        """One D update, then (if ``update_g``) one G update — the v1 driver's
        n_critic schedule updates G only every n_critic steps
        (RDF-GAN/lib/tools/main.py:492-575)."""
        cfg = self.cfg
        G, D = self.modules["G"], self.modules["D"]
        real_A, real_B = batch["rgb"], batch["gt_depth"]
        corrupted_B = batch["raw_depth"]
        mask = batch.get("depth_masks")
        if mask is None:
            mask = jnp.ones_like(real_B)
        image_loss_weight = mask / (mask.sum() + 1e-6)

        # --- forward G once (shared by both passes)
        ret, g_stats = self._apply(G, state.params["G"], state.batch_stats["G"],
                                   real_A, corrupted_B, train=True)
        ret = _as_ret_dict(ret)
        fake_rgb_branch = ret["depth_map_1"]
        fake_depth_branch = ret["depth_map_2"]
        final_depth = ret["pred_depth"]

        stats = {}
        if "nlspn_max_offset" in ret:
            # stencil-exactness telemetry (ops/nlspn_guard.py)
            stats["nlspn_max_offset"] = ret["nlspn_max_offset"]

        # --- D update first (rdf_gan.py:192-196)
        def d_loss_fn(d_params):
            pred_fake, ds = self._apply(D, d_params, state.batch_stats["D"],
                                        jax.lax.stop_gradient(fake_rgb_branch),
                                        train=True)
            loss_fake = self.criterion_gan(pred_fake, False)
            pred_real, ds = self._apply(D, d_params, ds, real_B, train=True)
            loss_real = self.criterion_gan(pred_real, True)
            loss = (loss_real + loss_fake) * 0.5
            if cfg.gan_loss_type == "wgangp":
                gp = gradient_penalty(
                    lambda x: D.apply(
                        {"params": d_params, **(
                            {"batch_stats": ds} if ds else {})},
                        x, train=False),
                    real_B, jax.lax.stop_gradient(fake_rgb_branch), rng)
                loss = loss + gp
                return loss, (ds, dict(loss_D=loss, loss_D_real=loss_real,
                                       loss_D_fake=loss_fake, grad_penalty=gp))
            return loss, (ds, dict(loss_D=loss, loss_D_real=loss_real,
                                   loss_D_fake=loss_fake))

        (_, (d_stats, d_log)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params["D"])
        d_updates, d_opt = self.optimizers["D"].update(
            d_grads, state.opt_states["D"], state.params["D"])
        d_params = optax.apply_updates(state.params["D"], d_updates)
        if cfg.gan_loss_type == "wgan":
            clip = cfg.get("wgan_clip_value", 0.01)
            d_params = jax.tree.map(lambda p: jnp.clip(p, -clip, clip), d_params)
        stats.update(d_log)

        # --- G update with the UPDATED D (reference order)
        def g_loss_fn(g_params):
            ret, gs = self._apply(G, g_params, state.batch_stats["G"],
                                  real_A, corrupted_B, train=True)
            ret = _as_ret_dict(ret)
            pred_fake, ds2 = self._apply(D, d_params, d_stats,
                                         ret["depth_map_1"], train=True)
            loss_gan = self.criterion_gan(pred_fake, True)
            l1_rgb = l1_loss(ret["depth_map_1"], real_B,
                             weight=image_loss_weight) * cfg.lambda_l1_rgb_branch
            l1_depth = l1_loss(ret["depth_map_2"], real_B,
                               weight=image_loss_weight) * cfg.lambda_l1_depth_branch
            l1_fusion = l1_loss(ret["pred_depth"], real_B,
                                weight=image_loss_weight) * cfg.lambda_l1_fusion
            loss = loss_gan + l1_rgb + l1_depth + l1_fusion
            return loss, (gs, ds2, dict(
                loss_G_GAN=loss_gan, loss_L1_rgb_branch=l1_rgb,
                loss_L1_depth_branch=l1_depth, loss_L1_fusion=l1_fusion))

        if update_g:
            (_, (g_stats, d_stats, g_log)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.params["G"])
            g_updates, g_opt = self.optimizers["G"].update(
                g_grads, state.opt_states["G"], state.params["G"])
            g_params = optax.apply_updates(state.params["G"], g_updates)
            stats.update(g_log)
        else:
            g_params, g_opt = state.params["G"], state.opt_states["G"]

        new_state = GANTrainState(
            step=state.step + 1,
            params={"G": g_params, "D": d_params},
            batch_stats={"G": g_stats, "D": d_stats},
            opt_states={"G": g_opt, "D": d_opt},
        )
        # loss psum across the data mesh happens automatically when batch is
        # sharded: all reductions above are global sums/means under jit.
        return new_state, stats

    def train_step(self, state, batch, rng, update_g: bool = True):
        return self._train_step(state, batch, rng, update_g=update_g)

    # --------------------------------------------------------------- testing
    def _forward_test_impl(self, params, batch_stats, rgb, raw_depth):
        ret, _ = self._apply(self.modules["G"], params["G"], batch_stats["G"],
                             rgb, raw_depth, train=False)
        return _as_ret_dict(ret)

    def forward_test(self, state: GANTrainState, **kwargs):
        return self._forward_test(state.params, state.batch_stats,
                                  kwargs["rgb"], kwargs["raw_depth"])

    __call__ = forward_test


MODELS.register("RDFGAN")(RDFGAN)
