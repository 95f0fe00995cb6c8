"""RDFCGAN engine — the v2 flagship cycle GAN with normal & label guidance.

Parity target: lib/models/rdfc_gan.py:21-413.
  Six sub-nets keyed exactly like the reference checkpoint schema:
  G_A2B (RDFGenerator), G_B2A (ResnetGenerator), disc_A, disc_B (PatchGAN),
  G_normal (NNET), G_label (PSPNet).
  Four optimizers (rdfc_gan.py:134-152): G = Adam over G_A2B+G_B2A,
  D = Adam over discs, Nor = AdamW at 0.5*lr with weight decay, label = Adam.
  Update order: G+Normal+Label first, then D (rdfc_gan.py:318-335).

16-term generator loss (rdfc_gan.py:209-276):
  GAN(disc_A(fake_B)) + GAN(disc_B(fake_A))
  + L1(fake_B, real_B, w)*λl1*5 + L1(fake_A, real_A, w)*λl1*3
  + L1(rec_A, real_A)*λA + L1(rec_B, real_B, w)*λB
  + CE(label_realA)+0.4*aux)*λl1 + (CE(label_fakeA)+0.4*aux)*λl1
  + nor_loss*λl1*2 (both paths) + Manhattan floor/wall/ceiling*λl1 (both).

Bug-for-bug reproductions (SURVEY.md §7.3-8): fake_B is pepper-noised BEFORE
the discriminator, the cycle, and the A2B L1 term; λl1*5 / *3 boosts kept.
Conscious fix: the reference logs loss_A2B_L1 with the B2A value
(rdfc_gan.py:276, a logging bug) — we log the true value.
Intentional deltas: the reference recomputes G_normal(fake_A), G_A2B(fake_A)
and G_B2A(fake_B) twice per step (forward + backward_G); here each runs once
inside the loss (same gradients, ~30% less compute, single BN-stat update).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses import (GANLoss, l1_loss, manhattan_loss, nor_loss,
                      norm_normalize, softmax_cross_entropy_loss)
from ..models.label_net import PSPNet
from ..models.normal_net import NNET
from ..registry import MODELS, build_discriminator, build_generator
from ..utils.image_ops import add_pepper_noise
from .base import BaseEngine, GANTrainState, make_optimizer

NET_KEYS = ("G_A2B", "G_B2A", "disc_A", "disc_B", "G_normal", "G_label")


class RDFCGAN(BaseEngine):
    def __init__(self, cfg, is_train: bool = True, steps_per_epoch: int = 1):
        super().__init__(cfg, is_train, steps_per_epoch)
        self.num_classes = cfg.get("num_classes", 14)
        self.label_wall = cfg.get("label_wall", 12)
        self.label_floor = cfg.get("label_floor", 5)
        self.label_ceiling = cfg.get("label_ceiling", 3)
        self.out_height = cfg.get("out_height", 224)
        self.out_width = cfg.get("out_width", 304)

        # NLSPN remat policy (measured on v5e, bs8, 224x304 — see
        # docs/PERF_NOTES.md round-3 "NLSPN remat ladder"). Early round-3
        # code had to widen selective remat to all of G_A2B (475 ms; narrower
        # settings spilled into XLA's own HBM rematerializer at 521/752 ms).
        # After the bf16 mask stack, the one-pass IN, and the two-phase O(T)
        # propagation backward shrank the live set, the ladder inverted:
        # widened 422.0 ms > selective-narrow 365.6 > remat OFF 344.9. The
        # generator's LOCAL nn.remat of the mask-build+propagation block
        # (nlspn_local_remat, on by default) is what keeps the narrow
        # settings in budget. Widening stays available as an escape hatch
        # for bigger batches: cfg.nlspn_widen_remat=True.
        g_a2b_cfg = cfg.model.G_A2B.to_dict()
        if (cfg.model.G_A2B.get("use_nlspn_refine", False)
                and cfg.get("nlspn_widen_remat", False)
                and cfg.get("remat") == "selective"
                and "G_A2B" not in cfg.get("remat_nets", [])):
            cfg.merge(dict(remat_nets=list(cfg.remat_nets) + ["G_A2B"]))
        if (cfg.model.G_A2B.get("use_nlspn_refine", False)
                and "G_A2B" in (cfg.get("remat_nets", [])
                                if cfg.get("remat") == "selective" else [])):
            g_a2b_cfg.setdefault("nlspn_local_remat", False)
        self.modules = {
            "G_A2B": build_generator(g_a2b_cfg),
            "G_B2A": build_generator(cfg.model.G_B2A.to_dict()),
            "disc_A": build_discriminator(cfg.model.D_A.to_dict()),
            "disc_B": build_discriminator(cfg.model.D_B.to_dict()),
            # NNET/PSPNet packed_width defaults OFF: W-packing their stems
            # REGRESSES on v5e (B5 depthwise/grouped convs turn pathological
            # once packed — G_normal grad 32.7 -> 81.8 ms, PERF_NOTES r3).
            # The option stays for A/B runs and CI equivalence coverage.
            "G_normal": NNET(self.out_height, self.out_width,
                             width=cfg.model.get("Normal_G", {}).get(
                                 "width", 1.6),
                             depth=cfg.model.get("Normal_G", {}).get(
                                 "depth", 2.2),
                             packed_width=cfg.model.get("Normal_G", {}).get(
                                 "packed_width", False)),
            "G_label": PSPNet(
                self.num_classes,
                backbone_depth=cfg.model.get("Label_G", {}).get(
                    "backbone_depth", 50),
                planes=tuple(cfg.model.get("Label_G", {}).get(
                    "planes", (64, 128, 256, 512))),
                stem_features=cfg.model.get("Label_G", {}).get(
                    "stem_features", 64),
                packed_width=cfg.model.get("Label_G", {}).get(
                    "packed_width", False)),
        }
        self.criterion_gan = GANLoss(cfg.gan_loss_type)
        if is_train:
            self.optimizers = {
                "G": make_optimizer(cfg, steps_per_epoch),
                "D": make_optimizer(cfg, steps_per_epoch),
                "Nor": make_optimizer(cfg, steps_per_epoch, lr_mult=0.5,
                                      kind="adamw",
                                      weight_decay=cfg.weight_decay),
                "label": make_optimizer(cfg, steps_per_epoch),
            }
        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,) if cfg.get("donate", True) else ())
        self._forward_test = jax.jit(self._forward_test_impl,
                                     static_argnames=("depth_only",))

    # ------------------------------------------------------------------ init
    def init_state(self, rng, sample_batch) -> GANTrainState:
        rgb = sample_batch["rgb"]
        raw = sample_batch["raw_depth"]
        gt_depth = sample_batch["gt_depth"]
        normal = rgb  # same shape (B,H,W,3)
        keys = jax.random.split(rng, 6)
        params, stats = {}, {}
        inits = {
            "G_A2B": (rgb, raw, normal),
            "G_B2A": (gt_depth,),
            "disc_A": (gt_depth,),
            "disc_B": (rgb,),
            "G_normal": (rgb,),
            "G_label": (rgb,),
        }
        for k, key in zip(NET_KEYS, keys):
            extra = ("dropout",) if k == "G_label" else ()
            # init in the mode the net will be applied in: conditional
            # submodules (PSPNet aux head, ESANet side outputs) only
            # materialize params in train mode
            params[k], stats[k] = self._init_net(key, k, *inits[k],
                                                 train=self.is_train,
                                                 extra_rngs=extra)
        opt_states = {}
        if self.is_train:
            opt_states = {
                "G": self.optimizers["G"].init(
                    {"G_A2B": params["G_A2B"], "G_B2A": params["G_B2A"]}),
                "D": self.optimizers["D"].init(
                    {"disc_A": params["disc_A"], "disc_B": params["disc_B"]}),
                "Nor": self.optimizers["Nor"].init(params["G_normal"]),
                "label": self.optimizers["label"].init(params["G_label"]),
            }
        import os

        def _require(path):
            # an explicitly configured pretrained path that does not exist
            # must fail loudly, not silently train from random init
            if path and not os.path.exists(path):
                raise FileNotFoundError(
                    f"configured pretrained checkpoint not found: {path}")
            return path

        pth = _require(self.cfg.get("pretrained_resnet_path"))
        if pth:
            # imagenet torsos for the two-branch generator (common.py:12-26)
            from ..utils.torch_convert import apply_pretrained_torsos

            params["G_A2B"], stats["G_A2B"] = apply_pretrained_torsos(
                params["G_A2B"], stats["G_A2B"], pth)
        npth = _require(self.cfg.get("pretrained_normal_path"))
        if npth:
            # timm tf_efficientnet_b5_ap encoder for G_normal — the
            # torch.hub pull of normal_net/submodules/encoder.py:10-13
            from ..utils.torch_convert import (load_efficientnet_torso,
                                               load_torch_state_dict)

            ncfg = self.cfg.model.get("Normal_G", {})
            params["G_normal"], stats["G_normal"] = load_efficientnet_torso(
                params["G_normal"], stats["G_normal"],
                load_torch_state_dict(npth),
                width=ncfg.get("width", 1.6), depth=ncfg.get("depth", 2.2))
        lpth = _require(self.cfg.get("pretrained_label_path"))
        if lpth:
            # pretrained dilated-R50 for G_label
            # (backbone_resnet50.py:263-278 loads ./pretrained)
            from ..utils.torch_convert import (load_pspnet_backbone,
                                               load_torch_state_dict)

            params["G_label"], stats["G_label"] = load_pspnet_backbone(
                params["G_label"], stats["G_label"],
                load_torch_state_dict(lpth))

        return GANTrainState(step=jnp.zeros((), jnp.int32), params=params,
                             batch_stats=stats, opt_states=opt_states)

    # ------------------------------------------------------------- train step
    def _train_step_impl(self, state: GANTrainState, batch: Dict[str, Any],
                         rng) -> Tuple[GANTrainState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        mods = self.modules
        real_A, real_B = batch["rgb"], batch["gt_depth"]
        aux_A = batch["raw_depth"]
        gt_normal = batch["gt_normal"]
        gt_label = batch["labels"]
        norm_mask = batch["normal_masks"]
        mask = batch.get("depth_masks")
        if mask is None:
            mask = jnp.ones_like(real_B)
        w_img = mask / (mask.sum() + 1e-6)

        rng_pepper, rng_drop = jax.random.split(rng)
        lam_A, lam_B, lam_l1 = cfg.lambda_A, cfg.lambda_B, cfg.lambda_L1

        g_group = {k: state.params[k]
                   for k in ("G_A2B", "G_B2A", "G_normal", "G_label")}
        d_group = {k: state.params[k] for k in ("disc_A", "disc_B")}

        def g_loss_fn(gp):
            st = dict(state.batch_stats)
            rngs = {"dropout": rng_drop}

            # --- A -> B path (reference-exact pass structure)
            lbl_realA, st["G_label"] = self._apply(
                mods["G_label"], gp["G_label"], st["G_label"], real_A,
                train=True, rngs=rngs, name="G_label")
            nrm_realA, st["G_normal"] = self._apply(
                mods["G_normal"], gp["G_normal"], st["G_normal"], real_A,
                train=True, name="G_normal")
            nrm_realA = norm_normalize(nrm_realA[..., :3])
            retAB, st["G_A2B"] = self._apply(
                mods["G_A2B"], gp["G_A2B"], st["G_A2B"], real_A, aux_A,
                nrm_realA, train=True, name="G_A2B")
            fake_B = add_pepper_noise(retAB["pred_depth"], rng_pepper)

            # G_B2A consumes fake_B (-> rec_A) and real_B (-> fake_A).
            # The ResnetGenerator is InstanceNorm-only (per-image
            # statistics, no cross-batch coupling), so the two
            # applications are EXACTLY one batched application. Falls
            # back to two calls if the net ever carries batch stats.
            # (Batching the BN-carrying nets across the two cycle passes
            # was measured too: zero gain — the step is compute-bound,
            # not launch-bound; docs/PERF_NOTES.md round-2.)
            if not st["G_B2A"]:
                b2a_out, st["G_B2A"] = self._apply(
                    mods["G_B2A"], gp["G_B2A"], st["G_B2A"],
                    jnp.concatenate([fake_B, real_B], axis=0),
                    train=True, name="G_B2A")
                rec_A, fake_A = jnp.split(b2a_out, 2, axis=0)
            else:
                rec_A, st["G_B2A"] = self._apply(
                    mods["G_B2A"], gp["G_B2A"], st["G_B2A"], fake_B,
                    train=True, name="G_B2A")
                fake_A, st["G_B2A"] = self._apply(
                    mods["G_B2A"], gp["G_B2A"], st["G_B2A"], real_B,
                    train=True, name="G_B2A")

            # --- B -> A path
            lbl_fakeA, st["G_label"] = self._apply(
                mods["G_label"], gp["G_label"], st["G_label"], fake_A,
                train=True, rngs=rngs, name="G_label")
            nrm_fakeA, st["G_normal"] = self._apply(
                mods["G_normal"], gp["G_normal"], st["G_normal"], fake_A,
                train=True, name="G_normal")
            nrm_fakeA = norm_normalize(nrm_fakeA[..., :3])
            retBA, st["G_A2B"] = self._apply(
                mods["G_A2B"], gp["G_A2B"], st["G_A2B"], fake_A, aux_A,
                nrm_fakeA, train=True, name="G_A2B")
            rec_B = retBA["pred_depth"]

            # --- adversarial terms (D params fixed; stats still advance)
            pred_fake_B, st["disc_A"] = self._apply(
                mods["disc_A"], d_group["disc_A"], st["disc_A"], fake_B,
                train=True)
            pred_fake_A, st["disc_B"] = self._apply(
                mods["disc_B"], d_group["disc_B"], st["disc_B"], fake_A,
                train=True)
            loss_G_A2B = self.criterion_gan(pred_fake_B, True)
            loss_G_B2A = self.criterion_gan(pred_fake_A, True)

            loss_A2B_L1 = l1_loss(fake_B, real_B, weight=w_img) * lam_l1 * 5
            loss_B2A_L1 = l1_loss(fake_A, real_A, weight=w_img) * lam_l1 * 3

            loss_cycle_A = l1_loss(rec_A, real_A) * lam_A
            loss_cycle_B = l1_loss(rec_B, real_B, weight=w_img) * lam_B

            loss_label_A2B = (
                softmax_cross_entropy_loss(lbl_realA[0], gt_label)
                + softmax_cross_entropy_loss(lbl_realA[1], gt_label) * 0.4
            ) * lam_l1
            loss_label_B2A = (
                softmax_cross_entropy_loss(lbl_fakeA[0], gt_label)
                + softmax_cross_entropy_loss(lbl_fakeA[1], gt_label) * 0.4
            ) * lam_l1

            loss_normal_A2B = nor_loss(nrm_realA, gt_normal, norm_mask) * lam_l1 * 2
            fl_A, wl_A, cl_A = manhattan_loss(
                nrm_realA, lbl_realA[0], norm_mask, self.label_wall,
                self.label_floor, self.label_ceiling, lam_l1)
            loss_normal_B2A = nor_loss(nrm_fakeA, gt_normal, norm_mask) * lam_l1 * 2
            fl_B, wl_B, cl_B = manhattan_loss(
                nrm_fakeA, lbl_fakeA[0], norm_mask, self.label_wall,
                self.label_floor, self.label_ceiling, lam_l1)

            loss_G = (loss_normal_A2B + loss_normal_B2A + loss_G_A2B
                      + loss_cycle_A + loss_cycle_B + loss_G_B2A
                      + loss_A2B_L1 + loss_B2A_L1 + loss_label_A2B
                      + loss_label_B2A + fl_A + wl_A + cl_A + fl_B + wl_B + cl_B)

            log = dict(
                loss_G=loss_G, loss_G_A2B=loss_G_A2B, loss_G_B2A=loss_G_B2A,
                loss_A2B_L1=loss_A2B_L1, loss_B2A_L1=loss_B2A_L1,
                loss_cycle_A=loss_cycle_A, loss_cycle_B=loss_cycle_B,
                loss_label_A2B=loss_label_A2B, loss_label_B2A=loss_label_B2A,
                loss_normal_A2B=loss_normal_A2B, loss_normal_B2A=loss_normal_B2A,
                floor_loss_A2B=fl_A, wall_loss_A2B=wl_A, ceiling_loss_A2B=cl_A,
                floor_loss_B2A=fl_B, wall_loss_B2A=wl_B, ceiling_loss_B2A=cl_B,
            )
            if "nlspn_max_offset" in retAB:
                # stencil-exactness telemetry (ops/nlspn_guard.py)
                log["nlspn_max_offset"] = jnp.maximum(
                    retAB["nlspn_max_offset"], retBA["nlspn_max_offset"])
            return loss_G, (st, fake_B, fake_A, log)

        (_, (st, fake_B, fake_A, g_log)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_group)

        # --- G-side updates (G pair, Normal, Label) — rdfc_gan.py:321-329
        new_params = dict(state.params)
        new_opt = dict(state.opt_states)

        gu, new_opt["G"] = self.optimizers["G"].update(
            {"G_A2B": g_grads["G_A2B"], "G_B2A": g_grads["G_B2A"]},
            state.opt_states["G"],
            {"G_A2B": state.params["G_A2B"], "G_B2A": state.params["G_B2A"]})
        upd = optax.apply_updates(
            {"G_A2B": state.params["G_A2B"], "G_B2A": state.params["G_B2A"]}, gu)
        new_params["G_A2B"], new_params["G_B2A"] = upd["G_A2B"], upd["G_B2A"]

        nu, new_opt["Nor"] = self.optimizers["Nor"].update(
            g_grads["G_normal"], state.opt_states["Nor"],
            state.params["G_normal"])
        new_params["G_normal"] = optax.apply_updates(
            state.params["G_normal"], nu)

        lu, new_opt["label"] = self.optimizers["label"].update(
            g_grads["G_label"], state.opt_states["label"],
            state.params["G_label"])
        new_params["G_label"] = optax.apply_updates(state.params["G_label"], lu)

        # --- D updates on detached fakes — rdfc_gan.py:331-335
        fake_B_sg = jax.lax.stop_gradient(fake_B)
        fake_A_sg = jax.lax.stop_gradient(fake_A)

        def d_loss_fn(dp):
            dst = {k: st[k] for k in ("disc_A", "disc_B")}
            pr, dst["disc_A"] = self._apply(
                mods["disc_A"], dp["disc_A"], dst["disc_A"], real_B, train=True)
            loss_D_A_real = self.criterion_gan(pr, True)
            pf, dst["disc_A"] = self._apply(
                mods["disc_A"], dp["disc_A"], dst["disc_A"], fake_B_sg,
                train=True)
            loss_D_A_fake = self.criterion_gan(pf, False)
            loss_D_A = (loss_D_A_real + loss_D_A_fake) * 0.5

            pr, dst["disc_B"] = self._apply(
                mods["disc_B"], dp["disc_B"], dst["disc_B"], real_A, train=True)
            loss_D_B_real = self.criterion_gan(pr, True)
            pf, dst["disc_B"] = self._apply(
                mods["disc_B"], dp["disc_B"], dst["disc_B"], fake_A_sg,
                train=True)
            loss_D_B_fake = self.criterion_gan(pf, False)
            loss_D_B = (loss_D_B_real + loss_D_B_fake) * 0.5

            log = dict(loss_D_A=loss_D_A, loss_D_A_real=loss_D_A_real,
                       loss_D_A_fake=loss_D_A_fake, loss_D_B=loss_D_B,
                       loss_D_B_real=loss_D_B_real, loss_D_B_fake=loss_D_B_fake)
            return loss_D_A + loss_D_B, (dst, log)

        (_, (dst, d_log)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_group)
        du, new_opt["D"] = self.optimizers["D"].update(
            d_grads, state.opt_states["D"], d_group)
        dupd = optax.apply_updates(d_group, du)
        new_params["disc_A"], new_params["disc_B"] = dupd["disc_A"], dupd["disc_B"]

        new_stats = dict(st)
        new_stats.update(dst)

        log = dict(g_log)
        log.update(d_log)
        return (GANTrainState(step=state.step + 1, params=new_params,
                              batch_stats=new_stats, opt_states=new_opt), log)

    def train_step(self, state, batch, rng):
        return self._train_step(state, batch, rng)

    # --------------------------------------------------------------- testing
    def _forward_test_impl(self, params, batch_stats, rgb, raw_depth,
                           depth_only=False):
        """rdfc_gan.py:168-182: label + normal prediction, then G_A2B.

        ``depth_only`` skips G_label entirely: its logits never feed
        ``pred_depth`` (reference quirk — rdfc_gan.py:172-180 computes labels
        the depth output ignores; SURVEY §7.4 "keep API, allow skip"). With
        it set the PSPNet params/batch-stats are never read, so callers may
        prune the ``G_label`` subtrees from the arguments (smaller export
        artifact, less H2D)."""
        if not depth_only:
            lbl, _ = self._apply(self.modules["G_label"], params["G_label"],
                                 batch_stats["G_label"], rgb, train=False)
        nrm, _ = self._apply(self.modules["G_normal"], params["G_normal"],
                             batch_stats["G_normal"], rgb, train=False)
        pred_normal = norm_normalize(nrm[..., :3])
        ret, _ = self._apply(self.modules["G_A2B"], params["G_A2B"],
                             batch_stats["G_A2B"], rgb, raw_depth, pred_normal,
                             train=False)
        out = dict(pred_depth=ret["pred_depth"], pred_normal=pred_normal)
        if not depth_only:
            out["pred_label"] = lbl
        if "nlspn_max_offset" in ret:
            # stencil-exactness telemetry on the REAL inference path
            # (predicted normals feed G_A2B) — ops/nlspn_guard.probe_max_offset
            out["nlspn_max_offset"] = ret["nlspn_max_offset"]
        return out

    def forward_test(self, state: GANTrainState, **kwargs):
        return self._forward_test(state.params, state.batch_stats,
                                  kwargs["rgb"], kwargs["raw_depth"],
                                  depth_only=bool(kwargs.get("depth_only",
                                                             False)))

    __call__ = forward_test

    # ------------------------------------------------------------- sampling
    def save_samples(self, state, fixed_samples, save_dir: str, iters: int,
                     prefix: str = "sample", batch_size: int = 8):
        """Image-grid dumps of the cycle (rdfc_gan.py:342-410): A->B->A and
        B->A->B reconstructions + normal/label visualizations."""
        import os

        import jax.numpy as jnp
        import numpy as np

        from ..utils import save_vis

        os.makedirs(save_dir, exist_ok=True)
        rgb = jnp.asarray(fixed_samples["rgb"])
        gt_depth = jnp.asarray(fixed_samples["gt_depth"])
        aux = jnp.asarray(fixed_samples["raw_depth"])

        ret = self.forward_test(state, rgb=rgb, raw_depth=aux)
        fake_B = np.asarray(ret["pred_depth"])
        pred_normal = np.asarray(ret["pred_normal"])
        lbl = ret["pred_label"]
        lbl = lbl[0] if isinstance(lbl, (list, tuple)) else lbl

        fake_A, _ = self._apply(self.modules["G_B2A"], state.params["G_B2A"],
                                state.batch_stats["G_B2A"], gt_depth,
                                train=False)
        rec_A, _ = self._apply(self.modules["G_B2A"], state.params["G_B2A"],
                               state.batch_stats["G_B2A"],
                               jnp.asarray(fake_B), train=False)

        palette = [(0, 0, 0), (0, 0, 255), (232, 88, 47), (0, 217, 0),
                   (148, 0, 240), (222, 241, 23), (255, 205, 205),
                   (0, 223, 228), (106, 135, 204), (116, 28, 41),
                   (240, 35, 235), (0, 166, 156), (249, 139, 0),
                   (225, 228, 194)]
        p = os.path.join(save_dir, f"{prefix}-{iters:06d}")
        save_vis.save_image_grid(
            f"{p}-A-B.jpg",
            [np.asarray(aux), np.asarray(gt_depth), fake_B],
            num_imgs_per_scene=3, batch_size=batch_size)
        save_vis.save_image_grid(
            f"{p}-B-A.jpg",
            [np.asarray(rgb), np.asarray(fake_A), np.asarray(rec_A)],
            num_imgs_per_scene=3, batch_size=batch_size)
        save_vis.save_image_grid(
            f"{p}-normal.jpg",
            [np.asarray(fixed_samples["gt_normal"]), pred_normal],
            num_imgs_per_scene=2, batch_size=batch_size)
        pred_lbl_color = save_vis.color_label(
            np.argmax(np.asarray(lbl), -1), palette, self.num_classes)
        gt_lbl_color = save_vis.color_label(
            np.asarray(fixed_samples["labels"]), palette, self.num_classes)
        save_vis.save_image_grid(
            f"{p}-label.jpg", [gt_lbl_color / 255.0, pred_lbl_color / 255.0],
            num_imgs_per_scene=2, batch_size=batch_size)


MODELS.register("RDFCGAN")(RDFCGAN)
