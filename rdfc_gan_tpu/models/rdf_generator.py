"""RDFGenerator — the two-branch RGB/depth fusion generator (G_A2B).

Parity target: rdf_generator/rdf_generator.py:31-414.
Topology: two parallel resnet encoder/decoder branches. In v2 the "RGB"
branch consumes the *predicted surface normal* (not the RGB image,
rdf_generator.py:286-292 — by design); the depth branch consumes
concat(conv48(normal), conv16(depth)). Depth->RGB W-AdaIN fusion feeds every
rgb-decoder stage. Heads: rgb-branch depth(tanh)+confidence(sigmoid);
depth-branch init-depth(tanh) + optional NLSPN guidance (k^2-1 ch) +
confidence; NLSPN refine (or identity); clamp; softmax-confidence fusion.

TPU-native deltas: NHWC; NLSPN is the lax.scan formulation in ops/nlspn.py;
kernel 26-launch CUDA loop becomes one fused scan. ``semantic_channels_in``
keeps the v1 compatibility point where a guidance module output (40ch
semantic map) replaces the normal input (rdf_gan_generator.py:231-240).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.nlspn import NLSPNParamsSpec, nlspn_offset_affinity, nlspn_propagate
from ..registry import GENERATORS
from .encoder_decoder import EncoderDecoder, add_skip, concat_skip
from .layers import (AdaIN, AdaptiveInstanceNorm, BlockFusedConv, ConvBNAct,
                     INFuse, gan_kernel_init, leaky_relu02)


class RDFGenerator(nn.Module):
    encoder_rgb: str = "resnet18"
    encoder_depth: str = "resnet18"
    pretrained_on_imagenet: bool = True  # honored by the weight loader, not here
    semantic_channels_in: int = 3
    fuse_depth_in_rgb_decoder: str = "WAdaIN"
    bn: bool = True
    rgb_skip_connection_type: str = "concat"
    depth_skip_connection_type: str = "concat"
    adain_weighting: bool = False
    rgb_channels_encoder: Sequence[int] = (64, 64, 128, 256, 512, 512)
    depth_channels_encoder: Sequence[int] = (64, 64, 128, 256, 512, 512)
    rgb_channels_decoder: Sequence[int] = (256, 128, 64, 64)
    depth_channels_decoder: Sequence[int] = (256, 128, 64, 64)
    use_nlspn_refine: bool = False
    nlspn_configs: Optional[dict] = None
    # 'gather' = reference-exact bilinear gather; 'stencil' = gather-free
    # static-shift reformulation (exact when |offset| <= nlspn_offset_radius);
    # 'auto' = Pallas VMEM-resident stencil on TPU, XLA stencil elsewhere.
    nlspn_impl: str = "auto"
    nlspn_offset_radius: int = 2
    # jax.checkpoint ONLY the mask-build + propagation region in train mode.
    # The engine turns this OFF when it already remats all of G_A2B
    # (selective remat + NLSPN): nested remat would run the propagation
    # forward a third time in the backward pass.
    nlspn_local_remat: bool = True
    axis_name: Optional[str] = None
    # W-packed full/half-res region (ops/packed.py): stems, encoder stage 2,
    # stage-3 entry, de2, heads run on (B,H,W/2,2C) lane-dense tensors —
    # mathematically exact, param tree unchanged, ~half the physical HBM
    # traffic of the low-lane full-res stages. Requires even input width.
    packed_width: bool = False

    def _fuse_channels(self, level: int) -> int:
        """Channel count entering fuse layer `level` (1-indexed as reference)."""
        enc, dec = self.rgb_channels_encoder, self.rgb_channels_decoder
        concat = self.rgb_skip_connection_type == "concat"
        if level == 1:
            return enc[-1]
        return dec[level - 2] + (enc[-level] if concat else 0)

    def setup(self):
        rce, dce = self.rgb_channels_encoder, self.depth_channels_encoder
        rcd, dcd = self.rgb_channels_decoder, self.depth_channels_decoder

        # stems: 3 independent full-res convs (rgb 64ch + depth-branch 48ch
        # over the semantic input, 16ch over depth) run as ONE BlockFusedConv
        # launch — exact, see layers.BlockFusedConv
        self.stem_fused = BlockFusedConv(
            head_out=(rce[0], 48, 16), head_inputs=((0,), (0,), (1,)),
            packed=self.packed_width)
        self.rgb_ed = EncoderDecoder(
            encoder_type=self.encoder_rgb, skip_type=self.rgb_skip_connection_type,
            encoder_channels=rce[1:], decoder_channels=rcd,
            axis_name=self.axis_name, packed=self.packed_width)
        self.depth_ed = EncoderDecoder(
            encoder_type=self.encoder_depth, skip_type=self.depth_skip_connection_type,
            encoder_channels=dce[1:], decoder_channels=dcd,
            axis_name=self.axis_name, packed=self.packed_width)

        if self.use_nlspn_refine:
            cfgs = dict(self.nlspn_configs or {})
            self.nlspn_spec = NLSPNParamsSpec(
                prop_kernel=cfgs.get("prop_kernel", 3),
                prop_time=cfgs.get("prop_time", 18),
                affinity=cfgs.get("affinity", "TGASS"),
                affinity_gamma=cfgs.get("affinity_gamma", 0.5),
                conf_prop=cfgs.get("conf_prop", True),
                preserve_input=cfgs.get("preserve_input", False),
            )
            num = self.nlspn_spec.num_neighbors
            # offset/affinity conv, zero-init (nlspn_model.py:36-38)
            self.conv_offset_aff = nn.Conv(
                3 * num, (3, 3), padding=1,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros)
            if self.nlspn_spec.affinity == "TGASS":
                self.aff_scale_const = self.param(
                    "aff_scale_const",
                    lambda key: jnp.asarray(
                        self.nlspn_spec.affinity_gamma * num, jnp.float32),
                )
            else:
                self.aff_scale_const = jnp.asarray(
                    float(num) if self.nlspn_spec.affinity == "TC" else 1.0)
        else:
            num = 0

        # dec1 heads: per-branch fused conv+BN+lrelu — per-channel BN over
        # the concatenated outputs == separate per-head BNs, exact
        # (rgb: pred 64 | conf 32; depth: id 64 | [gd 64] | cf 32)
        self.rgb_dec1 = ConvBNAct(64 + 32, axis_name=self.axis_name,
                                  packed=self.packed_width)
        self.depth_dec1 = ConvBNAct(64 + (64 if num else 0) + 32,
                                    axis_name=self.axis_name,
                                    packed=self.packed_width)
        # dec0 heads: shared fe1 skip per branch, block-fused
        self.rgb_dec0 = BlockFusedConv(
            head_out=(1, 1), head_inputs=((0, 2), (1, 2)),
            packed=self.packed_width)
        if num:
            self.depth_dec0 = BlockFusedConv(
                head_out=(1, num, 1),
                head_inputs=((0, 3), (1, 3), (2, 3)),
                packed=self.packed_width)
        else:
            self.depth_dec0 = BlockFusedConv(
                head_out=(1, 1), head_inputs=((0, 2), (1, 2)),
                packed=self.packed_width)

        # 'add' skips use identity projections: the shipped configs are all
        # 'concat' (rdf_cycle_patchgan_config.yaml:11-12), and the reference's
        # 'add' branch indexes decoder_channels[4] out of range — dead code.

        fuse = self.fuse_depth_in_rgb_decoder
        if fuse == "WAdaIN":
            self.fuse_layers = [
                AdaptiveInstanceNorm(in_channel=self._fuse_channels(i + 1),
                                     style_dim=self._fuse_channels(i + 1),
                                     weighting=self.adain_weighting)
                for i in range(5)
            ]
        elif fuse == "AdaIN":
            self.fuse_layers = [AdaIN() for _ in range(5)]
        elif fuse == "IN":
            self.fuse_layers = [
                INFuse(in_channel=self._fuse_channels(i + 1)) for i in range(5)
            ]
        else:
            raise NotImplementedError(fuse)

        self.skip_op = (
            concat_skip if self.rgb_skip_connection_type == "concat" else add_skip
        )
        self.depth_skip_op = (
            concat_skip if self.depth_skip_connection_type == "concat" else add_skip
        )

    def _nlspn_block(self, guide, confidence, pred_init, origin_depth):
        """Offset/affinity conv -> shift-mask fold -> propagation. Factored
        out so train mode can jax.checkpoint exactly this region (the mask
        stack dominates NLSPN's activation memory)."""
        raw = self.conv_offset_aff(guide)
        # stencil/Pallas dispatch also samples confidence gather-free
        # (clamped to the same radius the propagation clamps to); the
        # 'gather' impl stays reference-exact end to end
        offsets, aff = nlspn_offset_affinity(
            raw, confidence, self.aff_scale_const, self.nlspn_spec,
            conf_sample_radius=(None if self.nlspn_impl == "gather"
                                else self.nlspn_offset_radius))
        # telemetry: the stencil path is exact only while |offset| <=
        # nlspn_offset_radius — expose the batch max so engines can log
        # it and eval drivers can escalate R / fall back to gather
        # (ops/nlspn_guard.py)
        nlspn_max_offset = jax.lax.stop_gradient(
            jnp.max(jnp.abs(offsets)).astype(jnp.float32))
        if self.nlspn_impl == "gather":
            depth_map_2 = nlspn_propagate(
                pred_init, offsets, aff, self.nlspn_spec,
                feat_fix=origin_depth)
        else:
            from ..ops.nlspn_stencil import build_shift_masks
            from ..ops.pallas.nlspn_kernel import propagate_auto

            M = build_shift_masks(offsets, aff,
                                  self.nlspn_spec.prop_kernel,
                                  self.nlspn_offset_radius)
            depth_map_2 = propagate_auto(
                pred_init, M, self.nlspn_spec.prop_time,
                self.nlspn_offset_radius,
                feat_fix=origin_depth,
                preserve_input=self.nlspn_spec.preserve_input,
                use_pallas={"stencil": "never", "pallas": "always",
                            "auto": "auto"}[self.nlspn_impl])
        return depth_map_2, nlspn_max_offset

    def __call__(self, rgb, depth, normal=None, train: bool = True):
        """rgb/normal: (B,H,W,3); depth: (B,H,W,1). Returns dict with
        depth_map_1/2, confidence_map_1/2, pred_depth (all (B,H,W,1)).

        In v2 the semantic input is the predicted normal map
        (rdf_generator.py:286-292); the v1-style RDFGAN engine calls
        ``G(rgb, depth)`` (rdf_gan.py:104) — then rgb itself feeds the
        semantic branch (v1 no-guidance variant)."""
        origin_depth = depth
        if normal is None:
            normal = rgb

        pk = self.packed_width
        if pk:
            from ..ops.packed import wpack, wunpack

            assert depth.shape[2] % 2 == 0, (
                "packed_width requires even W; disable packed_width in the "
                "G_A2B config for odd-width inputs")
            normal, depth = wpack(normal), wpack(depth)
        mult = 2 if pk else 1

        # encoder stage 1 [1/1]: one fused stem launch, then LeakyReLU
        # (conv_bn_relu(bn=False), common.py:29-43)
        s_rgb, s_d48, s_d16 = self.stem_fused((normal, depth))
        rgb_fe1 = leaky_relu02(s_rgb)
        d_fe1 = leaky_relu02(jnp.concatenate([s_d48, s_d16], axis=-1))

        # encoder stages 2..6
        rgb_fe = [rgb_fe1]
        d_fe = [d_fe1]
        for idx in range(2, 7):
            rgb_fe.append(self.rgb_ed.encode(rgb_fe[-1], idx, train))
            d_fe.append(self.depth_ed.encode(d_fe[-1], idx, train))
        # indices: fe[i] is stage i+1 output; fe[5] = 1/16 bottleneck

        rgb_fd = rgb_fe[5]
        d_fd = d_fe[5]
        # decoder stages 5..2, fusing depth into rgb at each level
        for li, dec_idx in enumerate(range(5, 1, -1)):
            fuse = self.fuse_layers[li](rgb_fd, d_fd)
            rgb_fd = self.rgb_ed.decode(fuse, dec_idx, train)
            rgb_fd = self.skip_op(rgb_fd, rgb_fe[dec_idx - 1])
            d_fd = self.depth_ed.decode(d_fd, dec_idx, train)
            d_fd = self.depth_skip_op(d_fd, d_fe[dec_idx - 1])

        # rgb branch heads (fused dec1 conv, then per-head dec0 block conv).
        # The decoder output can overhang fe1 by padding; the reference
        # convs the UNTRIMMED feature and trims at the concat
        # (rdf_generator.py:374-379 + _concat) — same order here.
        rgb_h = self.rgb_dec1(rgb_fd, train)
        rgb_h = rgb_h[:, : rgb_fe1.shape[1], : rgb_fe1.shape[2], :]
        rgb_pred_fd1, rgb_conf_fd1 = jnp.split(rgb_h, [64 * mult], axis=-1)
        pred0, conf0 = self.rgb_dec0((rgb_pred_fd1, rgb_conf_fd1, rgb_fe1))
        if pk:
            pred0, conf0 = wunpack(pred0), wunpack(conf0)
        depth_map_1 = jnp.tanh(pred0)
        confidence_map_1 = nn.sigmoid(conf0)

        # depth branch heads
        d_h = self.depth_dec1(d_fd, train)
        d_h = d_h[:, : d_fe1.shape[1], : d_fe1.shape[2], :]
        nlspn_max_offset = None
        if self.use_nlspn_refine:
            id_fd1, gd_fd1, cf_fd1 = jnp.split(
                d_h, [64 * mult, 128 * mult], axis=-1)
            idp, guide, cfp = self.depth_dec0((id_fd1, gd_fd1, cf_fd1, d_fe1))
            if pk:
                guide = wunpack(guide)
        else:
            id_fd1, cf_fd1 = jnp.split(d_h, [64 * mult], axis=-1)
            idp, cfp = self.depth_dec0((id_fd1, cf_fd1, d_fe1))
        if pk:
            idp, cfp = wunpack(idp), wunpack(cfp)
        pred_init = jnp.tanh(idp)
        confidence = nn.sigmoid(cfp)

        if self.use_nlspn_refine:
            blk = RDFGenerator._nlspn_block
            if (train and self.nlspn_impl != "gather"
                    and self.nlspn_local_remat):
                # remat ONLY the mask-build + propagation region (VERDICT r2
                # item #3): the (B,S,S,H,W) shift-mask stack is recomputed on
                # the backward instead of stored, so NLSPN no longer forces
                # the engine to rematerialize ALL of G_A2B — the generator's
                # main activations stay live.
                blk = nn.remat(blk)
            depth_map_2, nlspn_max_offset = blk(self, guide, confidence,
                                                pred_init, origin_depth)
        else:
            depth_map_2 = pred_init
        depth_map_2 = jnp.clip(depth_map_2, -1.0, 1.0)
        confidence_map_2 = confidence

        conf = jnp.concatenate([confidence_map_1, confidence_map_2], axis=-1)
        score = nn.softmax(conf.astype(jnp.float32), axis=-1)
        depths = jnp.concatenate([depth_map_1, depth_map_2], axis=-1)
        pred_depth = jnp.sum(
            depths.astype(jnp.float32) * score, axis=-1, keepdims=True
        ).astype(depth_map_1.dtype)

        ret = dict(
            depth_map_1=depth_map_1,
            confidence_map_1=confidence_map_1,
            depth_map_2=depth_map_2,
            confidence_map_2=confidence_map_2,
            pred_depth=pred_depth,
        )
        if nlspn_max_offset is not None:
            ret["nlspn_max_offset"] = nlspn_max_offset
        return ret


GENERATORS.register("RDFGenerator")(RDFGenerator)
