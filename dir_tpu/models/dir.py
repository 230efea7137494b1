"""The DIR network: backbone -> initial MANO regression -> two decoupled
joint-space/image-space refinement stages -> segmentation/dense heads.

Reimplements models/dir.py from the reference as functional flax modules,
NHWC, with the two MANO models threaded through as constant pytrees (the
reference constructs four separate MANO layer pairs — models/dir.py:
221-224, 315-318 — which collapse into one shared pair here).

Stop-gradient placement follows the reference exactly:
  * sampling coordinates into grid_sample (dir.py:198),
  * previous-stage MANO params inside RegressorOffset (dir.py:344-345),
  * all previous-stage outputs fed into each refinement stage
    (dir.py:446-453, 463-469).
Gradient DOES flow from the bone-splat back into the current stage's
regressed 2D joints (dir.py:120-121) — preserved.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dir_tpu.config import ModelConfig
from dir_tpu.mano.assets import ManoModel
from dir_tpu.mano.layer import (mano_forward_pca6d_pair,
                                stack_mano_pair)
from dir_tpu.models.layers import (MLP1d, Residual, TorchBatchNorm,
                                   conv_init_normal, conv_kernel_init,
                                   stat_barrier, upsample2x, BN_EPS,
                                   BN_MOMENTUM)
from dir_tpu.models.resnet import ResNetPyramid
from dir_tpu.models.gcn import ResSimplePGCN, hand_adjacency
from dir_tpu.models.transformer import STE
from dir_tpu.ops.bone_splat import bone_splat
from dir_tpu.ops.splat_conv import fused_splat_conv
from dir_tpu.ops.projection import ortho_project
from dir_tpu.ops.quant import module_quant_conv
from dir_tpu.ops.sampling import grid_sample_nhwc, grid_sample_nhwc_mm

sg = jax.lax.stop_gradient


def _head32(x: jnp.ndarray) -> jnp.ndarray:
    """Cast to AT LEAST fp32: parameter heads / pooled statistics never
    run reduced-precision under the bf16 trunk (same as a plain fp32
    cast there), but stay fp64 under the fp64 gradient oracle
    (tests/test_reference_oracle_grad.py), where a hard fp32 pin would
    truncate the comparison against torch's all-double reference."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


class _SplatConvParams(nn.Module):
    """Parameter container matching nn.Conv's tree layout
    (fusion_conv1/{kernel, bias}) for the factored splat-conv path —
    checkpoints are interchangeable between the two implementations."""

    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_kernel_init,
                            (3, 3, self.in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _bn(train: bool, name: str, dtype=jnp.float32) -> TorchBatchNorm:
    # torch-semantics BN (two-pass variance + unbiased running-var
    # update) — both differences vs flax nn.BatchNorm were caught by
    # the gradient/trajectory oracles; see layers.TorchBatchNorm.
    return TorchBatchNorm(use_running_average=not train, dtype=dtype,
                          name=name)


def _mano_and_project(mano_left: ManoModel, mano_right: ManoModel,
                      para_left: jnp.ndarray, para_right: jnp.ndarray,
                      root_joint: int, precision: str = "highest") -> dict:
    """Run both MANO hands + weak-perspective projection from a (B, 64)
    parameter vector each: [6D root + 45 PCA | 10 betas | scale, tx, ty]
    (reference: models/dir.py:272-280, 353-361).

    Both hands run as ONE vmapped MANO call — the per-hand op sequence
    the reference executes twice per stage is batched over a leading
    hand axis (MANO dominates the non-backbone cost on TPU)."""
    pose_l, beta_l, cam_l = jnp.split(para_left, [51, 61], axis=-1)
    pose_r, beta_r, cam_r = jnp.split(para_right, [51, 61], axis=-1)
    pair = stack_mano_pair(mano_left, mano_right)
    verts, joints = mano_forward_pca6d_pair(
        pair, jnp.stack([pose_l, pose_r]), jnp.stack([beta_l, beta_r]),
        center_idx=root_joint, precision=precision)
    mesh_l, mesh_r = verts[0], verts[1]
    joint_l, joint_r = joints[0], joints[1]
    out = {
        "pd_mano_para_left": para_left,
        "pd_mano_para_right": para_right,
        "pd_proj_left": cam_l,
        "pd_proj_right": cam_r,
        "pd_mesh_xyz_left": mesh_l,
        "pd_mesh_xyz_right": mesh_r,
        "pd_joint_xyz_left": joint_l,
        "pd_joint_xyz_right": joint_r,
        "pd_joint_uv_left": ortho_project(cam_l[:, 0], cam_l[:, 1:], joint_l),
        "pd_joint_uv_right": ortho_project(cam_r[:, 0], cam_r[:, 1:], joint_r),
        "pd_mesh_uv_left": ortho_project(cam_l[:, 0], cam_l[:, 1:], mesh_l),
        "pd_mesh_uv_right": ortho_project(cam_r[:, 0], cam_r[:, 1:], mesh_r),
    }
    return out


class ImgToJointFeature(nn.Module):
    """Sample image features at 2D joints, then a per-joint MLP
    (models/dir.py:177-200).

    ``sampled`` short-circuits the sampling: the caller passes
    pre-sampled (B, 21, C) features (both hands are sampled in ONE pass
    over the feature map in RefineStage — half the HBM reads); the
    parameter tree is identical either way."""

    out_dim: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, img_feat: jnp.ndarray, joint_uv: jnp.ndarray,
                 train: bool = False,
                 sampled: jnp.ndarray | None = None) -> jnp.ndarray:
        if sampled is None:
            # training uses the one-hot matmul taps (scatter-free
            # backward); inference keeps the cheaper gather
            sample = grid_sample_nhwc_mm if train else grid_sample_nhwc
            sampled = sample(img_feat, sg(joint_uv))  # (B, 21, C)
        return MLP1d(self.out_dim, self.out_dim, dtype=self.dtype,
                     name="filters")(sampled, train)


class AttentionPool(nn.Module):
    """Spatial-attention pooling head (models/dir.py:227-241,263-266).

    ``quant_eval``: inference-only int8 path for conv1 (the 3x3
    2048->1024 — the largest bf16 conv left in the int8 serving
    program) with the following BN folded in; conv2 (1x1 -> 1 logit
    into the sigmoid) stays fp — negligible time, precision-sensitive
    output. Identical parameter tree (cfg.quant_aux_eval)."""

    dtype: object = jnp.float32
    quant_eval: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, feat: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = feat.shape[-1]
        if self.quant_eval and not train and not self.is_initializing():
            a = nn.relu(module_quant_conv(
                self, "conv1", feat.astype(self.dtype),
                static=self.quant_static, out_dtype=self.dtype,
                fold_bn_name="bn", bn_eps=BN_EPS))
        else:
            a = nn.Conv(c // 2, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=conv_kernel_init, name="conv1")(feat)
            a = nn.relu(_bn(train, "bn", self.dtype)(stat_barrier(a, train)))
        a = nn.Conv(1, (1, 1), dtype=self.dtype,
                    kernel_init=conv_kernel_init, name="conv2")(a)
        a = nn.sigmoid(_head32(a))
        # fp32 pooled statistics feed the MANO parameter heads
        num = jnp.sum(_head32(feat) * a, axis=(1, 2))
        den = jnp.sum(a, axis=(1, 2)) + 1e-8
        return num / den


class InitRegressor(nn.Module):
    """Initial MANO parameter regression from c4 (models/dir.py:218-305)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, feat: jnp.ndarray, mano_left: ManoModel,
                 mano_right: ManoModel, train: bool = False) -> dict:
        dt = jnp.dtype(self.cfg.dtype)
        head_init = conv_init_normal(0.001)
        feat_left = AttentionPool(dtype=dt,
                                  quant_eval=self.cfg.quant_aux_eval,
                                  quant_static=self.cfg.quant_static,
                                  name="attention_left")(feat, train)
        feat_right = AttentionPool(dtype=dt,
                                   quant_eval=self.cfg.quant_aux_eval,
                                   quant_static=self.cfg.quant_static,
                                   name="attention_right")(feat, train)

        pd_offset = nn.Dense(3, kernel_init=head_init, name="offset")(
            jnp.mean(_head32(feat), axis=(1, 2)))
        para_left = nn.Dense(self.cfg.mano_param_dim, kernel_init=head_init,
                             name="mano_left")(feat_left)
        para_right = nn.Dense(self.cfg.mano_param_dim, kernel_init=head_init,
                              name="mano_right")(feat_right)

        out = _mano_and_project(mano_left, mano_right, para_left, para_right,
                                self.cfg.root_joint,
                                self.cfg.mano_precision)
        out["pd_offset"] = pd_offset
        return out


class RegressorOffset(nn.Module):
    """Iterative-update MANO head (models/dir.py:312-381): concat flattened
    joint features with the (detached) previous parameters and predict the
    new full parameter vector."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, joint_feat_left: jnp.ndarray,
                 joint_feat_right: jnp.ndarray,
                 prev_para_left: jnp.ndarray, prev_para_right: jnp.ndarray,
                 prev_offset: jnp.ndarray,
                 mano_left: ManoModel, mano_right: ManoModel,
                 train: bool = False) -> dict:
        head_init = conv_init_normal(0.001)
        b = joint_feat_left.shape[0]
        # fp32 parameter heads regardless of the trunk compute dtype
        flat_l = _head32(joint_feat_left.reshape(b, -1))
        flat_r = _head32(joint_feat_right.reshape(b, -1))

        glob_l = jnp.concatenate([flat_l, sg(prev_para_left)], axis=-1)
        glob_r = jnp.concatenate([flat_r, sg(prev_para_right)], axis=-1)
        glob = jnp.concatenate([flat_l, flat_r, prev_offset], axis=-1)

        pd_offset = nn.Dense(3, kernel_init=head_init, name="offset")(glob)
        para_left = nn.Dense(self.cfg.mano_param_dim, kernel_init=head_init,
                             name="mano_left")(glob_l)
        para_right = nn.Dense(self.cfg.mano_param_dim, kernel_init=head_init,
                              name="mano_right")(glob_r)

        out = _mano_and_project(mano_left, mano_right, para_left, para_right,
                                self.cfg.root_joint,
                                self.cfg.mano_precision)
        out["pd_offset"] = pd_offset
        return out


class RefineStage(nn.Module):
    """One decoupled refinement stage (Joint2BoneFeature,
    models/dir.py:19-174): joint-space interaction (image sampling + GCN +
    cross-hand transformer), MANO parameter update, and image-space
    re-projection via bone splatting."""

    cfg: ModelConfig
    feature_size: int
    distance: float

    @nn.compact
    def __call__(self, img_feat: jnp.ndarray, prev: dict,
                 mano_left: ManoModel, mano_right: ManoModel,
                 train: bool = False):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        emd, jdim = cfg.embed_dim, cfg.joint_dim
        scale = cfg.coord_scale

        xyz_l = sg(prev["pd_joint_xyz_left"])
        xyz_r = sg(prev["pd_joint_xyz_right"])
        uv_l = sg(prev["pd_joint_uv_left"])
        uv_r = sg(prev["pd_joint_uv_right"])
        para_l = sg(prev["pd_mano_para_left"])
        para_r = sg(prev["pd_mano_para_right"])
        offset = sg(prev["pd_offset"])  # (B, 3)

        # --- joint-space interaction ---
        # one sampling pass over img_feat for both hands (42 points);
        # the selection-matrix sampler beats the gather in BOTH
        # directions on TPU (gather fwd: 1.4 ms at eval b256; scatter
        # bwd worse), so it is used for train and eval alike
        sampled = grid_sample_nhwc_mm(
            img_feat, jnp.concatenate([uv_l, uv_r], axis=1))
        jif_l = ImgToJointFeature(emd, dtype=dt, name="img2joint_left")(
            img_feat, uv_l, train, sampled=sampled[:, :cfg.joint_num])
        jif_r = ImgToJointFeature(emd, dtype=dt, name="img2joint_right")(
            img_feat, uv_r, train, sampled=sampled[:, cfg.joint_num:])
        jpf_l = MLP1d(emd, emd, dtype=dt, name="pos_emb_left")(
            xyz_l / scale, train)
        jpf_r = MLP1d(emd, emd, dtype=dt, name="pos_emb_right")(
            xyz_r / scale, train)

        adj = tuple(map(tuple, hand_adjacency(cfg.joint_num)))
        feat_l = ResSimplePGCN(emd, cfg.gcn_layers, adj, dtype=dt,
                               name="gcn_left")(jif_l + jpf_l, train)
        feat_r = ResSimplePGCN(emd, cfg.gcn_layers, adj, dtype=dt,
                               name="gcn_right")(jif_r + jpf_r, train)

        global_emb = MLP1d(emd, emd, dtype=dt, name="global_pos_emb")
        off = offset[:, None, :]  # (B, 1, 3)
        gpf_l = global_emb(xyz_l / scale - off / 2, train)
        gpf_r = global_emb(xyz_r / scale + off / 2, train)
        feat_l = feat_l + gpf_l
        feat_r = feat_r + gpf_r

        tokens = jnp.concatenate([feat_l, feat_r], axis=1)  # (B, 42, emd)
        tokens = STE(num_joints=2 * cfg.joint_num, in_chans=emd,
                     out_dim=jdim, depth=cfg.ste_depth,
                     num_heads=cfg.ste_heads, mlp_ratio=cfg.ste_mlp_ratio,
                     dtype=dt, name="interaction")(tokens)
        feat_l, feat_r = jnp.split(tokens, 2, axis=1)  # (B, 21, jdim)

        result = RegressorOffset(cfg, name="regressor")(
            feat_l, feat_r, para_l, para_r, offset,
            mano_left, mano_right, train)

        # --- image-space re-projection ---
        proj_emb = MLP1d(jdim, jdim, dtype=dt, name="proj_feat_emb")
        pf_l = proj_emb(feat_l, train)
        pf_r = proj_emb(feat_r, train)
        out_ch = img_feat.shape[-1]
        if cfg.fused_splat_conv:
            # exact factorization of conv3x3(concat(splats)) through the
            # rank-1 splat structure; identical parameters
            kernel, kbias = _SplatConvParams(
                out_ch, 2 * 20 * jdim, name="fusion_conv1")()
            fused = fused_splat_conv(
                result["pd_joint_uv_left"], result["pd_joint_uv_right"],
                pf_l, pf_r, kernel.astype(dt), kbias,
                self.feature_size, float(self.distance))
            fused = fused.astype(dt)
        else:
            if cfg.use_pallas_splat:
                from dir_tpu.ops.pallas_bone_splat import bone_splat_pallas
                splat = lambda uv, f: bone_splat_pallas(  # noqa: E731
                    uv, f, self.feature_size, float(self.distance))
            else:
                splat = lambda uv, f: bone_splat(  # noqa: E731
                    uv, f, self.feature_size, self.distance)
            splat_l = splat(result["pd_joint_uv_left"], pf_l)
            splat_r = splat(result["pd_joint_uv_right"], pf_r)
            fused = jnp.concatenate([splat_l, splat_r], axis=-1)
            fused = nn.Conv(out_ch, (3, 3), padding="SAME", dtype=dt,
                            kernel_init=conv_kernel_init,
                            name="fusion_conv1")(fused)
        fused = nn.relu(_bn(train, "fusion_bn", dt)(stat_barrier(fused, train)))
        if cfg.quant_aux_eval and not train and not self.is_initializing():
            fused = module_quant_conv(self, "fusion_conv2", fused,
                                      static=cfg.quant_static, out_dtype=dt)
        else:
            fused = nn.Conv(img_feat.shape[-1], (1, 1), dtype=dt,
                            kernel_init=conv_kernel_init,
                            name="fusion_conv2")(fused)

        feats = {
            "img_feat": fused,
            "joint_feat_left": feat_l,
            "joint_feat_right": feat_r,
        }
        if not cfg.fused_splat_conv:
            # visualization-only splat sum (reference: dir.py:128); the
            # factored path never materializes the splat maps
            feats["vis_img_feat"] = splat_l + splat_r
        return result, feats


class SegDenseHead(nn.Module):
    """3-class segmentation / dense-correspondence head
    (models/dir.py:411-420).

    ``quant_eval`` (cfg.quant_aux_eval): int8 conv1 with the following
    BN folded in; conv2 (1x1 -> 3 logits) stays fp. Serve-artifact-only
    win — the eval bench DCEs the heads."""

    out_ch: int = 3
    dtype: object = jnp.float32
    quant_eval: bool = False
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        if self.quant_eval and not train and not self.is_initializing():
            x = nn.relu(module_quant_conv(
                self, "conv1", x.astype(self.dtype),
                static=self.quant_static, out_dtype=self.dtype,
                fold_bn_name="bn", bn_eps=BN_EPS))
        else:
            x = nn.Conv(c // 2, (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=conv_kernel_init, name="conv1")(x)
            x = nn.relu(_bn(train, "bn", self.dtype)(stat_barrier(x, train)))
        out = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                      kernel_init=conv_kernel_init, name="conv2")(x)
        return _head32(out)


class Decoder(nn.Module):
    """FPN-style decoder with two refinement stages
    (FusionJointInterIterDecoder, models/dir.py:389-483)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, feats, init_out: dict, mano_left: ManoModel,
                 mano_right: ManoModel, train: bool = False) -> dict:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        d = cfg.decoder_dim
        c1, c2, c3, c4 = feats
        outputs = []

        # Stage 1 @ 16x16 (dir.py:441-456). The skip-fusion Residuals
        # take their two inputs via `pair=` — exact concat algebra with
        # bn1/conv1/skip split per channel range; at inference the NHWC
        # concats (pure HBM copies, ~1.3 ms/step at eval b256,
        # analyze_layers.py) never materialize. Training keeps the
        # concat (layers.py _PAIR_FUSION for the measurements).
        q = cfg.quant_decoder_eval
        qs = cfg.quant_static
        c4_up = upsample2x(c4)
        c3_skip = Residual(d, dtype=dt, quant_eval=q, quant_static=qs,
                           name="skip_layer4")(c3, train)
        fusion = Residual(d, dtype=dt, quant_eval=q, quant_static=qs,
                          name="fusion_layer4")(c4_up, train, pair=c3_skip)
        # Feature size derived from the actual map (16 at 256^2 input) so
        # the model is input-size agnostic; distances stay configured.
        result, stage_feats = RefineStage(
            cfg, fusion.shape[1], cfg.stage_distances[0],
            name="projecter_4")(fusion, init_out, mano_left, mano_right,
                                train)
        enhance = Residual(d, dtype=dt, quant_eval=q, quant_static=qs,
                           name="enhance_layer4")(
            fusion, train, pair=stage_feats["img_feat"])
        outputs.append(result)

        # Stage 2 @ 32x32 (dir.py:458-471)
        c3_up = upsample2x(enhance)
        c2_skip = Residual(d, dtype=dt, quant_eval=q, quant_static=qs,
                           name="skip_layer3")(c2, train)
        fusion = Residual(d, dtype=dt, quant_eval=q, quant_static=qs,
                          name="fusion_layer3")(c3_up, train, pair=c2_skip)
        result, stage_feats = RefineStage(
            cfg, fusion.shape[1], cfg.stage_distances[1],
            name="projecter_3")(fusion, result, mano_left, mano_right, train)
        enhance = Residual(d, dtype=dt, quant_eval=q, quant_static=qs,
                           name="enhance_layer3")(
            fusion, train, pair=stage_feats["img_feat"])
        outputs.append(result)

        # Final seg / dense heads @ 32x32 (dir.py:404-420,474-476) — trunk
        # dtype; both heads cast their outputs back to fp32 for the loss.
        qa = cfg.quant_aux_eval and not train and not self.is_initializing()
        if qa:
            x = nn.relu(module_quant_conv(
                self, "final_conv1", enhance.astype(dt), static=qs,
                out_dtype=dt, fold_bn_name="final_bn", bn_eps=BN_EPS))
            x = module_quant_conv(self, "final_conv2", x, static=qs,
                                  out_dtype=dt)
        else:
            x = nn.Conv(d, (3, 3), padding="SAME", use_bias=False, dtype=dt,
                        kernel_init=conv_kernel_init,
                        name="final_conv1")(enhance)
            x = nn.relu(_bn(train, "final_bn", dt)(stat_barrier(x, train)))
            x = nn.Conv(d, (1, 1), dtype=dt, kernel_init=conv_kernel_init,
                        name="final_conv2")(x)
        seg = SegDenseHead(dtype=dt, quant_eval=cfg.quant_aux_eval,
                           quant_static=qs, name="seg")(x, train)
        dense = SegDenseHead(dtype=dt, quant_eval=cfg.quant_aux_eval,
                             quant_static=qs, name="dense")(x, train)

        return {
            "result_list": outputs,
            "seg": seg,
            "dense": dense,
            "proj_feat": stage_feats.get("vis_img_feat"),
        }


class DIR(nn.Module):
    """Full DIR network (models/dir.py:486-540 without the loss block —
    losses live in dir_tpu.models.losses).

    Call with an NHWC image batch; returns a dict:
        stages: list of 3 per-stage output dicts (init + 2 refinements)
        seg, dense: (B, 32, 32, 3) head outputs
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray, mano_left: ManoModel,
                 mano_right: ManoModel, train: bool = False) -> dict:
        feats = ResNetPyramid(layers=self.cfg.backbone_layers,
                              dtype=jnp.dtype(self.cfg.dtype),
                              stem=self.cfg.backbone_stem,
                              fused_eval=self.cfg.fused_bottleneck_eval,
                              quant_eval=self.cfg.quant_backbone_eval,
                              quant_static=self.cfg.quant_static,
                              quant_stem=self.cfg.quant_aux_eval,
                              name="backbone")(img, train)
        init_out = InitRegressor(self.cfg, name="init_regressor")(
            feats[-1], mano_left, mano_right, train)
        decode = Decoder(self.cfg, name="decoder")(
            feats, init_out, mano_left, mano_right, train)
        return {
            "stages": [init_out] + decode["result_list"],
            "seg": decode["seg"],
            "dense": decode["dense"],
        }
