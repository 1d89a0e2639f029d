"""PointRCNN two-stage 3D object detection, TPU-native.

Rebuild of /root/reference/ml3d/torch/models/point_rcnn.py:55-1691 (arch from
Shi et al., arXiv:1812.04244): stage 1 (RPN) is a PointNet++ MSG backbone
with per-point foreground classification and bin-based box regression;
stage 2 (RCNN) refines NMS-selected proposals with canonical-frame pooled
points. Trained stage-wise via ``mode='RPN' | 'RCNN'``.

TPU re-design:
* PointNet++ CUDA ops -> device compositions (models/pointnet2.py),
* ProposalLayer's dynamic distance-bucketed NMS (reference :1080-1147)
  becomes fixed-budget masked top-k + rotated NMS per bucket — outputs are
  always [nms_post, 7] with a validity mask,
* roipool3d (CUDA roi_pool) -> points-in-rotated-box mask + top-512 ordered
  gather, fully shaped,
* ProposalTargetLayer keeps the IoU-threshold fg/bg split with fixed
  quotas sampled by randomized priorities; the per-roi jitter augmentation
  (roi_fg_aug_times) draws its full candidate block up front and selects
  the first passing jitter with one batched rotated-IoU call instead of
  the reference's host-side rejection loop,
* everything runs in camera coordinates like the reference (y down, box y at
  the bottom face).
"""

import functools

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..datasets.augment import ObjdetAugmentation
from ..datasets.utils import BEVBox3D, DataProcessing
from ..datasets.utils.operations import points_in_box
from ..modules.losses import CrossEntropyLoss, FocalLoss, SmoothL1Loss
from ..ops.nms import nms_bev
from ..utils import MODEL
from .base_model_objdet import ObjdetBaseModel
from .common import batch_norm
from .pointnet2 import PointnetSAModule, Pointnet2MSG, SharedMLP2d


def rotate_pc_along_y(pc, rot_angle):
    """Rotate [..., 3+] points around the camera y axis by [...] angles."""
    cosa = jnp.cos(rot_angle)[..., None]
    sina = jnp.sin(rot_angle)[..., None]
    x = pc[..., 0]
    z = pc[..., 2]
    x_new = cosa[..., 0] * x + (-sina[..., 0]) * z
    z_new = sina[..., 0] * x + cosa[..., 0] * z
    return jnp.concatenate(
        [x_new[..., None], pc[..., 1:2], z_new[..., None], pc[..., 3:]],
        axis=-1)


# --------------------------------------------------------------------------
# bin-based encoding (reference get_reg_loss :433-615 / decode :1151-1260)
# --------------------------------------------------------------------------


def decode_bbox_target(roi_box3d, pred_reg, loc_scope, loc_bin_size,
                       num_head_bin, anchor_size, get_xz_fine=True,
                       get_y_by_bin=False, loc_y_scope=0.5,
                       loc_y_bin_size=0.25, get_ry_fine=False):
    """Vectorized bin-based box decoding. roi_box3d [N, 3 or 7],
    pred_reg [N, C] -> [N, 7] (x,y,z,h,w,l,ry) camera frame."""
    anchor = jnp.asarray(anchor_size, jnp.float32)
    per_loc = int(loc_scope / loc_bin_size) * 2
    loc_y_bins = int(loc_y_scope / loc_y_bin_size) * 2

    x_bin = jnp.argmax(pred_reg[:, 0:per_loc], axis=1)
    z_bin = jnp.argmax(pred_reg[:, per_loc:per_loc * 2], axis=1)
    pos_x = x_bin * loc_bin_size + loc_bin_size / 2 - loc_scope
    pos_z = z_bin * loc_bin_size + loc_bin_size / 2 - loc_scope
    start = per_loc * 2
    if get_xz_fine:
        x_res = jnp.take_along_axis(
            pred_reg[:, per_loc * 2:per_loc * 3], x_bin[:, None],
            axis=1)[:, 0] * loc_bin_size
        z_res = jnp.take_along_axis(
            pred_reg[:, per_loc * 3:per_loc * 4], z_bin[:, None],
            axis=1)[:, 0] * loc_bin_size
        pos_x = pos_x + x_res
        pos_z = pos_z + z_res
        start = per_loc * 4

    if get_y_by_bin:
        y_bin = jnp.argmax(pred_reg[:, start:start + loc_y_bins], axis=1)
        y_res = jnp.take_along_axis(
            pred_reg[:, start + loc_y_bins:start + 2 * loc_y_bins],
            y_bin[:, None], axis=1)[:, 0] * loc_y_bin_size
        pos_y = (y_bin * loc_y_bin_size + loc_y_bin_size / 2 - loc_y_scope +
                 y_res) + roi_box3d[:, 1]
        start = start + 2 * loc_y_bins
    else:
        pos_y = roi_box3d[:, 1] + pred_reg[:, start]
        start = start + 1

    ry_bin = jnp.argmax(pred_reg[:, start:start + num_head_bin], axis=1)
    ry_res_norm = jnp.take_along_axis(
        pred_reg[:, start + num_head_bin:start + 2 * num_head_bin],
        ry_bin[:, None], axis=1)[:, 0]
    if get_ry_fine:
        apc = (np.pi / 2) / num_head_bin
        ry = ry_bin * apc + apc / 2 + ry_res_norm * (apc / 2) - np.pi / 4
    else:
        apc = (2 * np.pi) / num_head_bin
        ry = (ry_bin * apc + ry_res_norm * (apc / 2)) % (2 * np.pi)
        ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    start = start + 2 * num_head_bin

    size = pred_reg[:, start:start + 3] * anchor + anchor  # h, w, l

    box = jnp.concatenate(
        [pos_x[:, None], pos_y[:, None], pos_z[:, None], size,
         ry[:, None]], axis=-1)
    if roi_box3d.shape[1] == 7:
        roi_ry = roi_box3d[:, 6]
        box = rotate_pc_along_y(box, -roi_ry)
        box = box.at[:, 6].add(roi_ry)
    box = box.at[:, 0].add(roi_box3d[:, 0])
    box = box.at[:, 2].add(roi_box3d[:, 2])
    return box


def get_reg_loss(pred_reg, reg_label, loc_scope, loc_bin_size, num_head_bin,
                 anchor_size, weight, get_xz_fine=True, get_y_by_bin=False,
                 loc_y_scope=0.5, loc_y_bin_size=0.25, get_ry_fine=False):
    """Masked bin-based regression loss; ``weight`` [N] selects foreground
    rows (the reference compacts instead, :525)."""
    ce = CrossEntropyLoss()
    sl1 = SmoothL1Loss()
    per_loc = int(loc_scope / loc_bin_size) * 2
    avg = jnp.maximum(weight.sum(), 1.0)

    x_shift = jnp.clip(reg_label[:, 0] + loc_scope, 0,
                       loc_scope * 2 - 1e-3)
    z_shift = jnp.clip(reg_label[:, 2] + loc_scope, 0,
                       loc_scope * 2 - 1e-3)
    x_bin = jnp.floor(x_shift / loc_bin_size).astype(jnp.int32)
    z_bin = jnp.floor(z_shift / loc_bin_size).astype(jnp.int32)

    loss_loc = ce(pred_reg[:, 0:per_loc], x_bin, weight=weight,
                  avg_factor=avg) + \
        ce(pred_reg[:, per_loc:2 * per_loc], z_bin, weight=weight,
           avg_factor=avg)
    start = 2 * per_loc
    if get_xz_fine:
        x_res_lbl = (x_shift -
                     (x_bin * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        z_res_lbl = (z_shift -
                     (z_bin * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        x_res = jnp.take_along_axis(pred_reg[:, 2 * per_loc:3 * per_loc],
                                    x_bin[:, None], axis=1)[:, 0]
        z_res = jnp.take_along_axis(pred_reg[:, 3 * per_loc:4 * per_loc],
                                    z_bin[:, None], axis=1)[:, 0]
        loss_loc = loss_loc + sl1(x_res, x_res_lbl, weight=weight,
                                  avg_factor=avg) + \
            sl1(z_res, z_res_lbl, weight=weight, avg_factor=avg)
        start = 4 * per_loc

    if get_y_by_bin:
        loc_y_bins = int(loc_y_scope / loc_y_bin_size) * 2
        y_shift = jnp.clip(reg_label[:, 1] + loc_y_scope, 0,
                           loc_y_scope * 2 - 1e-3)
        y_bin = jnp.floor(y_shift / loc_y_bin_size).astype(jnp.int32)
        y_res_lbl = (y_shift - (y_bin * loc_y_bin_size +
                                loc_y_bin_size / 2)) / loc_y_bin_size
        y_res = jnp.take_along_axis(
            pred_reg[:, start + loc_y_bins:start + 2 * loc_y_bins],
            y_bin[:, None], axis=1)[:, 0]
        loss_loc = loss_loc + \
            ce(pred_reg[:, start:start + loc_y_bins], y_bin, weight=weight,
               avg_factor=avg) + \
            sl1(y_res, y_res_lbl, weight=weight, avg_factor=avg)
        start = start + 2 * loc_y_bins
    else:
        loss_loc = loss_loc + sl1(pred_reg[:, start], reg_label[:, 1],
                                  weight=weight, avg_factor=avg)
        start = start + 1

    ry_label = reg_label[:, 6]
    if get_ry_fine:
        apc = (np.pi / 2) / num_head_bin
        ry = ry_label % (2 * np.pi)
        opposite = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
        ry = jnp.where(opposite, (ry + np.pi) % (2 * np.pi), ry)
        shift = jnp.clip((ry + np.pi * 0.5) % (2 * np.pi) - np.pi * 0.25,
                         1e-3, np.pi * 0.5 - 1e-3)
        ry_bin = jnp.floor(shift / apc).astype(jnp.int32)
        ry_res_lbl = (shift - (ry_bin * apc + apc / 2)) / (apc / 2)
    else:
        apc = (2 * np.pi) / num_head_bin
        shift = (ry_label % (2 * np.pi) + apc / 2) % (2 * np.pi)
        ry_bin = jnp.floor(shift / apc).astype(jnp.int32)
        ry_res_lbl = (shift - (ry_bin * apc + apc / 2)) / (apc / 2)

    ry_res = jnp.take_along_axis(
        pred_reg[:, start + num_head_bin:start + 2 * num_head_bin],
        ry_bin[:, None], axis=1)[:, 0]
    loss_angle = ce(pred_reg[:, start:start + num_head_bin], ry_bin,
                    weight=weight, avg_factor=avg) + \
        sl1(ry_res, ry_res_lbl, weight=weight, avg_factor=avg)
    start = start + 2 * num_head_bin

    anchor = jnp.asarray(anchor_size, jnp.float32)
    size_lbl = (reg_label[:, 3:6] - anchor) / anchor
    loss_size = sl1(pred_reg[:, start:start + 3], size_lbl, weight=weight,
                    avg_factor=avg)
    return loss_loc, loss_angle, loss_size


# --------------------------------------------------------------------------
# roi pooling (reference roipool3d_utils + CUDA roi_pool)
# --------------------------------------------------------------------------


def points_in_cam_box(points, boxes, extra_width=0.0):
    """Membership [N, M] of camera-frame points in (x,y,z,h,w,l,ry) boxes
    (y down, box spans y-h..y)."""
    x = points[:, None, 0] - boxes[None, :, 0]
    y = points[:, None, 1] - boxes[None, :, 1]
    z = points[:, None, 2] - boxes[None, :, 2]
    ry = boxes[None, :, 6]
    cx = jnp.cos(ry) * x + jnp.sin(ry) * z
    cz = -jnp.sin(ry) * x + jnp.cos(ry) * z
    h = boxes[None, :, 3] + extra_width * 2
    w = boxes[None, :, 4] + extra_width * 2
    l = boxes[None, :, 5] + extra_width * 2
    in_x = jnp.abs(cx) <= l / 2
    in_z = jnp.abs(cz) <= w / 2
    in_y = (y <= extra_width) & (y >= -(boxes[None, :, 3] + extra_width))
    return in_x & in_y & in_z


def roipool3d(xyz, feats, boxes, extra_width, num_points):
    """Pool up to ``num_points`` in-box points per roi (ordered gather).

    Returns ([M, P, 3+C] pooled, [M] empty_flag)."""
    n = xyz.shape[0]
    member = points_in_cam_box(xyz, boxes, extra_width)  # [N, M]
    order_score = jnp.where(member.T, -jnp.arange(n, dtype=jnp.float32),
                            -jnp.inf)  # [M, N]
    _, idx = jax.lax.top_k(order_score, min(num_points, n))  # [M, P]
    valid = jnp.take_along_axis(member.T, idx, axis=1)
    # empty rois: all invalid; backfill with the first point (masked later)
    data = jnp.concatenate([xyz, feats], axis=-1)
    pooled = data[idx]  # [M, P, 3+C]
    first = pooled[:, :1, :]
    pooled = jnp.where(valid[..., None], pooled, first)
    empty = ~jnp.any(valid, axis=1)
    return pooled, empty


# --------------------------------------------------------------------------
# networks
# --------------------------------------------------------------------------


class _ConvHead(nn.Module):
    """1x1-conv head stack (Dense over channels-last) with dropout."""
    out_ch: tuple
    final: int
    db_ratio: float = 0.5
    use_bn: bool = True
    final_bias_init: float = 0.0

    @nn.compact
    def __call__(self, x, training=False):
        for i, c in enumerate(self.out_ch):
            x = nn.Dense(c, use_bias=not self.use_bn, name=f"conv{i}")(x)
            if self.use_bn:
                x = batch_norm(training, name=f"bn{i}")(x)
            x = nn.relu(x)
            if self.db_ratio > 0:
                x = nn.Dropout(self.db_ratio,
                               deterministic=not training)(x)
        return nn.Dense(
            self.final,
            bias_init=nn.initializers.constant(self.final_bias_init),
            kernel_init=nn.initializers.normal(0.001),
            name="final")(x)


class RPNNet(nn.Module):
    """Stage-1 network (single sample): backbone + cls/reg heads."""
    backbone_cfg: dict
    cls_out_ch: tuple
    reg_out_ch: tuple
    reg_channels: int
    db_ratio: float = 0.5

    @nn.compact
    def __call__(self, points, training=False):
        xyz, feats = Pointnet2MSG(**dict(self.backbone_cfg),
                                  name="backbone")(points,
                                                   training=training)
        cls = _ConvHead(tuple(self.cls_out_ch), 1, self.db_ratio,
                        final_bias_init=-float(np.log(99.0)),
                        name="cls_blocks")(feats, training=training)
        reg = _ConvHead(tuple(self.reg_out_ch), self.reg_channels,
                        self.db_ratio, name="reg_blocks")(
            feats, training=training)
        return cls, reg, xyz, feats


class RCNNNet(nn.Module):
    """Stage-2 refinement network over pooled roi points (one roi batch)."""
    num_classes: int
    sa_npoints: tuple
    sa_radius: tuple
    sa_nsample: tuple
    sa_mlps: tuple
    xyz_up_layer: tuple
    cls_out_ch: tuple
    reg_out_ch: tuple
    reg_channels: int
    rcnn_input_channel: int = 5

    @nn.compact
    def __call__(self, pts_input, training=False):
        """pts_input [P, 3 + 2 + C] (xyz, seg mask, depth, rpn feats) for ONE
        roi -> (cls [...,], reg [C])."""
        xyz = pts_input[:, 0:3]
        xyz_in = pts_input[:, :self.rcnn_input_channel]
        # reference builds these with gen_CNN (torch_utils.py:26-45): plain
        # biased 1x1 conv + ReLU, NO batch norm — bn=False for parity
        xyz_feat = SharedMLP2d(tuple(self.xyz_up_layer), bn=False,
                               name="xyz_up_layer")(xyz_in,
                                                    training=training)
        rpn_feat = pts_input[:, self.rcnn_input_channel:]
        merged = jnp.concatenate([xyz_feat, rpn_feat], axis=-1)
        merged = SharedMLP2d((self.xyz_up_layer[-1],), bn=False,
                             name="merge_down_layer")(merged,
                                                      training=training)

        feats = merged
        cur_xyz = xyz
        for i in range(len(self.sa_npoints)):
            np_i = self.sa_npoints[i]
            cur_xyz, feats = PointnetSAModule(
                npoint=None if np_i in (-1, None) else np_i,
                radii=(self.sa_radius[i],),
                nsamples=(self.sa_nsample[i],),
                mlps=(tuple(self.sa_mlps[i]),),
                name=f"sa{i}")(cur_xyz, feats, training=training)

        feat = feats[0]  # group-all leaves one row
        cls_ch = 1 if self.num_classes == 2 else self.num_classes
        cls = _ConvHead(tuple(self.cls_out_ch), cls_ch, 0.0, use_bn=False,
                        name="cls_blocks")(feat[None], training=training)[0]
        reg = _ConvHead(tuple(self.reg_out_ch), self.reg_channels, 0.0,
                        use_bn=False, name="reg_blocks")(
            feat[None], training=training)[0]
        return cls, reg


def sample_rois_for_rcnn(rois, roi_valid, gt, gt_count, key, *,
                         roi_per_image=64, fg_ratio=0.5, reg_fg_thresh=0.55,
                         cls_bg_thresh=0.45, cls_bg_thresh_lo=0.05,
                         hard_bg_ratio=0.8):
    """Fixed-quota fg/bg roi sampling (reference ProposalTargetLayer.
    sample_rois_for_rcnn :1390-1470) for ONE sample.

    Returns (sel_rois [R,7], sel_gt [R,7], sel_iou [R], sel_valid [R]).
    Quotas are filled by randomized-priority top-k instead of index
    compaction; unfillable slots are marked invalid.
    """
    from ..ops.iou import iou_3d

    g = gt.shape[0]
    gmask = jnp.arange(g) < gt_count
    # camera-frame boxes (x,y,z,h,w,l,ry), y at bottom with span [y-h, y]:
    # convert to the iou_3d convention [x, y', z, w, h, l, ry], y' = y - h
    def conv(b):
        return jnp.stack([b[:, 0], b[:, 1] - b[:, 3], b[:, 2], b[:, 4],
                          b[:, 3], b[:, 5], b[:, 6]], axis=-1)

    iou = iou_3d(conv(rois), conv(gt), xp=jnp)  # [M, G]
    iou = jnp.where(gmask[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    gt_arg = jnp.argmax(iou, axis=1)

    fg = (max_iou >= reg_fg_thresh) & roi_valid
    easy_bg = (max_iou < cls_bg_thresh_lo) & roi_valid
    hard_bg = (max_iou >= cls_bg_thresh_lo) & (max_iou < cls_bg_thresh) & \
        roi_valid

    fg_quota = int(np.round(fg_ratio * roi_per_image))
    bg_quota = roi_per_image - fg_quota
    hard_quota = int(np.round(bg_quota * hard_bg_ratio))
    easy_quota = bg_quota - hard_quota

    k1, k2, k3 = jax.random.split(key, 3)
    m = rois.shape[0]

    def pick(mask, quota, k):
        pri = jnp.where(mask, jax.random.uniform(k, (m,)), -jnp.inf)
        val, idx = jax.lax.top_k(pri, quota)
        return idx.astype(jnp.int32), jnp.isfinite(val)

    fg_idx, fg_ok = pick(fg, fg_quota, k1)
    hb_idx, hb_ok = pick(hard_bg, hard_quota, k2)
    eb_idx, eb_ok = pick(easy_bg, easy_quota, k3)
    # unfilled easy-bg slots fall back to hard bg and vice versa (both empty
    # => slot invalid)
    sel = jnp.concatenate([fg_idx, hb_idx, eb_idx])
    ok = jnp.concatenate([fg_ok, hb_ok, eb_ok])

    return rois[sel], gt[gt_arg[sel]], max_iou[sel], ok


# pos_range, hwl_range, angle_range per jitter level (reference
# random_aug_box3d :1590-1617; its mean_iou column is unused at runtime)
_AUG_RANGE_CONFIG = np.array(
    [[0.2, 0.1, np.pi / 12], [0.3, 0.15, np.pi / 12],
     [0.5, 0.15, np.pi / 9], [0.8, 0.15, np.pi / 6],
     [1.0, 0.15, np.pi / 3]], np.float32)


def aug_roi_by_noise(rois, gt, iou_src, key, *, pos_thresh, aug_times=10):
    """Per-roi jitter augmentation, TPU-native (reference
    aug_roi_by_noise_torch :1553-1589).

    The reference rejection-samples each roi on host: up to `aug_times`
    jitters, stopping at the first whose 3D IoU with its gt clears
    `pos_thresh` (each attempt keeps the original box with p=0.2); if all
    fail it keeps the last attempt. A data-dependent while-loop per roi
    doesn't map to XLA, so this draws the full static block of `aug_times`
    candidates up front, computes every rotated IoU in one batched call and
    picks the first passing candidate with argmax — same distribution, one
    fused kernel.

    rois/gt: [R, 7] cam-frame (x, y, z, h, w, l, ry); iou_src: [R] the
    pre-jitter IoU (reported unchanged when the chosen attempt kept the
    original box, as the reference does). Returns (aug_rois [R,7], iou [R]).
    """
    from ..ops.iou import iou_3d_elementwise

    if aug_times <= 0:
        return rois, iou_src
    r = rois.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    cfg_idx = jax.random.randint(k1, (r, aug_times), 0,
                                 len(_AUG_RANGE_CONFIG))
    ranges = jnp.asarray(_AUG_RANGE_CONFIG)[cfg_idx]  # [R, A, 3]
    u = jax.random.uniform(k2, (r, aug_times, 7), minval=-1.0, maxval=1.0)
    pos = rois[:, None, 0:3] + u[..., 0:3] * ranges[..., 0:1]
    hwl = rois[:, None, 3:6] * (u[..., 3:6] * ranges[..., 1:2] + 1.0)
    ang = rois[:, None, 6:7] + u[..., 6:7] * ranges[..., 2:3]
    cand = jnp.concatenate([pos, hwl, ang], axis=-1)  # [R, A, 7]
    keep = jax.random.uniform(k3, (r, aug_times)) < 0.2
    cand = jnp.where(keep[..., None], rois[:, None, :], cand)

    def conv(b):
        return jnp.stack([b[..., 0], b[..., 1] - b[..., 3], b[..., 2],
                          b[..., 4], b[..., 3], b[..., 5], b[..., 6]],
                         axis=-1)

    ious = iou_3d_elementwise(
        conv(cand), jnp.broadcast_to(conv(gt)[:, None, :], cand.shape),
        xp=jnp)  # [R, A]
    success = ious >= pos_thresh
    any_ok = jnp.any(success, axis=1)
    pick = jnp.where(any_ok, jnp.argmax(success, axis=1), aug_times - 1)
    sel = jnp.take_along_axis(cand, pick[:, None, None], axis=1)[:, 0]
    sel_iou = jnp.take_along_axis(ious, pick[:, None], axis=1)[:, 0]
    sel_keep = jnp.take_along_axis(keep, pick[:, None], axis=1)[:, 0]
    return sel, jnp.where(sel_keep, iou_src, sel_iou)


def rcnn_targets(xyz, pts_feature, rois, roi_valid, gt, gt_count, key, cfg):
    """Pool points + build RCNN training targets for ONE sample (reference
    ProposalTargetLayer.forward :1325-1388, including per-roi jitter aug).

    Returns dict with pts_input [R, P, 5+C], cls_label [R], reg_valid [R],
    gt_ct [R, 7] (canonical-frame gt), roi_boxes [R, 7].
    """
    key, key_fg, key_bg = jax.random.split(key, 3)
    sel_rois, sel_gt, sel_iou, sel_ok = sample_rois_for_rcnn(
        rois, roi_valid, gt, gt_count, key,
        roi_per_image=cfg["roi_per_image"], fg_ratio=cfg["fg_ratio"],
        reg_fg_thresh=cfg["reg_fg_thresh"],
        cls_bg_thresh=cfg["cls_bg_thresh"],
        cls_bg_thresh_lo=cfg["cls_bg_thresh_lo"],
        hard_bg_ratio=cfg["hard_bg_ratio"])

    aug_times = int(cfg.get("roi_fg_aug_times", 0))
    if aug_times > 0:
        # fg slots occupy the first fg_quota rows (sample_rois layout); bg
        # rois get a single jitter attempt (reference :1496-1500)
        fg_quota = int(np.round(cfg["fg_ratio"] * cfg["roi_per_image"]))
        pos_thresh = min(cfg["reg_fg_thresh"], cfg["cls_fg_thresh"])
        fg_rois, fg_iou = aug_roi_by_noise(
            sel_rois[:fg_quota], sel_gt[:fg_quota], sel_iou[:fg_quota],
            key_fg, pos_thresh=pos_thresh, aug_times=aug_times)
        bg_rois, bg_iou = aug_roi_by_noise(
            sel_rois[fg_quota:], sel_gt[fg_quota:], sel_iou[fg_quota:],
            key_bg, pos_thresh=pos_thresh, aug_times=1)
        sel_rois = jnp.concatenate([fg_rois, bg_rois])
        sel_iou = jnp.concatenate([fg_iou, bg_iou])

    pooled, empty = roipool3d(xyz, pts_feature, sel_rois,
                              cfg["pool_extra_width"], cfg["num_points"])
    # canonical transform
    roi_ry = sel_rois[:, 6] % (2 * np.pi)
    roi_center = sel_rois[:, 0:3]
    pts = pooled[:, :, 0:3] - roi_center[:, None, :]
    ang = jnp.broadcast_to(sel_rois[:, 6:7], pts.shape[:2])
    pts = rotate_pc_along_y(pts, ang)
    pooled = jnp.concatenate([pts, pooled[:, :, 3:]], axis=-1)

    gt_ct = sel_gt.at[:, 0:3].add(-roi_center)
    gt_ct = gt_ct.at[:, 6].add(-roi_ry)
    gt_ct = jnp.concatenate(
        [rotate_pc_along_y(gt_ct[:, None, 0:3], roi_ry[:, None])[:, 0],
         gt_ct[:, 3:]], axis=-1)

    valid = sel_ok & (~empty)
    reg_valid = (sel_iou > cfg["reg_fg_thresh"]) & valid
    cls_label = (sel_iou > cfg["cls_fg_thresh"]).astype(jnp.int32)
    ambiguous = (sel_iou > cfg["cls_bg_thresh"]) & \
        (sel_iou < cfg["cls_fg_thresh"])
    cls_label = jnp.where(~valid | ambiguous, -1, cls_label)

    return {
        "pts_input": pooled,
        "cls_label": cls_label,
        "reg_valid_mask": reg_valid,
        "gt_of_rois": gt_ct,
        "roi_boxes3d": sel_rois,
    }


# --------------------------------------------------------------------------
# model wrapper
# --------------------------------------------------------------------------


class ProposalConfig:
    """Shared bin/NMS parameters (reference ProposalLayer :984-1020)."""

    def __init__(self, nms_pre=9000, nms_post=512, nms_thres=0.85,
                 nms_post_val=None, nms_thres_val=None, mean_size=[1.0],
                 loc_xz_fine=True, loc_scope=3.0, loc_bin_size=0.5,
                 num_head_bin=12, get_y_by_bin=False, get_ry_fine=False,
                 loc_y_scope=0.5, loc_y_bin_size=0.25, post_process=True):
        self.nms_pre = nms_pre
        self.nms_post = nms_post
        self.nms_thres = nms_thres
        self.nms_post_val = nms_post_val or nms_post
        self.nms_thres_val = nms_thres_val or nms_thres
        self.mean_size = mean_size
        self.loc_xz_fine = loc_xz_fine
        self.loc_scope = loc_scope
        self.loc_bin_size = loc_bin_size
        self.num_head_bin = num_head_bin
        self.get_y_by_bin = get_y_by_bin
        self.get_ry_fine = get_ry_fine
        self.loc_y_scope = loc_y_scope
        self.loc_y_bin_size = loc_y_bin_size
        self.post_process = post_process

    @property
    def reg_channels(self):
        per_loc = int(self.loc_scope / self.loc_bin_size) * 2
        loc_y_bins = int(self.loc_y_scope / self.loc_y_bin_size) * 2
        c = per_loc * 4 if self.loc_xz_fine else per_loc * 2
        c += self.num_head_bin * 2 + 3
        c += loc_y_bins * 2 if self.get_y_by_bin else 1
        return c


class PointRCNNNet(nn.Module):
    """Combined two-stage network over a padded batch.

    mode='RPN': returns {'cls', 'reg', 'xyz', 'feats'} for RPN training.
    mode='RCNN': RPN runs frozen (stop_gradient), proposals are decoded and
    NMS'd, rois are target-sampled (training) or pooled directly (eval), and
    the refinement head runs per roi. Needs an rng stream 'sampling' when
    training.
    """
    rpn: RPNNet
    rcnn: RCNNNet
    mode: str
    rpn_head: dict  # FrozenDict of ProposalConfig kwargs
    target_cfg: dict
    score_thres: float = 0.3

    def _proposals(self, scores, reg, xyz, training):
        hc = ProposalConfig(**dict(self.rpn_head))
        boxes = decode_bbox_target(
            xyz, reg, hc.loc_scope, hc.loc_bin_size, hc.num_head_bin,
            hc.mean_size, get_xz_fine=hc.loc_xz_fine,
            get_y_by_bin=hc.get_y_by_bin, get_ry_fine=hc.get_ry_fine,
            loc_y_scope=hc.loc_y_scope, loc_y_bin_size=hc.loc_y_bin_size)
        boxes = boxes.at[:, 1].add(boxes[:, 3] / 2)
        nms_post = hc.nms_post if training else hc.nms_post_val
        nms_thres = hc.nms_thres if training else hc.nms_thres_val
        nms_pre = min(hc.nms_pre, boxes.shape[0])
        dist = boxes[:, 2]
        buckets = [((dist >= 0) & (dist <= 40.0), int(nms_pre * 0.7),
                    int(nms_post * 0.7)),
                   ((dist > 40.0) & (dist <= 80.0),
                    nms_pre - int(nms_pre * 0.7),
                    nms_post - int(nms_post * 0.7))]
        # caps can exceed the candidate count on tiny inputs
        buckets = [(m, p, min(q, p)) for m, p, q in buckets]
        out_b, out_s, out_v = [], [], []
        for mask, pre_n, post_n in buckets:
            sc = jnp.where(mask, scores, -jnp.inf)
            top_s, top_i = jax.lax.top_k(sc, pre_n)
            bsel = boxes[top_i]
            bev = bsel[:, [0, 2, 5, 4, 6]]
            keep = nms_bev(bev, top_s, nms_thres,
                           valid_mask=jnp.isfinite(top_s))
            ksc = jnp.where(keep, top_s, -jnp.inf)
            post_s, post_i = jax.lax.top_k(ksc, post_n)
            out_b.append(bsel[post_i])
            out_s.append(post_s)
            out_v.append(jnp.isfinite(post_s))
        return (jnp.concatenate(out_b, 0), jnp.concatenate(out_s, 0),
                jnp.concatenate(out_v, 0))

    @nn.compact
    def __call__(self, inputs, training=False):
        points = inputs["point"]  # [B, N, 3]
        b = points.shape[0]

        vrpn = nn.vmap(
            lambda mdl, x: mdl(x, training=training and self.mode == "RPN"),
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": True},
            in_axes=(0,), out_axes=0, axis_name="batch")
        cls, reg, xyz, feats = vrpn(self.rpn, points)

        if self.mode == "RPN":
            return {"cls": cls, "reg": reg, "xyz": xyz, "feats": feats}

        cls, reg, xyz, feats = jax.tree.map(jax.lax.stop_gradient,
                                            (cls, reg, xyz, feats))
        scores_raw = cls[..., 0]
        rois, roi_scores, roi_valid = jax.vmap(
            lambda s, r, x: self._proposals(s, r, x, training))(
                scores_raw, reg, xyz)

        seg_mask = (jax.nn.sigmoid(scores_raw) >
                    self.score_thres).astype(jnp.float32)
        depth = jnp.linalg.norm(xyz, axis=-1)
        pts_feature = jnp.concatenate(
            [seg_mask[..., None], (depth / 70.0 - 0.5)[..., None], feats],
            axis=-1)  # [B, N, C+2]

        tcfg = dict(self.target_cfg)
        out = {"rois": rois, "scores": roi_scores, "valid": roi_valid}
        if training:
            key = self.make_rng("sampling")
            keys = jax.random.split(key, b)
            target = jax.vmap(
                lambda x, f, r, rv, g, gc, k: rcnn_targets(
                    x, f, r, rv, g, gc, k, tcfg))(
                xyz, pts_feature, rois, roi_valid, inputs["bboxes"],
                inputs["bbox_count"], keys)
            pts_input = target["pts_input"]
        else:
            def pool(x, f, r):
                pooled, empty = roipool3d(x, f, r,
                                          tcfg["pool_extra_width"],
                                          tcfg["num_points"])
                roi_ry = r[:, 6]
                pts = pooled[:, :, 0:3] - r[:, None, 0:3]
                ang = jnp.broadcast_to(r[:, 6:7], pts.shape[:2])
                pts = rotate_pc_along_y(pts, ang)
                return jnp.concatenate([pts, pooled[:, :, 3:]], axis=-1)

            pts_input = jax.vmap(pool)(xyz, pts_feature, rois)
            target = {}

        r = pts_input.shape[1]
        flat = pts_input.reshape(b * r, pts_input.shape[2],
                                 pts_input.shape[3])
        vrcnn = nn.vmap(
            lambda mdl, x: mdl(x, training=training),
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": True},
            in_axes=(0,), out_axes=0, axis_name="batch")
        rcnn_cls, rcnn_reg = vrcnn(self.rcnn, flat)

        out["cls"] = rcnn_cls.reshape(b, r, -1)
        out["reg"] = rcnn_reg.reshape(b, r, -1)
        for k, v in target.items():
            out[k] = v
        return out


class PointRCNN(ObjdetBaseModel):
    """PointRCNN model: stage-wise RPN/RCNN training, fixed-shape decoding."""

    def __init__(self,
                 name="PointRCNN",
                 classes=['Car'],
                 score_thres=0.3,
                 npoints=16384,
                 rpn={},
                 rcnn={},
                 mode="RCNN",
                 max_gt=24,
                 augment=None,
                 **kwargs):
        super().__init__(name=name, classes=classes, score_thres=score_thres,
                         npoints=npoints, rpn=rpn, rcnn=rcnn, mode=mode,
                         max_gt=max_gt, augment=augment, **kwargs)
        assert mode in ("RPN", "RCNN")
        self.mode = mode
        self.classes = classes
        self.name2lbl = {n: i for i, n in enumerate(classes)}
        self.lbl2name = {i: n for i, n in enumerate(classes)}
        self.npoints = npoints
        self.score_thres = score_thres
        self.max_gt = max_gt
        self.augmenter = ObjdetAugmentation(self.cfg.augment, seed=self.rng)

        rpn = dict(rpn or {})
        rcnn = dict(rcnn or {})
        self.rpn_head_cfg = ProposalConfig(**rpn.get("head", {}))
        self.rcnn_head_cfg = ProposalConfig(**rcnn.get("head", {
            "nms_pre": 100, "nms_post": 100, "get_ry_fine": True
        }))
        self.rpn_cfg = rpn
        self.rcnn_cfg = rcnn
        self.loss_cls = FocalLoss(**rpn.get("focal_loss", {}))
        self.loss_weight = rpn.get("loss_weight", [1.0, 1.0])
        self.pool_extra_width = rcnn.get("target_head",
                                         {}).get("pool_extra_width", 1.0)
        self.num_pooled_points = rcnn.get("target_head",
                                          {}).get("num_points", 512)

    def get_net(self):
        rpn = self.rpn_cfg
        backbone = dict(rpn.get("backbone", {}))
        # the reference config nests the multiscale spec under SA_config
        if "SA_config" in backbone:
            backbone = {**backbone, **dict(backbone["SA_config"])}
        backbone_cfg = {
            "in_channels": backbone.get("in_channels", 0),
            "use_xyz": backbone.get("use_xyz", True),
            "sa_npoints": tuple(backbone.get(
                "npoints", [4096, 1024, 256, 64])),
            "sa_radii": tuple(map(tuple, backbone.get(
                "radius", [[0.1, 0.5], [0.5, 1.0], [1.0, 2.0],
                           [2.0, 4.0]]))),
            "sa_nsamples": tuple(map(tuple, backbone.get(
                "nsample", [[16, 32], [16, 32], [16, 32], [16, 32]]))),
            "sa_mlps": tuple(
                tuple(tuple(m) for m in lvl) for lvl in backbone.get(
                    "mlps", [[[16, 16, 32], [32, 32, 64]],
                             [[64, 64, 128], [64, 96, 128]],
                             [[128, 196, 256], [128, 196, 256]],
                             [[256, 256, 512], [256, 384, 512]]])),
            "fp_mlps": tuple(map(tuple, backbone.get(
                "fp_mlps", [[128, 128], [256, 256], [512, 512],
                            [512, 512]]))),
        }
        from flax.core import FrozenDict
        single = RPNNet(backbone_cfg=FrozenDict(backbone_cfg),
                        cls_out_ch=tuple(rpn.get("cls_out_ch", [128])),
                        reg_out_ch=tuple(rpn.get("reg_out_ch", [128])),
                        reg_channels=self.rpn_head_cfg.reg_channels,
                        db_ratio=rpn.get("db_ratio", 0.5))
        hc = self.rpn_head_cfg
        rpn_head = FrozenDict({
            "nms_pre": hc.nms_pre, "nms_post": hc.nms_post,
            "nms_thres": hc.nms_thres, "nms_post_val": hc.nms_post_val,
            "nms_thres_val": hc.nms_thres_val,
            "mean_size": tuple(np.atleast_1d(hc.mean_size).tolist()),
            "loc_xz_fine": hc.loc_xz_fine, "loc_scope": hc.loc_scope,
            "loc_bin_size": hc.loc_bin_size,
            "num_head_bin": hc.num_head_bin,
            "get_y_by_bin": hc.get_y_by_bin, "get_ry_fine": hc.get_ry_fine,
            "loc_y_scope": hc.loc_y_scope,
            "loc_y_bin_size": hc.loc_y_bin_size,
        })
        tc = dict(self.rcnn_cfg.get("target_head", {}) or {})
        target_cfg = FrozenDict({
            "pool_extra_width": tc.get("pool_extra_width", 1.0),
            "num_points": tc.get("num_points", 512),
            "reg_fg_thresh": tc.get("reg_fg_thresh", 0.55),
            "cls_fg_thresh": tc.get("cls_fg_thresh", 0.6),
            "cls_bg_thresh": tc.get("cls_bg_thresh", 0.45),
            "cls_bg_thresh_lo": tc.get("cls_bg_thresh_lo", 0.05),
            "fg_ratio": tc.get("fg_ratio", 0.5),
            "roi_per_image": tc.get("roi_per_image", 64),
            "hard_bg_ratio": tc.get("hard_bg_ratio", 0.8),
            "roi_fg_aug_times": tc.get("roi_fg_aug_times", 10),
        })
        return PointRCNNNet(rpn=single, rcnn=self.get_rcnn_net(),
                            mode=self.mode, rpn_head=rpn_head,
                            target_cfg=target_cfg,
                            score_thres=self.score_thres)

    def get_rcnn_net(self):
        rcnn = self.rcnn_cfg
        sa = rcnn.get("SA_config", {
            "npoints": [128, 32, -1],
            "radius": [0.2, 0.4, 100],
            "nsample": [64, 64, 64],
            "mlps": [[128, 128, 128], [128, 128, 256], [256, 256, 512]],
        })
        return RCNNNet(
            num_classes=len(self.classes) + 1,
            sa_npoints=tuple(sa["npoints"]),
            sa_radius=tuple(sa["radius"]),
            sa_nsample=tuple(sa["nsample"]),
            sa_mlps=tuple(map(tuple, sa["mlps"])),
            xyz_up_layer=tuple(rcnn.get("xyz_up_layer", [128, 128])),
            cls_out_ch=tuple(rcnn.get("cls_out_ch", [256, 256])),
            reg_out_ch=tuple(rcnn.get("reg_out_ch", [256, 256])),
            reg_channels=self.rcnn_head_cfg.reg_channels)

    # -------------------------------------------------------- proposal layer

    def proposal_layer(self, rpn_scores, rpn_reg, xyz, training=False):
        """Decode + distance-bucketed rotated NMS for ONE sample.

        Returns (boxes [nms_post, 7], scores [nms_post], valid [nms_post]).
        """
        hc = self.rpn_head_cfg
        boxes = decode_bbox_target(
            xyz, rpn_reg, hc.loc_scope, hc.loc_bin_size, hc.num_head_bin,
            hc.mean_size, get_xz_fine=hc.loc_xz_fine,
            get_y_by_bin=hc.get_y_by_bin, get_ry_fine=hc.get_ry_fine,
            loc_y_scope=hc.loc_y_scope, loc_y_bin_size=hc.loc_y_bin_size)
        boxes = boxes.at[:, 1].add(boxes[:, 3] / 2)  # y at bottom center

        nms_post = hc.nms_post if training else hc.nms_post_val
        nms_thres = hc.nms_thres if training else hc.nms_thres_val
        nms_pre = min(hc.nms_pre, boxes.shape[0])

        dist = boxes[:, 2]
        buckets = [((dist >= 0) & (dist <= 40.0), int(nms_pre * 0.7),
                    int(nms_post * 0.7)),
                   ((dist > 40.0) & (dist <= 80.0),
                    nms_pre - int(nms_pre * 0.7),
                    nms_post - int(nms_post * 0.7))]
        # caps can exceed the candidate count on tiny inputs
        buckets = [(m, p, min(q, p)) for m, p, q in buckets]
        out_b, out_s, out_v = [], [], []
        for mask, pre_n, post_n in buckets:
            sc = jnp.where(mask, rpn_scores, -jnp.inf)
            top_s, top_i = jax.lax.top_k(sc, pre_n)
            bsel = boxes[top_i]
            bev = bsel[:, [0, 2, 5, 4, 6]]  # (x, z, l, w, ry)
            keep = nms_bev(bev, top_s, nms_thres,
                           valid_mask=jnp.isfinite(top_s))
            ksc = jnp.where(keep, top_s, -jnp.inf)
            post_s, post_i = jax.lax.top_k(ksc, post_n)
            out_b.append(bsel[post_i])
            out_s.append(post_s)
            out_v.append(jnp.isfinite(post_s))
        return (jnp.concatenate(out_b, axis=0),
                jnp.concatenate(out_s, axis=0),
                jnp.concatenate(out_v, axis=0))

    # ------------------------------------------------------------- host side

    def filter_objects(self, bbox_objs):
        return [bb for bb in bbox_objs if bb.label_class in self.classes]

    def preprocess(self, data, attr):
        rng = self.rng
        if attr["split"] in ("train", "training"):
            data = self.augmenter.augment(dict(data), attr, seed=rng)
        data["bounding_boxes"] = self.filter_objects(
            data.get("bounding_boxes", []))
        points = np.array(data["point"][..., :3], dtype=np.float32)
        calib = data["calib"]
        points = DataProcessing.world2cam(points, calib["world_cam"])
        new_data = {"point": points, "calib": calib}
        if attr["split"] not in ("test", "testing"):
            new_data["bbox_objs"] = data["bounding_boxes"]
        return new_data

    @staticmethod
    def generate_rpn_training_labels(points, bboxes, bboxes_world,
                                     calib=None):
        """Per-point fg/bg labels (+ ignore ring) and box regression targets
        (reference :243-308)."""
        cls_label = np.zeros((points.shape[0]), dtype=np.int32)
        reg_label = np.zeros((points.shape[0], 7), dtype=np.float32)
        if len(bboxes) == 0:
            return cls_label, reg_label
        pts_idx = points_in_box(
            points.copy(), bboxes_world, camera_frame=True,
            cam_world=DataProcessing.invT(calib["world_cam"]))
        extended = bboxes_world.copy()
        extended[:, 3:6] += 0.4
        extended[:, 2] -= 0.2
        pts_idx_ext = points_in_box(
            points.copy(), extended, camera_frame=True,
            cam_world=DataProcessing.invT(calib["world_cam"]))
        for k in range(bboxes.shape[0]):
            fg = pts_idx[:, k]
            cls_label[fg] = 1
            ignore = np.logical_xor(fg, pts_idx_ext[:, k])
            cls_label[ignore] = -1
            center3d = bboxes[k][0:3].copy()
            center3d[1] -= bboxes[k][3] / 2
            reg_label[fg, 0:3] = center3d - points[fg]
            reg_label[fg, 3] = bboxes[k][3]
            reg_label[fg, 4] = bboxes[k][4]
            reg_label[fg, 5] = bboxes[k][5]
            reg_label[fg, 6] = bboxes[k][6]
        return cls_label, reg_label

    def transform(self, data, attr, rng=None):
        rng = rng or self.rng
        points = data["point"]

        if attr["split"] not in ("test", "testing"):
            if self.npoints < len(points):
                depth = points[:, 2]
                near = np.where(depth < 40.0)[0]
                far = np.where(depth >= 40.0)[0]
                n_near = self.npoints - len(far)
                if n_near > 0 and len(near) >= n_near:
                    choice = np.concatenate(
                        [rng.choice(near, n_near, replace=False), far])
                else:
                    choice = rng.choice(len(points), self.npoints,
                                        replace=False)
                rng.shuffle(choice)
            else:
                choice = np.arange(len(points))
                if self.npoints > len(points):
                    extra = rng.choice(choice, self.npoints - len(points))
                    choice = np.concatenate([choice, extra])
                rng.shuffle(choice)
            points = points[choice, :]
        else:
            if self.npoints <= len(points):
                choice = rng.choice(len(points), self.npoints, replace=False)
            else:
                choice = np.concatenate([
                    np.arange(len(points)),
                    rng.choice(len(points),
                               self.npoints - len(points))
                ])
            points = points[choice, :]

        t_data = {"point": points.astype(np.float32),
                  "calib": data["calib"]}
        if attr["split"] not in ("test", "testing"):
            bbox_objs = data.get("bbox_objs", [])
            bboxes = np.stack([bb.to_camera() for bb in bbox_objs]) \
                if bbox_objs else np.zeros((0, 7), np.float32)
            bboxes_world = np.stack([bb.to_xyzwhlr() for bb in bbox_objs]) \
                if bbox_objs else np.zeros((0, 7), np.float32)
            if self.mode == "RPN":
                labels, reg = self.generate_rpn_training_labels(
                    points, bboxes, bboxes_world, data["calib"])
                t_data["labels"] = labels.astype(np.int32)
                t_data["bboxes"] = reg.astype(np.float32)
            else:
                g = self.max_gt
                padded = np.zeros((g, 7), np.float32)
                cnt = min(len(bboxes), g)
                padded[:cnt] = bboxes[:cnt]
                t_data["bboxes"] = padded
                t_data["bbox_count"] = np.int32(cnt)
                t_data["labels"] = np.zeros((g,), np.int32)
            t_data["bbox_objs"] = bbox_objs
        return t_data

    # ----------------------------------------------------------- device side

    def rpn_loss(self, results, inputs):
        """Focal per-point cls + bin-based reg over fg points
        (reference RPN.loss :695-742)."""
        rpn_cls = results["cls"].reshape(-1)
        rpn_reg = results["reg"].reshape(-1,
                                         self.rpn_head_cfg.reg_channels)
        cls_label = inputs["labels"].reshape(-1)
        reg_label = inputs["bboxes"].reshape(-1, 7)

        fg = cls_label > 0
        target = (cls_label > 0).astype(jnp.int32)
        pos = (cls_label > 0).astype(jnp.float32)
        neg = (cls_label == 0).astype(jnp.float32)
        cls_w = (pos + neg) / jnp.maximum(pos.sum(), 1.0)
        loss_cls = self.loss_cls(rpn_cls[:, None],
                                 target[:, None].astype(jnp.float32),
                                 weight=cls_w[:, None], avg_factor=1.0)

        hc = self.rpn_head_cfg
        loss_loc, loss_angle, loss_size = get_reg_loss(
            rpn_reg, reg_label, hc.loc_scope, hc.loc_bin_size,
            hc.num_head_bin, hc.mean_size, fg.astype(jnp.float32),
            get_xz_fine=hc.loc_xz_fine, get_y_by_bin=False,
            get_ry_fine=False)
        loss_reg = loss_loc + loss_angle + 3 * loss_size
        return {
            "cls": loss_cls * self.loss_weight[0],
            "reg": loss_reg * self.loss_weight[1],
        }

    def rcnn_loss(self, results, inputs):
        """BCE roi classification + bin-based refinement regression
        (reference RCNN.loss :913-963)."""
        hc = self.rcnn_head_cfg
        cls = results["cls"].reshape(-1)
        reg = results["reg"].reshape(-1, hc.reg_channels)
        label = results["cls_label"].reshape(-1)
        reg_valid = results["reg_valid_mask"].reshape(-1)
        gt_ct = results["gt_of_rois"].reshape(-1, 7)

        valid = (label >= 0).astype(jnp.float32)
        p = jax.nn.sigmoid(cls)
        bce = -(label * jnp.log(p + 1e-7) +
                (1 - label) * jnp.log(1 - p + 1e-7))
        loss_cls = jnp.sum(bce * valid) / jnp.maximum(valid.sum(), 1.0)

        fg = reg_valid.astype(jnp.float32)
        loss_loc, loss_angle, loss_size = get_reg_loss(
            reg, gt_ct, hc.loc_scope, hc.loc_bin_size, hc.num_head_bin,
            hc.mean_size, fg, get_xz_fine=True,
            get_y_by_bin=hc.get_y_by_bin, loc_y_scope=hc.loc_y_scope,
            loc_y_bin_size=hc.loc_y_bin_size, get_ry_fine=True)
        loss_reg = loss_loc + loss_angle + 3 * loss_size
        return {"cls": loss_cls, "reg": loss_reg}

    def get_loss(self, results, inputs):
        if self.mode == "RPN":
            return self.rpn_loss(results, inputs)
        return self.rcnn_loss(results, inputs)

    def freeze_rpn_mask(self, params):
        """optax mask: True = trainable (the reference freezes the RPN during
        RCNN-stage training, point_rcnn.py:162-165)."""
        import jax
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", "") == "rpn" for p in path), params)

    def inference_end(self, results, inputs):
        """Convert network outputs to BEVBox3D lists.

        RPN mode returns empty lists (reference :375-377); RCNN mode decodes
        the refined boxes around each roi and NMS-filters them.
        """
        if self.mode == "RPN":
            b = results["cls"].shape[0] if isinstance(results, dict) else 1
            return [[] for _ in range(b)]

        hc = self.rcnn_head_cfg

        def refine_one(rois, rcnn_cls, rcnn_reg, roi_valid):
            boxes = decode_bbox_target(
                rois, rcnn_reg, hc.loc_scope, hc.loc_bin_size,
                hc.num_head_bin, hc.mean_size, get_xz_fine=True,
                get_y_by_bin=hc.get_y_by_bin, loc_y_scope=hc.loc_y_scope,
                loc_y_bin_size=hc.loc_y_bin_size, get_ry_fine=True)
            scores = jax.nn.sigmoid(rcnn_cls[:, 0])
            m = roi_valid & (scores > self.score_thres)
            bev = boxes[:, [0, 2, 5, 4, 6]]
            keep = nms_bev(bev, jnp.where(m, scores, -jnp.inf),
                           hc.nms_thres, valid_mask=m)
            return boxes, scores, keep & m

        boxes_b, scores_b, valid_b = jax.jit(jax.vmap(refine_one))(
            jnp.asarray(results["rois"]), jnp.asarray(results["cls"]),
            jnp.asarray(results["reg"]), jnp.asarray(results["valid"]))
        boxes_b = np.asarray(boxes_b)
        scores_b = np.asarray(scores_b)
        valid_b = np.asarray(valid_b)
        b = boxes_b.shape[0]
        calibs = inputs.get("calib")
        if isinstance(calibs, dict):
            keys = list(calibs.keys())
            calibs = [{k: np.asarray(calibs[k][i]) for k in keys}
                      for i in range(b)]
        if calibs is None:
            calibs = [None] * b
        out = []
        for i in range(b):
            out.append([])
            calib = calibs[i]
            world_cam = calib.get("world_cam") if calib else None
            cam_img = calib.get("cam_img") if calib else None
            for box, score, ok in zip(boxes_b[i], scores_b[i], valid_b[i]):
                if not ok or score < self.score_thres:
                    continue
                pos = box[:3]
                dim = box[[4, 3, 5]]
                pos = DataProcessing.cam2world(pos.reshape((1, -1)),
                                               world_cam).flatten() \
                    if world_cam is not None else pos
                pos = pos + [0, 0, dim[1] / 2]
                yaw = box[-1]
                name = self.lbl2name.get(0, "ignore")
                out[-1].append(
                    BEVBox3D(pos, dim, yaw, name, float(score), world_cam,
                             cam_img))
        return out

    def get_optimizer(self, cfg_pipeline):
        import optax
        opt = dict(cfg_pipeline.optimizer or {})
        lr = opt.get("lr", 0.002)
        wd = opt.get("weight_decay", 0.001)
        betas = opt.get("betas", [0.9, 0.99])
        tx = optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1],
                         weight_decay=wd)
        if self.mode == "RCNN":
            # freeze the (pretrained) RPN during stage-2 training,
            # reference point_rcnn.py:162-165
            tx = optax.masked(tx, self.freeze_rpn_mask)
        return tx, None


MODEL._register_module(PointRCNN)
