"""PointPillars 3D object detection, TPU-native.

Rebuild of /root/reference/ml3d/torch/models/point_pillars.py:43-1025 (arch
from Lang et al., "PointPillars", itself via MMDetection3D). Same network —
pillar voxelization, PillarFeatureNet, BEV scatter, SECOND backbone,
SECONDFPN neck, Anchor3DHead with focal/smooth-L1/direction losses — fully
re-designed for XLA:

* voxelization/pillarization is the on-device sort-based ops.voxelize with
  static caps (max_voxels, max_points_per_voxel) instead of the external
  CUDA `voxelize` op; empty slots are masked, not absent,
* the whole forward (voxelize -> PFN -> scatter -> SECOND -> FPN -> head)
  is one jittable function in NHWC layout,
* anchor assignment (reference assign_bboxes, :843-941) is rewritten
  mask-vectorized over padded gt boxes — no index compaction — producing
  per-anchor target/positive/negative masks with identical matching rules
  (axis-aligned BEV IoU, low-quality gt rescue, per-class thresholds),
* decode+NMS (get_bboxes, :945-1025) runs on device over a fixed nms_pre
  candidate set with masked rotated NMS.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..datasets.augment import ObjdetAugmentation
from ..datasets.utils import BEVBox3D
from ..modules.losses import CrossEntropyLoss, FocalLoss, SmoothL1Loss
from ..ops.nms import nms_bev
from ..ops.voxelize import voxelize
from ..utils import MODEL
from .base_model_objdet import ObjdetBaseModel
from .objdet_helper import (Anchor3DRangeGenerator, BBoxCoder, bbox_overlaps,
                            box3d_to_bev, box3d_to_bev2d, limit_period,
                            xywhr_to_xyxyr)


class PFNLayer(nn.Module):
    """Pillar Feature Net layer: linear+BN+relu then max over the points of
    each pillar (reference point_pillars.py:385-455).

    Two execution modes over the SAME parameters:

    * voxel-major (``x [V, P, C]`` + ``mask``): the reference's dense
      layout.
    * point-major (``x [N, C]`` + ``seg_ids``): the fast TPU path — the
      linear runs over the N raw points and the pillar pooling is a
      segment-max, so the [V, P, C] gather (measured 8.5 ms/scan of a
      19 ms KITTI forward — the single largest cost) never happens and
      the matmul shrinks from V*P to N rows.

    Reference semantics preserved in both modes (point_pillars.py:440-441):
    the reference maxes over ALL rows including zero pads, each worth
    relu(BN(linear(0))) = relu(BN(0)) — zoo checkpoints bake this in, so
    the point-major mode explicitly folds that pad value into every pillar
    that has spare capacity.
    """
    out_channels: int
    last_layer: bool = True
    # dtype of the segment-max pooling / pooled output (the canvas): bf16
    # halves the HBM traffic of the biggest intermediate on the canvas-
    # major path. Dense+BN always run float32.
    pool_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask=None, training=False, *, seg_ids=None,
                 num_segments=None, seg_counts=None, max_pts=None):
        units = self.out_channels if self.last_layer else \
            self.out_channels // 2

        if seg_ids is not None:  # ---- point-major
            n = x.shape[0]
            # one extra zero row computes the pad value relu(BN(0)) with
            # the same module invocation (Dense has no bias)
            xa = jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)])
            y = nn.Dense(units, use_bias=False, name="linear")(xa)
            y = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3, name="norm")(y)
            y = nn.relu(y).astype(jnp.dtype(self.pool_dtype))
            pad_val = y[-1]  # [units]
            y = y[:-1]
            vmax = jax.ops.segment_max(y, seg_ids,
                                       num_segments=num_segments + 1,
                                       indices_are_sorted=False)
            vmax = vmax[:num_segments]  # [V, units]
            has_pad = (seg_counts < max_pts)[:, None]
            vmax = jnp.maximum(vmax, jnp.where(has_pad, pad_val[None, :],
                                               -jnp.inf))
            empty = seg_counts <= 0
            vmax = jnp.where(empty[:, None],
                             jnp.asarray(0.0, vmax.dtype), vmax)
            if self.last_layer:
                return vmax
            rep = vmax[jnp.clip(seg_ids, 0, num_segments - 1)]
            return jnp.concatenate([y, rep], axis=1)

        # ---- voxel-major (reference layout)
        x = nn.Dense(units, use_bias=False, name="linear")(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                         epsilon=1e-3, name="norm")(x)
        x = nn.relu(x)
        x_max = jnp.max(x, axis=1, keepdims=True)  # [V, 1, units]
        x_max = jnp.where(
            jnp.any(mask, axis=1)[:, None, None], x_max, 0.0)
        if self.last_layer:
            return x_max
        rep = jnp.broadcast_to(x_max, x.shape[:2] + (units,))
        return jnp.concatenate([x, rep], axis=2)


class PillarFeatureNet(nn.Module):
    """Decorate pillar points (cluster + center offsets) and run PFN layers
    (reference :456-556). Voxel-major ([V, P, 4] gathered pillars) and
    point-major ([N, 4] raw points + per-point voxel ids) modes share one
    parameter tree — see PFNLayer."""
    feat_channels: tuple = (64,)
    voxel_size: tuple = (0.16, 0.16, 4)
    point_cloud_range: tuple = (0, -40.0, -3, 70.0, 40.0, 1)
    max_pts: int = 32  # max points per pillar (pad-value fold threshold)
    pool_dtype: str = "float32"  # see PFNLayer

    @nn.compact
    def __call__(self, features, counts, coors=None, mask=None,
                 training=False, *, point_to_voxel=None, num_voxels=None):
        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x_offset = vx / 2 + self.point_cloud_range[0]
        y_offset = vy / 2 + self.point_cloud_range[1]

        if point_to_voxel is not None:  # ---- point-major
            # features [N, 4] raw points; counts [V] (or None: computed
            # here, fused with the coordinate sums — the canvas-major
            # caller has no separate voxelizer to provide them);
            # point_to_voxel [N] (sentinel num_voxels for dropped points)
            seg = point_to_voxel
            valid = seg < num_voxels
            xyz = features[:, :3]
            if counts is None:
                one_xyz = jnp.concatenate(
                    [jnp.ones((xyz.shape[0], 1), xyz.dtype), xyz], axis=-1)
                s4 = jax.ops.segment_sum(
                    jnp.where(valid[:, None], one_xyz, 0.0), seg,
                    num_segments=num_voxels + 1)[:num_voxels]
                counts = s4[:, 0].astype(jnp.int32)
                sums = s4[:, 1:]
            else:
                sums = jax.ops.segment_sum(
                    jnp.where(valid[:, None], xyz, 0.0), seg,
                    num_segments=num_voxels + 1)[:num_voxels]
            means = sums / jnp.maximum(counts, 1).astype(
                features.dtype)[:, None]  # [V, 3]
            f_cluster = xyz - means[jnp.clip(seg, 0, num_voxels - 1)]
            # pillar center from the point's own quantized cell — no gather
            x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
            fx = features[:, 0:1] - (
                jnp.floor((features[:, 0:1] - x0) / vx) * vx + x_offset)
            fy = features[:, 1:2] - (
                jnp.floor((features[:, 1:2] - y0) / vy) * vy + y_offset)
            feats = jnp.concatenate([features, f_cluster, fx, fy], axis=-1)
            feats = jnp.where(valid[:, None], feats, 0.0)
            seg_s = jnp.where(valid, seg, num_voxels)
            for i, ch in enumerate(self.feat_channels):
                feats = PFNLayer(
                    ch, last_layer=(i == len(self.feat_channels) - 1),
                    pool_dtype=self.pool_dtype,
                    name=f"pfn_{i}")(
                        feats, training=training, seg_ids=seg_s,
                        num_segments=num_voxels, seg_counts=counts,
                        max_pts=self.max_pts)
            return feats  # [V, C]

        # ---- voxel-major (reference layout)
        n = jnp.maximum(counts, 1).astype(features.dtype)[:, None, None]
        points_mean = jnp.sum(
            jnp.where(mask[..., None], features[:, :, :3], 0.0),
            axis=1, keepdims=True) / n
        f_cluster = features[:, :, :3] - points_mean

        fx = features[:, :, 0:1] - (
            coors[:, 0].astype(features.dtype)[:, None, None] * vx +
            x_offset)
        fy = features[:, :, 1:2] - (
            coors[:, 1].astype(features.dtype)[:, None, None] * vy +
            y_offset)

        feats = jnp.concatenate([features, f_cluster, fx, fy], axis=-1)
        feats = jnp.where(mask[..., None], feats, 0.0)

        for i, ch in enumerate(self.feat_channels):
            feats = PFNLayer(ch, last_layer=(i == len(self.feat_channels)
                                             - 1), name=f"pfn_{i}")(
                feats, mask, training=training)
        return feats[:, 0, :]  # [V, C]


class SECOND(nn.Module):
    """Multi-stage BEV conv backbone (reference :619-684). NHWC layout.

    compute_dtype=bfloat16 runs the convs on the MXU at double rate (the
    TPU-idiomatic inference setting); BatchNorm stays in float32.
    """
    in_channels: int = 64
    out_channels: tuple = (64, 128, 256)
    layer_nums: tuple = (3, 5, 5)
    layer_strides: tuple = (2, 2, 2)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, training=False):
        cdt = jnp.dtype(self.compute_dtype)
        outs = []
        for i, num in enumerate(self.layer_nums):
            x = nn.Conv(self.out_channels[i], (3, 3),
                        strides=self.layer_strides[i], padding=1,
                        use_bias=False, dtype=cdt,
                        name=f"block{i}_conv0")(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.99, epsilon=1e-3,
                             name=f"block{i}_bn0")(x)
            x = nn.relu(x)
            for j in range(num):
                x = nn.Conv(self.out_channels[i], (3, 3), padding=1,
                            use_bias=False, dtype=cdt,
                            name=f"block{i}_conv{j+1}")(x)
                x = nn.BatchNorm(use_running_average=not training,
                                 momentum=0.99, epsilon=1e-3,
                                 name=f"block{i}_bn{j+1}")(x)
                x = nn.relu(x)
            outs.append(x)
        return tuple(outs)


class SECONDFPN(nn.Module):
    """Upsample + concat neck (reference :686-757)."""
    in_channels: tuple = (64, 128, 256)
    out_channels: tuple = (128, 128, 128)
    upsample_strides: tuple = (1, 2, 4)
    use_conv_for_no_stride: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, xs, training=False):
        cdt = jnp.dtype(self.compute_dtype)
        ups = []
        for i, (x, stride) in enumerate(zip(xs, self.upsample_strides)):
            if stride > 1 or (stride == 1 and
                              not self.use_conv_for_no_stride):
                x = nn.ConvTranspose(self.out_channels[i], (stride, stride),
                                     strides=(stride, stride),
                                     use_bias=False, dtype=cdt,
                                     name=f"deblock{i}_up")(x)
            else:
                s = int(np.round(1 / stride))
                x = nn.Conv(self.out_channels[i], (s, s), strides=s,
                            use_bias=False, dtype=cdt,
                            name=f"deblock{i}_conv")(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                             epsilon=1e-3, name=f"deblock{i}_bn")(x)
            x = nn.relu(x)
            ups.append(x)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]


class PointPillarsNet(nn.Module):
    """Full network over a padded batch.

    Inputs dict: point [B, P, 4], point_count [B].
    Returns (cls [B,H,W,A*C], reg [B,H,W,A*7], dir [B,H,W,A*2]).
    """
    classes: tuple
    point_cloud_range: tuple
    voxel_size: tuple
    max_num_points: int
    max_voxels: int
    feat_channels: tuple
    output_shape: tuple  # (ny, nx)
    backbone: dict
    neck: dict
    head: dict
    # bf16 BEV stack: the idiomatic TPU inference setting (2x MXU rate);
    # BatchNorm and the decode path stay float32. float32 for bit-parity
    # work (the conversion tests pin it).
    compute_dtype: str = "bfloat16"
    # "canvas" (default): canvas-major pillarization — the canvas CELL id
    # is the segment id and the PFN's segment-max writes the BEV canvas
    # directly, so neither the [N] voxel-key argsort (2.3 ms/scan) nor
    # the compact-pillar BEV scatter (1.9 ms/scan) exists; measured
    # 2.6 ms/scan for the whole pillarize+PFN+canvas block vs 4.9.
    # "compact": sort-based voxelize -> compact pillars -> scatter-light
    # canvas (reference-exact per-pillar point cap + max_voxels cap).
    # Semantic deltas of "canvas": no max_points_per_voxel cap (stats see
    # ALL points of a pillar; the reference cap only bounds its dense
    # [V, P] buffer) and no max_voxels cap (every occupied cell is real).
    pillar_mode: str = "canvas"

    @nn.compact
    def __call__(self, inputs, training=False):
        pc_range = tuple(self.point_cloud_range)
        vsize = tuple(self.voxel_size)
        ny, nx = self.output_shape

        points = inputs["point"]  # [B, P, 4]
        counts = inputs["point_count"]  # [B]
        b, p, _ = points.shape
        pmask = jnp.arange(p)[None, :] < counts[:, None]

        pfn = PillarFeatureNet(feat_channels=tuple(self.feat_channels),
                               voxel_size=vsize,
                               point_cloud_range=pc_range,
                               max_pts=self.max_num_points,
                               pool_dtype=self.compute_dtype,
                               name="voxel_encoder")

        if self.pillar_mode == "canvas":
            # Canvas-major: the canvas cell id IS the segment id. The
            # PFN's segment-max writes the [B*ny*nx, C] canvas directly —
            # no voxelizer, no compact pillar list, no BEV scatter.
            nc = ny * nx
            rmin = jnp.asarray(pc_range[:3], points.dtype)
            rmax = jnp.asarray(pc_range[3:], points.dtype)
            cx = jnp.floor(
                (points[..., 0] - pc_range[0]) / vsize[0]).astype(jnp.int32)
            cy = jnp.floor(
                (points[..., 1] - pc_range[1]) / vsize[1]).astype(jnp.int32)
            valid = (pmask & (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny) &
                     jnp.all(points[..., :3] >= rmin, axis=-1) &
                     jnp.all(points[..., :3] < rmax, axis=-1))
            cell = cy * nx + cx
            seg = jnp.where(
                valid, cell + jnp.arange(b, dtype=jnp.int32)[:, None] * nc,
                b * nc)
            canvas = pfn(points.reshape(b * p, -1), None,
                         training=training,
                         point_to_voxel=seg.reshape(b * p),
                         num_voxels=b * nc)  # [B*ny*nx, C]
            canvas = canvas.reshape(b, ny, nx, canvas.shape[-1])
        else:
            # Compact pillars: sort-based voxelize (reference-exact
            # max_voxels / max_points_per_voxel caps), point-major PFN
            # over per-batch-offset voxel slots, scatter-light canvas.
            def voxelize_one(pts, mask):
                vd = voxelize(pts[:, :3], vsize, pc_range[:3], pc_range[3:],
                              self.max_voxels, self.max_num_points,
                              points_mask=mask)
                return (vd.point_to_voxel, vd.num_points_per_voxel,
                        vd.coords, vd.voxel_mask)

            p2v, counts_v, coors, vmask = jax.vmap(voxelize_one)(points,
                                                                 pmask)
            mv = self.max_voxels
            bv = b * mv
            seg = jnp.where(p2v < mv, p2v + jnp.arange(b)[:, None] * mv, bv)
            pillar_feats = pfn(
                points.reshape(b * p, -1),
                counts_v.reshape(bv),
                training=training,
                point_to_voxel=seg.reshape(b * p),
                num_voxels=bv)  # [B*V, C]
            c = pillar_feats.shape[-1]
            pillar_feats = pillar_feats.reshape(b, mv, c)

            # Voxelize emits slots in ascending linearized-key order and
            # the pillar key IS the canvas cell (single z bin), so each
            # cell fetches its pillar with one slot-index scatter + one
            # row gather (ops/bev.py) instead of a feature-row scatter.
            from ..ops.bev import bev_scatter_sorted
            cells = jnp.where(
                vmask, coors[..., 1] * nx + coors[..., 0],
                ny * nx + jnp.arange(mv, dtype=jnp.int32)[None, :])
            canvas = bev_scatter_sorted(pillar_feats,
                                        cells.astype(jnp.int32), ny * nx)
            canvas = canvas.reshape(b, ny, nx, c)

        xs = SECOND(**self.backbone, compute_dtype=self.compute_dtype,
                    name="backbone")(canvas, training=training)
        feat = SECONDFPN(**self.neck, compute_dtype=self.compute_dtype,
                         name="neck")(xs, training=training)

        num_classes = len(self.classes)
        head_cfg = dict(self.head)
        sizes = head_cfg.get("sizes", [[1.6, 3.9, 1.56]])
        rotations = head_cfg.get("rotations", [0, 1.5707963])
        num_anchors = len(np.asarray(sizes).reshape(-1, 3)) * len(rotations)
        cls_score = nn.Conv(num_anchors * num_classes, (1, 1),
                            name="conv_cls")(feat)
        bbox_pred = nn.Conv(num_anchors * 7, (1, 1), name="conv_reg")(feat)
        dir_pred = nn.Conv(num_anchors * 2, (1, 1),
                           name="conv_dir_cls")(feat)
        return cls_score, bbox_pred, dir_pred


class PointPillars(ObjdetBaseModel):
    """PointPillars model: host pipeline + flax net + losses + decoding."""

    def __init__(self,
                 name="PointPillars",
                 point_cloud_range=[0, -40.0, -3, 70.0, 40.0, 1],
                 classes=['car'],
                 voxelize={},
                 voxel_encoder={},
                 scatter={},
                 backbone={},
                 neck={},
                 head={},
                 loss={},
                 max_points=32768,
                 augment=None,
                 **kwargs):
        super().__init__(name=name,
                         point_cloud_range=point_cloud_range,
                         classes=classes,
                         voxelize=voxelize,
                         voxel_encoder=voxel_encoder,
                         scatter=scatter,
                         backbone=backbone,
                         neck=neck,
                         head=head,
                         loss=loss,
                         max_points=max_points,
                         augment=augment,
                         **kwargs)
        self.point_cloud_range = point_cloud_range
        self.classes = classes
        self.name2lbl = {n: i for i, n in enumerate(classes)}
        self.lbl2name = {i: n for i, n in enumerate(classes)}
        self.augmenter = ObjdetAugmentation(self.cfg.augment, seed=self.rng)

        voxel_size = voxelize.get("voxel_size", [0.16, 0.16, 4])
        self.voxel_size = voxel_size
        self.max_num_points = voxelize.get("max_num_points", 32)
        mv = voxelize.get("max_voxels", [16000, 40000])
        self.max_voxels = mv if isinstance(mv, (list, tuple)) else [mv, mv]
        self.output_shape = tuple(scatter.get("output_shape", [496, 432]))

        head_cfg = dict(head)
        self.nms_pre = head_cfg.get("nms_pre", 100)
        self.score_thr = head_cfg.get("score_thr", 0.1)
        self.dir_offset = head_cfg.get("dir_offset", 0)
        iou_thr = head_cfg.get("iou_thr", [[0.35, 0.5]])
        if len(iou_thr) != len(classes):
            assert len(iou_thr) == 1
            iou_thr = iou_thr * len(classes)
        self.iou_thr = iou_thr
        self.anchor_generator = Anchor3DRangeGenerator(
            ranges=head_cfg.get("ranges", [list(point_cloud_range)]),
            sizes=head_cfg.get("sizes", [[1.6, 3.9, 1.56]]),
            rotations=head_cfg.get("rotations", [0, 1.5707963]))
        self.bbox_coder = BBoxCoder()

        self.loss_cls = FocalLoss(**loss.get("focal", {}))
        self.loss_bbox = SmoothL1Loss(**loss.get("smooth_l1", {}))
        self.loss_dir = CrossEntropyLoss(**loss.get("cross_entropy", {}))

        self.max_gt = int(kwargs.get("max_gt", 64))

    def get_net(self, training=True):
        cfg = self.cfg
        return PointPillarsNet(
            classes=tuple(self.classes),
            point_cloud_range=tuple(self.point_cloud_range),
            voxel_size=tuple(self.voxel_size),
            max_num_points=self.max_num_points,
            max_voxels=self.max_voxels[0 if training else 1],
            feat_channels=tuple(
                cfg.voxel_encoder.get("feat_channels", [64])),
            output_shape=self.output_shape,
            backbone={k: tuple(v) if isinstance(v, list) else v
                      for k, v in dict(cfg.backbone or {}).items()},
            neck={k: tuple(v) if isinstance(v, list) else v
                  for k, v in dict(cfg.neck or {}).items()},
            head=dict(cfg.head or {}),
            compute_dtype=cfg.get("compute_dtype", "bfloat16"),
            pillar_mode=cfg.get("pillar_mode", "canvas"))

    def get_eval_net(self):
        """Evaluation net: reference-exact pillarization semantics.

        The default 'canvas' mode (fast train/bench path) drops the
        reference's max_points_per_voxel / max_voxels cap semantics
        (reference /root/reference/ml3d/torch/models/point_pillars.py:
        299-382) and pools at bf16 — fine for training, but reported mAP
        and converted-zoo-checkpoint evaluation must ride the exact
        'compact' path (same principle as RandLANet.get_eval_net). Both
        nets share one parameter tree. ``eval_pillar_mode``/
        ``eval_compute_dtype`` opt out explicitly (with a warning).
        """
        cfg = self.cfg
        mode = cfg.get("eval_pillar_mode", None) or "compact"
        dtype = cfg.get("eval_compute_dtype", None) or "float32"
        if mode != "compact":
            import logging
            logging.getLogger(__name__).warning(
                "PointPillars evaluation uses the APPROXIMATE '%s' "
                "pillarization (eval_pillar_mode override); reported mAP "
                "does not ride the reference cap semantics.", mode)
        return PointPillarsNet(
            classes=tuple(self.classes),
            point_cloud_range=tuple(self.point_cloud_range),
            voxel_size=tuple(self.voxel_size),
            max_num_points=self.max_num_points,
            max_voxels=self.max_voxels[1],  # the reference's EVAL cap
            feat_channels=tuple(
                cfg.voxel_encoder.get("feat_channels", [64])),
            output_shape=self.output_shape,
            backbone={k: tuple(v) if isinstance(v, list) else v
                      for k, v in dict(cfg.backbone or {}).items()},
            neck={k: tuple(v) if isinstance(v, list) else v
                  for k, v in dict(cfg.neck or {}).items()},
            head=dict(cfg.head or {}),
            compute_dtype=dtype,
            pillar_mode=mode)

    # ------------------------------------------------------------- host side

    def preprocess(self, data, attr):
        """Range-filter + augment (reference :207-267)."""
        rng = self.rng
        points = np.array(data["point"][:, 0:4], dtype=np.float32)
        min_val = np.array(self.point_cloud_range[:3])
        max_val = np.array(self.point_cloud_range[3:])
        points = points[np.all(
            np.logical_and(points[:, :3] >= min_val, points[:, :3] < max_val),
            axis=-1)]
        data = dict(data)
        data["point"] = points

        if attr["split"] not in ("test", "testing", "val", "validation"):
            data = self.augmenter.augment(data, attr, seed=rng)

        new_data = {"point": data["point"], "calib": data.get("calib")}
        if attr["split"] not in ("test", "testing"):
            new_data["bbox_objs"] = data.get("bounding_boxes", [])
        return new_data

    def transform(self, data, attr):
        """Pad to fixed shapes: point [max_points, 4] (+count), gt boxes
        [max_gt, 7] (+labels, +count)."""
        cfg = self.cfg
        points = np.asarray(data["point"], np.float32)
        p = int(cfg.max_points)
        count = min(len(points), p)
        out_pts = np.zeros((p, 4), np.float32)
        out_pts[:count] = points[:count]

        t_data = {
            "point": out_pts,
            "point_count": np.int32(count),
            "calib": data.get("calib"),
        }
        if attr["split"] not in ("test", "testing"):
            bbox_objs = data.get("bbox_objs", [])
            g = self.max_gt
            boxes = np.zeros((g, 7), np.float32)
            labels = np.full((g,), len(self.classes), np.int32)
            gcount = min(len(bbox_objs), g)
            for i in range(gcount):
                boxes[i] = bbox_objs[i].to_xyzwhlr()
                labels[i] = self.name2lbl.get(bbox_objs[i].label_class,
                                              len(self.classes))
            t_data["bboxes"] = boxes
            t_data["labels"] = labels
            t_data["bbox_count"] = np.int32(gcount)
            t_data["bbox_objs"] = bbox_objs
        return t_data

    # ----------------------------------------------------------- device side

    def _featmap_size(self):
        """Head feature map = canvas / (first backbone stride / first neck
        upsample stride) — (248, 216) for the KITTI config."""
        ny, nx = self.output_shape
        backbone = dict(self.cfg.backbone or {})
        neck = dict(self.cfg.neck or {})
        stride0 = backbone.get("layer_strides", [2, 2, 2])[0]
        up0 = neck.get("upsample_strides", [1, 2, 4])[0]
        scale = max(stride0 // up0, 1)
        return (ny // scale, nx // scale)

    def _anchors(self):
        """[H, W, S, R, 7] numpy anchor constants."""
        return self.anchor_generator.grid_anchors(self._featmap_size())

    def assign_bboxes(self, gt_bboxes, gt_labels, gt_counts):
        """Mask-vectorized anchor assignment over a padded batch.

        Args:
            gt_bboxes: [B, G, 7], gt_labels: [B, G], gt_counts: [B].

        Returns dict with per-anchor (flattened [B*H*W*S*R]) arrays:
            target_deltas [T, 7], target_labels [T] (num_classes =
            background), pos_mask [T], neg_mask [T], dir_targets [T].
        """
        anchors = jnp.asarray(self._anchors())  # [H, W, S, R, 7]
        h, w, s, r, _ = anchors.shape
        num_classes = len(self.classes)
        assert s == num_classes or num_classes == 1

        anchors_flat_bev = {}
        for j in range(s):
            aj = anchors[:, :, j].reshape(-1, 7)  # [H*W*R, 7]
            anchors_flat_bev[j] = (aj, box3d_to_bev2d(aj))

        def per_sample(bboxes, labels, count):
            gmask = jnp.arange(bboxes.shape[0]) < count
            gt_bev = box3d_to_bev2d(bboxes)
            pos_list, lbl_list, delta_list, neg_list, dir_list = \
                [], [], [], [], []
            for j in range(s):
                aj, aj_bev = anchors_flat_bev[j]
                neg_th, pos_th = self.iou_thr[j]
                overlaps = bbox_overlaps(gt_bev, aj_bev)  # [G, A]
                overlaps = jnp.where(gmask[:, None], overlaps, -1.0)
                max_o = jnp.max(overlaps, axis=0)  # [A]
                arg_o = jnp.argmax(overlaps, axis=0)
                gt_max = jnp.max(overlaps, axis=1)  # [G]
                gt_arg = jnp.argmax(overlaps, axis=1)

                pos = max_o >= pos_th
                neg = (max_o >= 0) & (max_o < neg_th)

                # low-quality rescue: anchors tying each gt's best overlap
                valid_k = gmask & (gt_max >= neg_th)
                tie = (overlaps == gt_max[:, None]) & valid_k[:, None]
                pos = pos | jnp.any(tie, axis=0)
                # argmax override: anchor gt_arg[k] -> k (last k wins)
                a_target = jnp.where(valid_k, gt_arg, aj.shape[0])
                lq_k = jax.ops.segment_max(
                    jnp.where(valid_k, jnp.arange(bboxes.shape[0]), -1),
                    a_target, num_segments=aj.shape[0] + 1)[:-1]
                arg = jnp.where(lq_k >= 0, lq_k, arg_o)

                matched = bboxes[arg]  # [A, 7]
                deltas = BBoxCoder.encode(aj, matched)
                lbls = jnp.where(pos, labels[arg], num_classes)
                dirs = jnp.floor(
                    limit_period(matched[:, -1], 0, 2 * np.pi) /
                    np.pi).astype(jnp.int32) % 2

                # reshape [H*W*R] blocks into [H, W, R]
                pos_list.append(pos.reshape(h, w, r))
                neg_list.append(neg.reshape(h, w, r))
                lbl_list.append(lbls.reshape(h, w, r))
                delta_list.append(deltas.reshape(h, w, r, 7))
                dir_list.append(dirs.reshape(h, w, r))

            # stack class axis -> [H, W, S, R, ...] matching channel layout
            pos = jnp.stack(pos_list, axis=2).reshape(-1)
            neg = jnp.stack(neg_list, axis=2).reshape(-1)
            lbls = jnp.stack(lbl_list, axis=2).reshape(-1)
            deltas = jnp.stack(delta_list, axis=2).reshape(-1, 7)
            dirs = jnp.stack(dir_list, axis=2).reshape(-1)
            return pos, neg, lbls, deltas, dirs

        pos, neg, lbls, deltas, dirs = jax.vmap(per_sample)(
            gt_bboxes, gt_labels, gt_counts)
        return {
            "pos_mask": pos.reshape(-1),
            "neg_mask": neg.reshape(-1),
            "target_labels": lbls.reshape(-1),
            "target_deltas": deltas.reshape(-1, 7),
            "dir_targets": dirs.reshape(-1),
        }

    def get_loss(self, results, inputs):
        """Focal + smooth-L1 (sin-difference) + direction CE, masked
        (reference get_loss :140-206)."""
        cls_scores, bbox_preds, dir_preds = results
        num_classes = len(self.classes)

        t = self.assign_bboxes(inputs["bboxes"], inputs["labels"],
                               inputs["bbox_count"])
        pos = t["pos_mask"]
        neg = t["neg_mask"]
        labels = t["target_labels"]

        # drop positives whose matched gt has an invalid label
        valid_lbl = (labels >= 0) & (labels < num_classes)
        pos_v = pos & valid_lbl
        avg = jnp.maximum(jnp.sum(pos), 1.0)

        scores = cls_scores.reshape(-1, num_classes)
        cls_w = (pos | neg).astype(jnp.float32)
        loss_cls = self.loss_cls(scores,
                                 jnp.where(pos, labels, num_classes),
                                 weight=cls_w, avg_factor=avg)

        preds = bbox_preds.reshape(-1, 7)
        targets = t["target_deltas"]
        # sin-difference angle encoding (reference :187-193)
        r0 = jnp.sin(preds[:, -1:]) * jnp.cos(targets[:, -1:])
        r1 = jnp.cos(preds[:, -1:]) * jnp.sin(targets[:, -1:])
        preds_s = jnp.concatenate([preds[:, :-1], r0], axis=-1)
        targets_s = jnp.concatenate([targets[:, :-1], r1], axis=-1)
        loss_bbox = self.loss_bbox(preds_s, targets_s,
                                   weight=pos_v.astype(jnp.float32),
                                   avg_factor=avg)

        dirs = dir_preds.reshape(-1, 2)
        loss_dir = self.loss_dir(dirs, t["dir_targets"],
                                 weight=pos_v.astype(jnp.float32),
                                 avg_factor=avg)
        return {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "loss_dir": loss_dir,
        }

    def get_bboxes(self, cls_scores, bbox_preds, dir_preds):
        """Decode + per-class rotated NMS on device over a fixed nms_pre
        candidate set (reference get_bboxes_single :961-1025).

        Inputs are single-sample [H, W, A*x]. Returns fixed-size
        (bboxes [M,7], scores [M], labels [M], valid [M]) with
        M = nms_pre * num_classes.
        """
        num_classes = len(self.classes)
        anchors = jnp.asarray(self._anchors()).reshape(-1, 7)

        scores = jax.nn.sigmoid(cls_scores.reshape(-1, num_classes))
        preds = bbox_preds.reshape(-1, 7)
        dirs = jnp.argmax(dir_preds.reshape(-1, 2), axis=-1)

        npre = min(self.nms_pre, scores.shape[0])
        max_scores = jnp.max(scores, axis=1)
        _, topk = jax.lax.top_k(max_scores, npre)
        anchors_k = anchors[topk]
        preds_k = preds[topk]
        scores_k = scores[topk]
        dirs_k = dirs[topk]

        boxes = BBoxCoder.decode(anchors_k, preds_k)  # [npre, 7]
        bev = box3d_to_bev(boxes)

        out_boxes, out_scores, out_labels, out_valid = [], [], [], []
        for i in range(num_classes):
            cls_s = scores_k[:, i]
            m = cls_s > self.score_thr
            keep = nms_bev(bev, jnp.where(m, cls_s, -jnp.inf), 0.01,
                           valid_mask=m)
            out_boxes.append(boxes)
            out_scores.append(cls_s)
            out_labels.append(jnp.full((npre,), i, jnp.int32))
            out_valid.append(keep & m)
        boxes = jnp.concatenate(out_boxes, axis=0)
        scores_o = jnp.concatenate(out_scores, axis=0)
        labels_o = jnp.concatenate(out_labels, axis=0)
        valid_o = jnp.concatenate(out_valid, axis=0)

        dir_all = jnp.concatenate([dirs_k] * num_classes, axis=0)
        dir_rot = limit_period(boxes[..., 6] - self.dir_offset, 1, np.pi)
        yaw = dir_rot + self.dir_offset + np.pi * dir_all.astype(boxes.dtype)
        boxes = boxes.at[:, 6].set(yaw)
        return boxes, scores_o, labels_o, valid_o

    def inference_end(self, results, inputs):
        """Per-sample decode on device, then host conversion to BEVBox3D."""
        cls_scores, bbox_preds, dir_preds = results
        b = cls_scores.shape[0]
        decode = jax.jit(jax.vmap(self.get_bboxes))
        boxes_b, scores_b, labels_b, valid_b = decode(cls_scores, bbox_preds,
                                                      dir_preds)
        boxes_b = np.asarray(boxes_b)
        scores_b = np.asarray(scores_b)
        labels_b = np.asarray(labels_b)
        valid_b = np.asarray(valid_b)

        calibs = inputs.get("calib", None)
        if isinstance(calibs, dict):
            # DefaultBatcher collates the per-sample calib dicts into a dict
            # of stacked arrays; un-collate.
            keys = list(calibs.keys())
            calibs = [{k: np.asarray(calibs[k][i]) for k in keys}
                      for i in range(b)]
        if calibs is None:
            calibs = [None] * b
        out = []
        for i in range(b):
            out.append([])
            calib = calibs[i] if calibs is not None else None
            world_cam = cam_img = None
            if calib is not None:
                world_cam = calib.get("world_cam")
                cam_img = calib.get("cam_img")
            for box, score, label, ok in zip(boxes_b[i], scores_b[i],
                                             labels_b[i], valid_b[i]):
                if not ok:
                    continue
                dim = box[[3, 5, 4]]
                pos = box[:3] + [0, 0, dim[1] / 2]
                yaw = box[-1]
                name = self.lbl2name.get(int(label), "ignore")
                out[-1].append(
                    BEVBox3D(pos, dim, yaw, name, float(score), world_cam,
                             cam_img))
        return out

    def get_optimizer(self, cfg_pipeline):
        import optax
        opt = dict(cfg_pipeline.optimizer or {})
        lr = opt.pop("lr", 0.001)
        wd = opt.pop("weight_decay", 0.01)
        betas = opt.pop("betas", [0.95, 0.99])
        tx = optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1],
                         weight_decay=wd)
        return tx, None


MODEL._register_module(PointPillars)
