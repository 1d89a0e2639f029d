"""Anchor machinery for 3D detection heads (JAX).

Rebuild of /root/reference/ml3d/torch/utils/objdet_helper.py:30-467:
Anchor3DRangeGenerator (anchors precomputed as numpy constants — static
featmap sizes under XLA), BBoxCoder delta encode/decode, axis-aligned
bbox_overlaps for anchor assignment, and BEV conversions. The reference's
`multiclass_nms` (per-class rotated NMS) lives in ops.nms as a fixed-size
masked implementation.
"""

import numpy as np

import jax.numpy as jnp


def limit_period(val, offset=0.5, period=np.pi):
    """Limit value into [-offset*period, (1-offset)*period)."""
    return val - jnp.floor(val / period + offset) * period


def xywhr_to_xyxyr(boxes_xywhr):
    """Rotated boxes (cx, cy, w, h, r) -> (x1, y1, x2, y2, r)."""
    half_w = boxes_xywhr[:, 2] / 2
    half_h = boxes_xywhr[:, 3] / 2
    return jnp.stack([
        boxes_xywhr[:, 0] - half_w, boxes_xywhr[:, 1] - half_h,
        boxes_xywhr[:, 0] + half_w, boxes_xywhr[:, 1] + half_h,
        boxes_xywhr[:, 4]
    ], axis=-1)


def box3d_to_bev(boxes3d):
    """(x,y,z,w,l,h,r) -> BEV (x,y,w,l,r)."""
    return boxes3d[:, [0, 1, 3, 4, 6]]


def box3d_to_bev2d(boxes3d):
    """(x,y,z,w,l,h,r) -> nearest axis-aligned BEV (x1,y1,x2,y2).

    Swaps w/l when the normalized rotation exceeds pi/4 (reference
    objdet_helper.py:102-128) — the fast IoU approximation used by anchor
    assignment.
    """
    bev = box3d_to_bev(boxes3d)
    rot = jnp.abs(limit_period(bev[:, -1], 0.5, np.pi))
    cond = (rot > np.pi / 4)[..., None]
    bboxes_xywh = jnp.where(cond, bev[:, [0, 1, 3, 2]], bev[:, :4])
    centers = bboxes_xywh[:, :2]
    dims = bboxes_xywh[:, 2:]
    return jnp.concatenate([centers - dims / 2, centers + dims / 2], axis=-1)


def bbox_overlaps(bboxes1, bboxes2, mode="iou", eps=1e-6):
    """Axis-aligned IoU matrix [m, n] for (x1,y1,x2,y2) boxes."""
    lt = jnp.maximum(bboxes1[:, None, :2], bboxes2[None, :, :2])
    rb = jnp.minimum(bboxes1[:, None, 2:], bboxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]
    area1 = ((bboxes1[:, 2] - bboxes1[:, 0]) *
             (bboxes1[:, 3] - bboxes1[:, 1]))[:, None]
    if mode == "iou":
        area2 = ((bboxes2[:, 2] - bboxes2[:, 0]) *
                 (bboxes2[:, 3] - bboxes2[:, 1]))[None, :]
        union = area1 + area2 - overlap
    else:
        union = jnp.broadcast_to(area1, overlap.shape)
    return overlap / jnp.maximum(union, eps)


class Anchor3DRangeGenerator:
    """Grid anchor generation (numpy, at trace/setup time).

    Mirrors reference objdet_helper.py:129-248; anchors are constants under
    jit since feature map sizes are static.
    """

    def __init__(self, ranges, sizes=[[1.6, 3.9, 1.56]],
                 rotations=[0, 1.5707963]):
        if len(sizes) != len(ranges):
            assert len(ranges) == 1
            ranges = ranges * len(sizes)
        assert len(ranges) == len(sizes)
        self.sizes = sizes
        self.ranges = ranges
        self.rotations = rotations

    @property
    def num_base_anchors(self):
        return len(self.rotations) * np.array(self.sizes).reshape(-1,
                                                                  3).shape[0]

    def grid_anchors(self, featmap_size):
        """Anchors [H, W, num_sizes, num_rots, 7] (z collapsed)."""
        mr_anchors = []
        for anchor_range, anchor_size in zip(self.ranges, self.sizes):
            mr_anchors.append(
                self.anchors_single_range(featmap_size, anchor_range,
                                          anchor_size, self.rotations))
        # concat along the size axis
        return np.concatenate(mr_anchors, axis=-3)

    def anchors_single_range(self, feature_size, anchor_range, sizes,
                             rotations):
        """[H, W, num_sizes, num_rots, 7] numpy anchors for one range."""
        if len(feature_size) == 2:
            feature_size = [1, feature_size[0], feature_size[1]]
        anchor_range = np.asarray(anchor_range, np.float32)
        z_centers = np.linspace(anchor_range[2], anchor_range[5],
                                feature_size[0], dtype=np.float32)
        y_centers = np.linspace(anchor_range[1], anchor_range[4],
                                feature_size[1], dtype=np.float32)
        x_centers = np.linspace(anchor_range[0], anchor_range[3],
                                feature_size[2], dtype=np.float32)
        sizes = np.asarray(sizes, np.float32).reshape(-1, 3)
        rotations = np.asarray(rotations, np.float32)

        # meshgrid in (x, y, z, rot) 'ij' order like torch.meshgrid
        xg, yg, zg, rg = np.meshgrid(x_centers, y_centers, z_centers,
                                     rotations, indexing="ij")
        # [W, H, D, R] each -> add size dim
        num_sizes = sizes.shape[0]
        shape = xg.shape  # (W, H, D, R)
        out = np.zeros(shape[:3] + (num_sizes, shape[3], 7), np.float32)
        for s in range(num_sizes):
            out[..., s, :, 0] = xg
            out[..., s, :, 1] = yg
            out[..., s, :, 2] = zg
            out[..., s, :, 3:6] = sizes[s]
            out[..., s, :, 6] = rg
        # permute (W, H, D, S, R, 7) -> (D, H, W, S, R, 7); D == 1
        out = out.transpose(2, 1, 0, 3, 4, 5)
        return out[0]  # [H, W, S, R, 7]


class BBoxCoder:
    """Delta encode/decode between anchors and boxes.

    (x,y) normalized by the anchor BEV diagonal, z by height, sizes by log
    ratio; z is shifted to the box center during coding (reference
    objdet_helper.py:248-315).
    """

    @staticmethod
    def encode(src_boxes, dst_boxes):
        xa, ya, za, wa, la, ha, ra = jnp.split(src_boxes, 7, axis=-1)
        xg, yg, zg, wg, lg, hg, rg = jnp.split(dst_boxes, 7, axis=-1)
        za = za + ha / 2
        zg = zg + hg / 2
        diagonal = jnp.sqrt(la**2 + wa**2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / ha
        lt = jnp.log(lg / la)
        wt = jnp.log(wg / wa)
        ht = jnp.log(hg / ha)
        rt = rg - ra
        return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt], axis=-1)

    @staticmethod
    def decode(anchors, deltas):
        xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
        xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas, 7, axis=-1)
        za = za + ha / 2
        diagonal = jnp.sqrt(la**2 + wa**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * ha + za
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)
