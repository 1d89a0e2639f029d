"""Rotated / axis-aligned box IoU, usable from both numpy (host metrics) and
jnp (device, inside jit).

TPU-native replacement for the reference's external
`open3d.ml.contrib.iou_bev_{cpu,cuda}` / `iou_3d_{cpu,cuda}`
(/root/reference/ml3d/metrics/__init__.py:5-9,
ml3d/datasets/utils/operations.py:7). The rotated-rectangle intersection is
computed branchlessly with fixed-size candidate sets (4x4 edge intersections +
2x4 contained corners), so one implementation runs under XLA and under numpy.

BEV box format: [x, y, w, h, angle] — center, extents, rotation (radians),
matching the reference contrib ops' (x, y, w, l, ry) convention.
"""

import numpy as np

_EPS = 1e-8


def _box_corners(xp, boxes):
    """[..., 5] -> [..., 4, 2] corners in CCW order."""
    x, y, w, h, a = (boxes[..., i] for i in range(5))
    dx = xp.stack([w, w, -w, -w], axis=-1) * 0.5
    dy = xp.stack([-h, h, h, -h], axis=-1) * 0.5
    cos, sin = xp.cos(a)[..., None], xp.sin(a)[..., None]
    cx = x[..., None] + dx * cos - dy * sin
    cy = y[..., None] + dx * sin + dy * cos
    return xp.stack([cx, cy], axis=-1)


def _points_in_box(xp, pts, boxes):
    """pts [..., K, 2] in rotated rect boxes [..., 5] -> bool [..., K]."""
    x, y, w, h, a = (boxes[..., i] for i in range(5))
    cos, sin = xp.cos(a)[..., None], xp.sin(a)[..., None]
    px = pts[..., 0] - x[..., None]
    py = pts[..., 1] - y[..., None]
    lx = px * cos + py * sin
    ly = -px * sin + py * cos
    return (xp.abs(lx) <= w[..., None] * 0.5 + _EPS) & \
           (xp.abs(ly) <= h[..., None] * 0.5 + _EPS)


def _rotated_intersection_area(xp, boxes1, boxes2):
    """Intersection area of two rotated rects, elementwise over leading dims.

    boxes1, boxes2: [..., 5] broadcast-compatible.
    """
    c1 = _box_corners(xp, boxes1)  # [...,4,2]
    c2 = _box_corners(xp, boxes2)

    # Candidate 1: corners of each box inside the other (8).
    in2 = _points_in_box(xp, c1, boxes2)  # [...,4]
    in1 = _points_in_box(xp, c2, boxes1)

    # Candidate 2: pairwise edge intersections (16).
    p1 = c1[..., :, None, :]  # [...,4,1,2] edge starts of A
    p2 = xp.roll(c1, -1, axis=-2)[..., :, None, :]  # edge ends of A
    q1 = c2[..., None, :, :]  # [...,1,4,2]
    q2 = xp.roll(c2, -1, axis=-2)[..., None, :, :]

    d1 = p2 - p1
    d2 = q2 - q1
    den = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # [...,4,4]
    diff = q1 - p1
    t_num = diff[..., 0] * d2[..., 1] - diff[..., 1] * d2[..., 0]
    s_num = diff[..., 0] * d1[..., 1] - diff[..., 1] * d1[..., 0]
    den_safe = xp.where(xp.abs(den) > _EPS, den, 1.0)
    t = t_num / den_safe
    s = s_num / den_safe
    hit = (xp.abs(den) > _EPS) & (t >= -_EPS) & (t <= 1 + _EPS) & \
          (s >= -_EPS) & (s <= 1 + _EPS)
    ipt = p1 + t[..., None] * d1  # [...,4,4,2]

    lead = den.shape[:-2]
    cand = xp.concatenate([
        c1, c2, ipt.reshape(lead + (16, 2))], axis=-2)  # [...,24,2]
    mask = xp.concatenate([in2, in1, hit.reshape(lead + (16,))],
                          axis=-1)  # [...,24]

    cnt = mask.sum(axis=-1)
    maskf = mask.astype(cand.dtype)[..., None]
    center = (cand * maskf).sum(axis=-2) / \
        xp.maximum(maskf.sum(axis=-2), 1.0)  # [...,2]
    rel = cand - center[..., None, :]
    ang = xp.arctan2(rel[..., 1], rel[..., 0])
    ang = xp.where(mask, ang, 1e9)
    order = xp.argsort(ang, axis=-1)
    sorted_pts = xp.take_along_axis(cand, order[..., None], axis=-2)
    sorted_mask = xp.take_along_axis(mask, order, axis=-1)
    # Replace invalid (trailing) points with the first point so the shoelace
    # wraparound closes the polygon and degenerate terms vanish.
    first = sorted_pts[..., :1, :]
    poly = xp.where(sorted_mask[..., None], sorted_pts,
                    xp.broadcast_to(first, sorted_pts.shape))
    nxt = xp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    area = 0.5 * xp.abs(cross.sum(axis=-1))
    return xp.where(cnt >= 3, area, 0.0)


def iou_bev(boxes1, boxes2, xp=np):
    """Rotated BEV IoU matrix [N, M] for boxes [N,5], [M,5] (x,y,w,h,ry)."""
    b1 = boxes1[:, None, :]
    b2 = boxes2[None, :, :]
    b1b, b2b = xp.broadcast_arrays(b1, b2)
    inter = _rotated_intersection_area(xp, b1b, b2b)
    a1 = (boxes1[:, 2] * boxes1[:, 3])[:, None]
    a2 = (boxes2[:, 2] * boxes2[:, 3])[None, :]
    union = a1 + a2 - inter
    return inter / xp.maximum(union, _EPS)


def iou_3d(boxes1, boxes2, xp=np):
    """Rotated 3D IoU matrix [N, M] for boxes [N,7], [M,7].

    Box format [x, y, z, w, h, l, ry] with y the *bottom* of the box and h the
    vertical extent, matching the reference's KITTI-camera-frame convention
    (BEVBox3D.to_xyzwhlr, /root/reference/ml3d/datasets/utils/bev_box.py:103:
    x/z horizontal plane, y vertical down-to-bottom).
    """
    bev1 = xp.stack([boxes1[:, 0], boxes1[:, 2], boxes1[:, 3], boxes1[:, 5],
                     boxes1[:, 6]], axis=-1)
    bev2 = xp.stack([boxes2[:, 0], boxes2[:, 2], boxes2[:, 3], boxes2[:, 5],
                     boxes2[:, 6]], axis=-1)
    inter_bev = _rotated_intersection_area(
        xp, *xp.broadcast_arrays(bev1[:, None, :], bev2[None, :, :]))
    # Vertical overlap: boxes span [y - h, y] (KITTI: y is bottom in cam
    # coords with +y down; reference uses [y, y+h] in its own frame).
    ymin1, ymax1 = boxes1[:, 1], boxes1[:, 1] + boxes1[:, 4]
    ymin2, ymax2 = boxes2[:, 1], boxes2[:, 1] + boxes2[:, 4]
    overlap = xp.maximum(
        xp.minimum(ymax1[:, None], ymax2[None, :]) -
        xp.maximum(ymin1[:, None], ymin2[None, :]), 0.0)
    inter = inter_bev * overlap
    v1 = (boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5])[:, None]
    v2 = (boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5])[None, :]
    return inter / xp.maximum(v1 + v2 - inter, _EPS)


def iou_3d_elementwise(boxes1, boxes2, xp=np):
    """Rotated 3D IoU elementwise over matching leading dims.

    boxes1/boxes2: [..., 7] in the same [x, y, z, w, h, l, ry] convention as
    :func:`iou_3d` (y = bottom, h = vertical extent). Returns [...]. Used by
    the PointRCNN per-roi jitter augmentation, which needs one IoU per
    (candidate, gt) pair rather than the full cross matrix.
    """
    bev1 = xp.stack([boxes1[..., 0], boxes1[..., 2], boxes1[..., 3],
                     boxes1[..., 5], boxes1[..., 6]], axis=-1)
    bev2 = xp.stack([boxes2[..., 0], boxes2[..., 2], boxes2[..., 3],
                     boxes2[..., 5], boxes2[..., 6]], axis=-1)
    inter_bev = _rotated_intersection_area(xp, bev1, bev2)
    ymin1, ymax1 = boxes1[..., 1], boxes1[..., 1] + boxes1[..., 4]
    ymin2, ymax2 = boxes2[..., 1], boxes2[..., 1] + boxes2[..., 4]
    overlap = xp.maximum(
        xp.minimum(ymax1, ymax2) - xp.maximum(ymin1, ymin2), 0.0)
    inter = inter_bev * overlap
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    return inter / xp.maximum(v1 + v2 - inter, _EPS)


def iou_aligned(boxes1, boxes2, xp=np, mode="iou", eps=1e-6):
    """Axis-aligned 2D IoU/IoF matrix for [N,4], [M,4] (x1,y1,x2,y2)."""
    lt = xp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = xp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = xp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((boxes1[:, 2] - boxes1[:, 0]) *
          (boxes1[:, 3] - boxes1[:, 1]))[:, None]
    a2 = ((boxes2[:, 2] - boxes2[:, 0]) *
          (boxes2[:, 3] - boxes2[:, 1]))[None, :]
    if mode == "iou":
        union = a1 + a2 - inter
    else:  # intersection-over-foreground
        union = xp.broadcast_to(a1, inter.shape)
    return inter / xp.maximum(union, eps)
