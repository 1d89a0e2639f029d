"""On-device rotated BEV NMS over a fixed number of boxes.

TPU-native replacement for the reference's external `nms` op
(/root/reference/ml3d/torch/utils/objdet_helper.py:347,
ml3d/torch/models/point_rcnn.py:1139): sequential greedy suppression expressed
as a lax.fori_loop over a precomputed IoU matrix. Box count is static (the
reference caps candidates at nms_pre=100 before NMS), so the O(N^2) IoU matrix
is small and the loop compiles to a tight on-chip program.
"""

import jax
import jax.numpy as jnp

from .iou import iou_bev


def nms_bev(boxes, scores, iou_threshold, *, valid_mask=None):
    """Greedy rotated-BEV NMS.

    Args:
        boxes: [N, 5] (x, y, w, h, angle) — N static.
        scores: [N] float.
        iou_threshold: suppression threshold.
        valid_mask: optional [N] bool; False boxes are pre-suppressed.

    Returns:
        keep: [N] bool mask of surviving boxes (in original order).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    iou = iou_bev(sboxes, sboxes, xp=jnp)  # [N,N] in score order
    svalid = jnp.ones((n,), jnp.bool_) if valid_mask is None \
        else valid_mask[order]

    def body(i, keep):
        alive = keep[i]
        suppress = (iou[i] > iou_threshold) & \
                   (jnp.arange(n) > i) & alive
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, svalid)
    keep = jnp.zeros((n,), jnp.bool_).at[order].set(keep_sorted)
    return keep


def multiclass_nms(boxes, scores, iou_threshold=0.25, score_threshold=0.0,
                   *, valid_mask=None):
    """Per-class rotated NMS (reference `multiclass_nms`,
    objdet_helper.py:316-351): runs NMS independently per class column.

    Args:
        boxes: [N, 5] BEV boxes shared across classes.
        scores: [N, C] per-class scores.

    Returns:
        keep: [N, C] bool — box n kept for class c.
    """
    base = jnp.ones(boxes.shape[:1], jnp.bool_) if valid_mask is None \
        else valid_mask

    def per_class(cls_scores):
        m = base & (cls_scores > score_threshold)
        return nms_bev(boxes, jnp.where(m, cls_scores, -jnp.inf),
                       iou_threshold, valid_mask=m)

    return jax.vmap(per_class, in_axes=1, out_axes=1)(scores)
