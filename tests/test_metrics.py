"""Golden tests for the KITTI-protocol mAP metric and SemSegMetric."""

import numpy as np

from open3d_ml_tpu.metrics import mAP
from open3d_ml_tpu.modules.metrics import SemSegMetric


def _frame(boxes, labels, scores=None, difficulty=0):
    n = len(boxes)
    d = {
        "bbox": np.asarray(boxes, np.float64).reshape(n, 7),
        "label": np.asarray(labels, dtype="<U20"),
        "difficulty": np.full((n,), difficulty, np.float64),
    }
    d["score"] = (np.ones(n) if scores is None else
                  np.asarray(scores, np.float64))
    return d


BOX_A = [0, 0, 10, 1.6, 1.5, 3.9, 0.0]  # camera-frame (x,y,z,w,h,l,ry)
BOX_B = [5, 0, 20, 1.6, 1.5, 3.9, 0.0]
BOX_FAR = [20, 0, 40, 1.6, 1.5, 3.9, 0.0]


class TestmAP:

    def test_perfect_detection(self):
        pred = [_frame([BOX_A, BOX_B], ["Car", "Car"], [0.9, 0.8])]
        gt = [_frame([BOX_A, BOX_B], ["Car", "Car"])]
        ap = mAP(pred, gt, ["Car"], [0], [0.7])
        np.testing.assert_allclose(ap[0, 0, 0], 100.0, atol=0.5)

    def test_missed_gt_small_sample_branch(self):
        """With few detections the KITTI protocol only averages precision at
        *achieved* recall thresholds (reference mAP.py:252-257): a perfect
        but incomplete prediction set still scores 100 in the small-sample
        branch. This pins the (surprising but faithful) semantics."""
        pred = [_frame([BOX_A], ["Car"], [0.9])]
        gt = [_frame([BOX_A, BOX_FAR], ["Car", "Car"])]
        ap = mAP(pred, gt, ["Car"], [0], [0.7])
        np.testing.assert_allclose(ap[0, 0, 0], 100.0, atol=0.5)

    def test_false_positive_lowers_precision(self):
        pred = [_frame([BOX_A, BOX_FAR], ["Car", "Car"], [0.9, 0.95])]
        gt = [_frame([BOX_A], ["Car"])]
        ap_fp = mAP(pred, gt, ["Car"], [0], [0.7])
        pred2 = [_frame([BOX_A], ["Car"], [0.9])]
        ap_clean = mAP(pred2, gt, ["Car"], [0], [0.7])
        assert ap_fp[0, 0, 0] < ap_clean[0, 0, 0]

    def test_similar_class_not_counted_fn(self):
        """Vans overlapping Car predictions are aliased, not penalized."""
        pred = [_frame([BOX_A], ["Car"], [0.9])]
        gt_with_van = [_frame([BOX_A, BOX_B], ["Car", "Van"])]
        ap = mAP(pred, gt_with_van, ["Car"], [0], [0.7],
                 similar_classes={"Car": "Van"})
        np.testing.assert_allclose(ap[0, 0, 0], 100.0, atol=0.5)

    def test_bev_vs_3d(self):
        # identical BEV footprint but vertically offset: BEV match, 3D miss
        shifted = list(BOX_A)
        shifted[1] += 1.2  # y offset (vertical in camera frame)
        pred = [_frame([shifted], ["Car"], [0.9])]
        gt = [_frame([BOX_A], ["Car"])]
        ap_bev = mAP(pred, gt, ["Car"], [0], [0.7], bev=True)
        ap_3d = mAP(pred, gt, ["Car"], [0], [0.7], bev=False)
        assert ap_bev[0, 0, 0] > 90
        assert ap_3d[0, 0, 0] < 10


class TestSemSegMetric:

    def test_perfect(self):
        m = SemSegMetric()
        labels = np.array([0, 1, 2, 1, 0])
        scores = np.eye(3)[labels]
        m.update(scores, labels)
        assert np.allclose(m.acc()[-1], 1.0)
        assert np.allclose(m.iou()[-1], 1.0)

    def test_known_confusion(self):
        m = SemSegMetric()
        labels = np.array([0, 0, 1, 1])
        pred_scores = np.eye(2)[[0, 1, 1, 1]]  # one class-0 mislabeled
        m.update(pred_scores, labels)
        # class 0: tp=1 fn=1 fp=0 -> iou 0.5 ; class 1: tp=2 fp=1 -> 2/3
        np.testing.assert_allclose(m.iou()[:2], [0.5, 2 / 3], atol=1e-6)

    def test_accumulation(self):
        m = SemSegMetric()
        labels = np.array([0, 1])
        scores = np.eye(2)[labels]
        m.update(scores, labels)
        m.update(scores, labels)
        assert m.confusion_matrix.sum() == 4
