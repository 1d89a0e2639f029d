#!/usr/bin/env python
"""Object detection demo: PointPillars inference on a KITTI frame.

Counterpart of /root/reference/scripts/demo_obj_det.py.
Usage: python examples/demo_obj_det.py --dataset_path /data/KITTI
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.datasets import KITTI
from open3d_ml_tpu.utils import Config, get_module


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--frame", type=int, default=0)
    args = parser.parse_args()

    cfg = Config.load_from_file(
        str(Path(__file__).resolve().parent.parent / "open3d_ml_tpu" /
            "configs" / "pointpillars_kitti.yml"))
    model_cfg = cfg.model.to_dict()
    model_cfg["ckpt_path"] = args.ckpt_path
    model_cfg.pop("augment", None)

    Model = get_module("model", "PointPillars")
    Pipeline = get_module("pipeline", "ObjectDetection")
    dataset = KITTI(dataset_path=args.dataset_path)
    model = Model(**model_cfg)
    pipeline = Pipeline(model, dataset=dataset, batch_size=1,
                        main_log_dir="./logs", train_sum_dir="./tb")
    if args.ckpt_path:
        pipeline.load_ckpt(args.ckpt_path)

    data = dataset.get_split("training").get_data(args.frame)
    boxes = pipeline.run_inference(data)
    print(f"detected {len(boxes)} boxes")
    for b in boxes[:10]:
        print(f"  {b.label_class}: conf={b.confidence:.3f} "
              f"center={np.round(b.center, 2)}")

    # headless visualization export
    from open3d_ml_tpu.vis import Visualizer
    Visualizer().visualize(
        [{"name": "frame", "points": data["point"][:, :3]}],
        bounding_boxes=boxes, out_dir="./vis_export")


if __name__ == "__main__":
    import numpy as np
    main()
