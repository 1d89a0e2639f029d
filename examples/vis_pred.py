#!/usr/bin/env python
"""Visualize semantic-segmentation predictions next to ground truth
(counterpart of the reference examples/vis_pred.py).

Runs RandLA-Net and KPConv inference on demo clouds (files under
--path/points + --path/labels, or synthetic clouds when omitted) and
exports per-cloud colored PLYs through the headless visualizer backend:
<name>.ply (gt labels), <name>_randlanet.ply and <name>_kpconv.ply
(predictions). Pass --randlanet_ckpt / --kpconv_ckpt to seed the nets from
converted reference model-zoo .pth checkpoints
(open3d_ml_tpu.utils.convert_torch).
"""

import argparse
import sys
from os.path import join
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.models import KPFCNN, RandLANet
from open3d_ml_tpu.pipelines import SemanticSegmentation
from open3d_ml_tpu.vis import LabelLUT, Visualizer


def get_custom_data(pc_names, path):
    """Load {point, feat, label} dicts from <path>/points + <path>/labels
    (reference vis_pred.py:17-32)."""
    clouds = []
    for name in pc_names:
        point = np.load(join(path, "points", name + ".npy"))[:, 0:3]
        label = np.squeeze(np.load(join(path, "labels", name + ".npy")))
        clouds.append({"point": point.astype(np.float32), "feat": None,
                       "label": label.astype(np.int32)})
    return clouds


def synthetic_data(n_clouds=2, n_points=20000, num_classes=19):
    rng = np.random.default_rng(0)
    clouds = []
    for _ in range(n_clouds):
        pts = rng.uniform(0, 10, (n_points, 3)).astype(np.float32)
        label = (np.digitize(pts[:, 2], np.linspace(0, 10, num_classes))
                 ).astype(np.int32)
        clouds.append({"point": pts, "feat": None, "label": label})
    return clouds


def build_pipeline(model, ckpt, convert):
    pipeline = SemanticSegmentation(model, num_workers=0,
                                    main_log_dir="./vis_pred_logs")
    if ckpt:
        from open3d_ml_tpu.parallel import replicate
        from open3d_ml_tpu.utils.convert_torch import convert_checkpoint
        variables = convert_checkpoint(ckpt, model_name=convert)
        import jax
        import jax.numpy as jnp
        import optax
        from open3d_ml_tpu.pipelines.semantic_segmentation import TrainState
        from flax.core import FrozenDict
        consts = FrozenDict({k: v for k, v in variables.items()
                             if k not in ("params", "batch_stats")})
        pipeline.state = TrainState(
            params=replicate(variables["params"], pipeline.mesh),
            batch_stats=replicate(variables.get("batch_stats", {}),
                                  pipeline.mesh),
            opt_state=optax.identity().init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            consts=replicate(consts, pipeline.mesh) if consts else consts)
    return pipeline


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default=None,
                        help="demo dir with points/ + labels/ npy files")
    parser.add_argument("--names", nargs="*", default=["000700", "000750"])
    parser.add_argument("--out_dir", default="./vis_pred_export")
    parser.add_argument("--num_points", type=int, default=4096)
    parser.add_argument("--synth_points", type=int, default=20000,
                        help="synthetic cloud size when --path is omitted")
    parser.add_argument("--models", default="randlanet,kpconv",
                        help="comma list of models to run (the full KPConv "
                             "architecture takes minutes to compile on CPU)")
    parser.add_argument("--randlanet_ckpt", default=None)
    parser.add_argument("--kpconv_ckpt", default=None)
    args = parser.parse_args()

    clouds = (get_custom_data(args.names, args.path) if args.path
              else synthetic_data(n_points=args.synth_points))
    names = args.names if args.path else [f"demo{i}"
                                          for i in range(len(clouds))]

    wanted = [m.strip() for m in args.models.split(",") if m.strip()]
    pipes = {}
    if "randlanet" in wanted:
        model_r = RandLANet(num_points=args.num_points, num_classes=19,
                            ignored_label_inds=[0], in_channels=3,
                            dim_features=8, dim_output=[16, 64, 128, 256],
                            sub_sampling_ratio=[4, 4, 4, 4])
        pipes["randlanet"] = build_pipeline(model_r, args.randlanet_ckpt,
                                            "RandLANet")
    if "kpconv" in wanted:
        model_k = KPFCNN(num_classes=19, lbl_values=list(range(20)),
                         ignored_label_inds=[0],
                         num_points=args.num_points,
                         in_features_dim=2, neighborhood_limits=[12] * 5)
        pipes["kpconv"] = build_pipeline(model_k, args.kpconv_ckpt,
                                         "KPFCNN")

    vis_points = []
    for name, data in zip(names, clouds):
        vis_points.append({"name": name, "points": data["point"],
                           "labels": data["label"]})
        for mname, pipe in pipes.items():
            pred = pipe.run_inference(data)["predict_labels"] + 1
            pred[0] = 0  # show the "unlabeled" color too
            vis_points.append({"name": f"{name}_{mname}",
                               "points": data["point"], "labels": pred})

    lut = LabelLUT({i: str(i) for i in range(20)})
    out = Visualizer().visualize(vis_points, lut=lut, out_dir=args.out_dir)
    print("exported:", out)


if __name__ == "__main__":
    main()
