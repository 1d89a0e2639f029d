#!/usr/bin/env python
"""API smoke demo: train RandLA-Net on a synthetic Custom3D dataset.

Counterpart of /root/reference/scripts/demo_api_train.py using the JAX
pipeline; runs on CPU/TPU without downloading anything.
"""

import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.datasets import Custom3D
from open3d_ml_tpu.models import RandLANet
from open3d_ml_tpu.pipelines import SemanticSegmentation


def make_synthetic_dataset(root):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        os.makedirs(f"{root}/data/{split}", exist_ok=True)
        for i in range(3):
            pts = rng.uniform(0, 10, (8000, 3)).astype(np.float32)
            lab = (pts[:, 2] > 5).astype(np.int32) + 1
            np.save(f"{root}/data/{split}/cloud_{i}.npy",
                    {"point": pts, "feat": None, "label": lab})


def main():
    tmp = tempfile.mkdtemp()
    make_synthetic_dataset(tmp)
    dataset = Custom3D(dataset_path=f"{tmp}/data", cache_dir=f"{tmp}/cache",
                       use_cache=True)
    model = RandLANet(num_points=4096, num_classes=9, ignored_label_inds=[0],
                      in_channels=3, dim_output=[16, 64, 128, 256],
                      sub_sampling_ratio=[4, 4, 4, 4], grid_size=0.1,
                      augment={"recenter": {"dim": [0, 1]}})
    pipeline = SemanticSegmentation(model, dataset=dataset, max_epoch=2,
                                    batch_size=2, val_batch_size=2,
                                    save_ckpt_freq=2,
                                    main_log_dir=f"{tmp}/logs",
                                    train_sum_dir=f"{tmp}/tb",
                                    optimizer={"lr": 1e-3},
                                    scheduler_gamma=0.99, num_workers=1)
    pipeline.run_train()
    print("losses:", pipeline.losses)

    data = dataset.get_split("val").get_data(0)
    result = pipeline.run_inference(data)
    acc = (result["predict_labels"] == data["label"] - 1).mean()
    print(f"inference labels: {result['predict_labels'].shape}, acc={acc:.3f}")


if __name__ == "__main__":
    main()
