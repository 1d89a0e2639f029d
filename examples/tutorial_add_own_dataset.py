"""Tutorial: add your own dataset class.

Runnable companion to docs/tutorials/add_own_dataset.md — the JAX-stack
mirror of /root/reference/docs/tutorial/notebook/add_own_dataset.rst.

Implements a minimal BaseDataset/BaseDatasetSplit pair for a made-up disk
format (one .xyz text file per cloud: ``x y z label`` rows), registers it,
and trains RandLA-Net on it end-to-end through the registry + config path:

    OPEN3D_ML_TPU_FORCE_CPU=1 python examples/tutorial_add_own_dataset.py
"""

import glob
import os
import sys
from os.path import abspath, basename, dirname, exists, join

import numpy as np

sys.path.insert(0, dirname(dirname(abspath(__file__))))

if os.environ.get("OPEN3D_ML_TPU_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

from open3d_ml_tpu.datasets import BaseDataset, BaseDatasetSplit  # noqa: E402
from open3d_ml_tpu.utils import DATASET, make_dir  # noqa: E402


# Step 1 — the split: how to read ONE cloud. get_data must return
# {'point' [N,3] f32, 'feat' [N,F] f32 or None, 'label' [N] i32};
# get_attr must return a unique 'name' (cache key) and the 'split'.
class MyXYZSplit(BaseDatasetSplit):

    def __init__(self, dataset, split="training"):
        super().__init__(dataset, split=split)

    def __len__(self):
        return len(self.path_list)

    def get_data(self, idx):
        arr = np.loadtxt(self.path_list[idx], dtype=np.float32)
        return {"point": np.ascontiguousarray(arr[:, :3]),
                "feat": None,
                "label": arr[:, 3].astype(np.int32)}

    def get_attr(self, idx):
        path = self.path_list[idx]
        return {"idx": idx, "name": basename(path)[:-4], "path": path,
                "split": self.split}


# Step 2 — the dataset: file discovery per split + label names + how test
# results are persisted. Registering it makes `--dataset.name MyXYZ` work
# from YAML configs and the run_pipeline.py CLI.
class MyXYZ(BaseDataset):

    def __init__(self, dataset_path, name="MyXYZ",
                 cache_dir="./logs/cache", use_cache=False,
                 ignored_label_inds=[0], test_result_folder="./test",
                 class_weights=[1, 1, 1], **kwargs):
        super().__init__(dataset_path=dataset_path, name=name,
                         cache_dir=cache_dir, use_cache=use_cache,
                         ignored_label_inds=ignored_label_inds,
                         class_weights=class_weights,
                         test_result_folder=test_result_folder, **kwargs)
        self.label_to_names = self.get_label_to_names()
        self.num_classes = len(self.label_to_names)

    @staticmethod
    def get_label_to_names():
        return {0: "unlabeled", 1: "low", 2: "high"}

    def get_split(self, split):
        return MyXYZSplit(self, split=split)

    def get_split_list(self, split):
        folder = {"train": "train", "training": "train", "val": "val",
                  "validation": "val", "test": "test",
                  "testing": "test"}.get(split)
        if folder is None:
            raise ValueError(f"Invalid split {split}")
        return sorted(glob.glob(join(self.cfg.dataset_path, folder,
                                     "*.xyz")))

    def is_tested(self, attr):
        return exists(join(self.cfg.test_result_folder,
                           attr["name"] + ".npy"))

    def save_test_result(self, results, attr):
        make_dir(self.cfg.test_result_folder)
        np.save(join(self.cfg.test_result_folder, attr["name"] + ".npy"),
                np.asarray(results["predict_labels"]))


DATASET._register_module(MyXYZ)


def write_example_files(root):
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        os.makedirs(join(root, split), exist_ok=True)
        for i in range(2):
            pts = rng.uniform(0, 6, (3000, 3)).astype(np.float32)
            lab = (pts[:, 2] > 3).astype(np.int32) + 1
            np.savetxt(join(root, split, f"scan_{i}.xyz"),
                       np.concatenate([pts, lab[:, None]], axis=1),
                       fmt="%.4f")


def main():
    out = os.environ.get("TUTORIAL_OUT", "./logs/tutorial_dataset")
    write_example_files(join(out, "data"))

    # Step 3 — use it exactly like a built-in dataset, via the registry
    # (this is what the YAML config / CLI path does internally).
    from open3d_ml_tpu.utils import get_module
    cls = get_module("dataset", "MyXYZ")
    dataset = cls(dataset_path=join(out, "data"),
                  cache_dir=join(out, "cache"), use_cache=True,
                  test_result_folder=join(out, "test_results"))

    from open3d_ml_tpu.models import RandLANet
    from open3d_ml_tpu.pipelines import SemanticSegmentation
    model = RandLANet(num_points=1024, num_classes=3,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      dim_output=[16, 32, 64, 128],
                      sub_sampling_ratio=[4, 4, 4, 4], grid_size=0.2,
                      augment={"recenter": {"dim": [0, 1]}})
    pipeline = SemanticSegmentation(model, dataset=dataset, max_epoch=0,
                                    batch_size=2, val_batch_size=2,
                                    optimizer={"lr": 1e-2},
                                    main_log_dir=join(out, "logs"),
                                    train_sum_dir=join(out, "tb"),
                                    num_workers=0)
    pipeline.run_train()
    print("train losses:", [round(l, 3) for l in pipeline.losses])
    pipeline.run_test()
    print("tested clouds:", sorted(pipeline.test_results))
    print("TUTORIAL OK")


if __name__ == "__main__":
    main()
