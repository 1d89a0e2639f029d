"""Integration matrix: every semseg model trains one epoch through the full
SemanticSegmentation pipeline on a synthetic dataset."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e: full-suite budget control


@pytest.fixture(scope="module")
def rgb_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("matrix")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        os.makedirs(tmp / "data" / split, exist_ok=True)
        for i in range(2):
            pts = rng.uniform(0, 6, (2500, 3)).astype(np.float32)
            feat = rng.uniform(0, 255, (2500, 3)).astype(np.float32)
            lab = rng.integers(0, 8, 2500).astype(np.int32)
            np.save(tmp / "data" / split / f"cloud_{i}.npy",
                    {"point": pts, "feat": feat, "label": lab})
    return tmp


def _train_one(model, tmp, tag):
    from open3d_ml_tpu.datasets import Custom3D
    from open3d_ml_tpu.pipelines import SemanticSegmentation
    ds = Custom3D(dataset_path=str(tmp / "data"),
                  cache_dir=str(tmp / f"cache_{tag}"), use_cache=False,
                  class_weights=[1] * 8)
    pipe = SemanticSegmentation(model, dataset=ds, max_epoch=0, batch_size=2,
                                val_batch_size=2, save_ckpt_freq=100,
                                main_log_dir=str(tmp / f"logs_{tag}"),
                                train_sum_dir=str(tmp / f"tb_{tag}"),
                                optimizer={"lr": 1e-3},
                                scheduler_gamma=0.99, num_workers=0)
    pipe.run_train()
    assert pipe.losses and np.isfinite(pipe.losses).all()
    return pipe


class TestPipelineMatrix:

    def test_randlanet(self, rgb_dataset):
        from open3d_ml_tpu.models import RandLANet
        model = RandLANet(num_points=256, num_classes=8,
                          ignored_label_inds=[0], in_channels=6,
                          dim_features=8, dim_output=[16, 32, 64, 128],
                          sub_sampling_ratio=[4, 4, 4, 4], grid_size=0.3)
        _train_one(model, rgb_dataset, "randla")

    def test_pointtransformer(self, rgb_dataset):
        from open3d_ml_tpu.models import PointTransformer
        model = PointTransformer(blocks=[1, 1, 1, 1, 1], in_channels=6,
                                 num_classes=8, voxel_size=0.2,
                                 num_points=256, ignored_label_inds=[])
        _train_one(model, rgb_dataset, "pt")

    def test_pvcnn(self, rgb_dataset):
        from open3d_ml_tpu.models import PVCNN
        model = PVCNN(num_classes=8, num_points=512,
                      extra_feature_channels=6, ignored_label_inds=[])
        _train_one(model, rgb_dataset, "pvcnn")

    def test_sparseconvunet(self, rgb_dataset):
        from open3d_ml_tpu.models import SparseConvUnet
        model = SparseConvUnet(multiplier=4, voxel_size=0.1,
                               num_classes=8, in_channels=3,
                               num_points=512, max_voxels=512,
                               num_levels=3, ignored_label_inds=[])
        _train_one(model, rgb_dataset, "scu")

    def test_kpconv(self, rgb_dataset):
        from open3d_ml_tpu.models import KPFCNN
        model = KPFCNN(num_classes=8, lbl_values=list(range(9)),
                       ignored_label_inds=[0], num_points=256,
                       first_features_dim=16, in_features_dim=2,
                       first_subsampling_dl=0.25, in_radius=2.0,
                       neighborhood_limits=[10, 10],
                       architecture=["simple", "resnetb",
                                     "resnetb_strided", "resnetb",
                                     "nearest_upsample", "unary"])
        _train_one(model, rgb_dataset, "kpconv")
