"""Tutorial: train your first semantic-segmentation model.

Runnable companion to docs/tutorials/train_semseg.md — the JAX-stack mirror
of the reference walkthrough
/root/reference/docs/tutorial/notebook/train_ss_model_using_pytorch.rst.

Builds a small synthetic Custom3D dataset on disk, trains RandLA-Net for a
couple of epochs, then runs test + single-cloud inference. Small shapes so
the whole thing finishes in a few minutes on CPU:

    OPEN3D_ML_TPU_FORCE_CPU=1 python examples/tutorial_train_semseg.py
"""

import os
import sys
from os.path import abspath, dirname, join

import numpy as np

sys.path.insert(0, dirname(dirname(abspath(__file__))))

if os.environ.get("OPEN3D_ML_TPU_FORCE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def make_dataset_on_disk(root):
    """Step 0 — your data: one .npy dict per cloud with keys
    {'point' [N,3], 'feat' [N,F] or None, 'label' [N]}, in
    train/ val/ test/ subfolders (the Custom3D layout)."""
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        os.makedirs(join(root, split), exist_ok=True)
        for i in range(2):
            # two half-spaces of a cube with different labels + noise band
            pts = rng.uniform(0, 8, (4000, 3)).astype(np.float32)
            lab = (pts[:, 0] > 4).astype(np.int32) + 1  # classes 1, 2
            lab[pts[:, 2] > 7] = 0  # class 0 = unlabeled
            np.save(join(root, split, f"cloud_{i}.npy"),
                    {"point": pts, "feat": None, "label": lab})


def main():
    out = os.environ.get("TUTORIAL_OUT", "./logs/tutorial_semseg")
    data_root = join(out, "data")
    make_dataset_on_disk(data_root)

    # Step 1 — read a dataset. Any class in open3d_ml_tpu.datasets works
    # the same way; Custom3D reads the generic .npy layout above.
    from open3d_ml_tpu.datasets import Custom3D
    dataset = Custom3D(dataset_path=data_root,
                       cache_dir=join(out, "cache"), use_cache=True,
                       class_weights=[1, 1, 1],
                       test_result_folder=join(out, "test_results"))
    train_split = dataset.get_split("training")
    print(f"training clouds: {len(train_split)}; "
          f"first cloud: {train_split.get_data(0)['point'].shape}")

    # Step 2 — pick a model. Config mirrors
    # open3d_ml_tpu/configs/randlanet_semantickitti.yml, shrunk.
    from open3d_ml_tpu.models import RandLANet
    model = RandLANet(num_points=1024, num_classes=3,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      dim_output=[16, 32, 64, 128],
                      sub_sampling_ratio=[4, 4, 4, 4], grid_size=0.2,
                      augment={"recenter": {"dim": [0, 1]}})

    # Step 3 — train. The pipeline owns the jitted train step, the device
    # mesh (data parallelism is automatic over however many chips are
    # visible), checkpointing and TensorBoard logging.
    from open3d_ml_tpu.pipelines import SemanticSegmentation
    pipeline = SemanticSegmentation(model, dataset=dataset, max_epoch=1,
                                    batch_size=2, val_batch_size=2,
                                    optimizer={"lr": 1e-2},
                                    scheduler_gamma=0.99,
                                    main_log_dir=join(out, "logs"),
                                    train_sum_dir=join(out, "tb"),
                                    num_workers=0)
    pipeline.run_train()
    print("train losses:", [round(l, 3) for l in pipeline.losses])

    # Step 4 — test on the held-out split. Evaluation always goes through
    # the exact neighbor path (possibility-map patch loop, EMA fusion,
    # projection back to the full cloud).
    pipeline.run_test()
    for cid, res in pipeline.test_results.items():
        print(f"test cloud {cid}: predicted labels "
              f"{np.bincount(res['predict_labels'], minlength=3)}")

    # Step 5 — inference on one in-memory cloud.
    rng = np.random.default_rng(1)
    cloud = {"point": rng.uniform(0, 8, (2000, 3)).astype(np.float32),
             "feat": None, "label": np.zeros(2000, np.int32)}
    result = pipeline.run_inference(cloud)
    print("inference labels:", np.bincount(result["predict_labels"],
                                           minlength=3))
    print("TUTORIAL OK")


if __name__ == "__main__":
    main()
