"""End-to-end pipeline tests on synthetic data (tiny shapes, CPU mesh)."""

import os
import shutil

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("semseg")
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        os.makedirs(tmp / "data" / split, exist_ok=True)
        for i in range(2):
            pts = rng.uniform(0, 8, (3000, 3)).astype(np.float32)
            lab = rng.integers(0, 9, 3000).astype(np.int32)
            np.save(tmp / "data" / split / f"cloud_{i}.npy",
                    {"point": pts, "feat": None, "label": lab})
    return tmp


def _make(tmp, **pipe_kwargs):
    from open3d_ml_tpu.datasets import Custom3D
    from open3d_ml_tpu.models import RandLANet
    from open3d_ml_tpu.pipelines import SemanticSegmentation

    ds = Custom3D(dataset_path=str(tmp / "data"),
                  cache_dir=str(tmp / "cache"), use_cache=True,
                  test_result_folder=str(tmp / "test_results"),
                  class_weights=[1] * 9)
    model = RandLANet(num_points=512, num_classes=9, ignored_label_inds=[0],
                      in_channels=3, dim_features=8,
                      dim_output=[16, 32, 64, 128],
                      sub_sampling_ratio=[4, 4, 4, 4], grid_size=0.25,
                      augment={"recenter": {"dim": [0, 1]}})
    defaults = dict(max_epoch=0, batch_size=2, val_batch_size=2,
                    save_ckpt_freq=1, main_log_dir=str(tmp / "logs"),
                    train_sum_dir=str(tmp / "tb"),
                    optimizer={"lr": 1e-3}, scheduler_gamma=0.99,
                    num_workers=0)
    defaults.update(pipe_kwargs)
    pipe = SemanticSegmentation(model, dataset=ds, **defaults)
    return ds, model, pipe


class TestSemanticSegmentationPipeline:

    @pytest.mark.slow
    def test_train_one_epoch(self, synthetic_dataset):
        ds, model, pipe = _make(synthetic_dataset, max_epoch=0)
        state = pipe.run_train()
        assert len(pipe.losses) > 0
        assert np.isfinite(pipe.losses).all()
        # checkpoint written
        import glob
        ckpts = glob.glob(
            str(synthetic_dataset / "logs" / "*" / "checkpoint" / "ckpt_*"))
        assert len(ckpts) >= 1

    @pytest.mark.slow
    def test_resume_from_ckpt(self, synthetic_dataset):
        ds, model, pipe = _make(synthetic_dataset, max_epoch=1)
        pipe.run_train()  # resumes from epoch saved by previous test

    @pytest.mark.slow
    def test_run_test_possibility_maps(self, synthetic_dataset):
        """Full possibility-map test loop: every test cloud gets covered,
        predictions saved in the dataset's format."""
        ds, model, pipe = _make(synthetic_dataset)
        pipe.run_test()
        assert len(pipe.test_results) == 2  # both test clouds covered
        for res in pipe.test_results.values():
            assert res["predict_labels"].shape == (3000,)
        import glob
        saved = glob.glob(
            str(synthetic_dataset / "test_results" / "*.npy"))
        assert len(saved) >= 1

    @pytest.mark.slow
    def test_inference(self, synthetic_dataset):
        ds, model, pipe = _make(synthetic_dataset)
        rng = np.random.default_rng(1)
        data = {
            "point": rng.uniform(0, 8, (2000, 3)).astype(np.float32),
            "feat": None,
            "label": np.zeros(2000, np.int32),
        }
        result = pipe.run_inference(data)
        assert result["predict_labels"].shape == (2000,)
        assert result["predict_scores"].shape == (2000, 9)


class TestEvalPathEnforcement:
    """run_test/run_inference must evaluate through exact neighbors even
    when the model is configured for the approximate fused path, unless
    eval_knn_method explicitly opts out (VERDICT r2 #8)."""

    def _model(self, **kw):
        from open3d_ml_tpu.models import RandLANet
        return RandLANet(num_points=256, num_classes=5,
                         ignored_label_inds=[0], in_channels=3,
                         dim_features=8, dim_output=[16, 32, 64, 128],
                         sub_sampling_ratio=[4, 4, 4, 4],
                         knn_method="fused", **kw)

    def test_eval_net_defaults_to_exact(self):
        model = self._model()
        assert model.get_net().net.knn_method == "fused"
        assert model.get_eval_net().net.knn_method == "exact"

    def test_eval_net_override_warns(self, caplog):
        import logging
        model = self._model(eval_knn_method="fused")
        with caplog.at_level(logging.WARNING):
            net = model.get_eval_net()
        assert net.net.knn_method == "fused"
        assert any("APPROXIMATE" in r.message for r in caplog.records)

    def test_shared_param_tree_fused_vs_exact(self):
        """One parameter tree drives both paths: init on the fused net,
        apply through the eval (exact) net."""
        import jax
        import jax.numpy as jnp
        model = self._model()
        rng = np.random.default_rng(0)
        batch = {
            "coords": jnp.asarray(
                rng.uniform(-5, 5, (1, 256, 3)), jnp.float32),
            "features": jnp.asarray(
                rng.uniform(-5, 5, (1, 256, 3)), jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        variables = model.get_net().init(
            {"params": key, "dropout": key}, batch, training=False)
        out = model.get_eval_net().apply(variables, batch, training=False)
        assert out.shape == (1, 256, 5)
        assert np.isfinite(np.asarray(out)).all()

    def test_infer_fn_uses_eval_net(self, synthetic_dataset, monkeypatch):
        ds, model, pipe = _make(synthetic_dataset)
        called = {}
        orig = model.get_eval_net

        def spy():
            called["yes"] = True
            return orig()

        monkeypatch.setattr(model, "get_eval_net", spy)
        pipe._make_infer_fn()
        assert called.get("yes")


class TestRegistryIntegration:

    def test_get_module_roundtrip(self):
        from open3d_ml_tpu.utils import get_module
        assert get_module("model", "RandLANet").__name__ == "RandLANet"
        assert get_module("dataset", "SemanticKITTI").__name__ == \
            "SemanticKITTI"
        assert get_module("pipeline", "SemanticSegmentation").__name__ == \
            "SemanticSegmentation"
        assert get_module("sampler", "SemSegRandomSampler").__name__ == \
            "SemSegRandomSampler"
