"""CLI smoke test: run_pipeline.py end to end on a tiny synthetic config."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_run_pipeline_train(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        os.makedirs(tmp_path / "data" / split, exist_ok=True)
        for i in range(2):
            pts = rng.uniform(0, 8, (3000, 3)).astype(np.float32)
            lab = rng.integers(0, 9, 3000).astype(np.int32)
            np.save(tmp_path / "data" / split / f"cloud_{i}.npy",
                    {"point": pts, "feat": None, "label": lab})

    cfg = f"""
dataset:
  name: Custom3D
  dataset_path: {tmp_path}/data
  cache_dir: {tmp_path}/cache
  use_cache: true
  class_weights: [1,1,1,1,1,1,1,1,1]
model:
  name: RandLANet
  num_points: 256
  num_classes: 9
  ignored_label_inds: [0]
  in_channels: 3
  dim_features: 8
  dim_output: [16, 32, 64, 128]
  sub_sampling_ratio: [4, 4, 4, 4]
  grid_size: 0.5
  augment:
    recenter:
      dim: [0, 1]
pipeline:
  name: SemanticSegmentation
  optimizer:
    lr: 0.001
  batch_size: 2
  val_batch_size: 2
  max_epoch: 0
  save_ckpt_freq: 1
  main_log_dir: {tmp_path}/logs
  train_sum_dir: {tmp_path}/tb
  scheduler_gamma: 0.99
  num_workers: 0
"""
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(cfg)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["OPEN3D_ML_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "run_pipeline.py"),
         "-c", str(cfg_path), "--split", "train",
         "--pipeline.num_workers", "0"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(REPO))
    assert result.returncode == 0, result.stderr[-3000:]
    import glob
    assert glob.glob(str(tmp_path / "logs" / "*" / "checkpoint" / "ckpt_*"))


class TestDefaultCfgs:
    """Every default_cfgs/*.yml parses and instantiates its module
    (reference ml3d/configs/default_cfgs/, used with --cfg_model etc.)."""

    def test_all_default_cfgs_instantiate(self, tmp_path):
        import glob
        import os
        from open3d_ml_tpu.utils import Config
        from open3d_ml_tpu.utils.builder import get_module

        root = os.path.join(os.path.dirname(__file__), "..",
                            "open3d_ml_tpu", "configs", "default_cfgs")
        files = sorted(glob.glob(os.path.join(root, "*.yml")))
        assert len(files) == 10
        for f in files:
            cfg = Config.load_from_file(f)
            d = cfg.to_dict()
            name = d.pop("name")
            kind = ("dataset" if "dataset_path" in d else
                    "pipeline" if "max_epoch" in d else "model")
            if kind == "model":
                cls = get_module("model", name)
                d.pop("batcher", None)
                d.pop("ckpt_path", None)
                cls(**d)
            elif kind == "pipeline":
                get_module("pipeline", name)
            else:
                cls = get_module("dataset", name)
                path = tmp_path / name
                path.mkdir(exist_ok=True)
                d["dataset_path"] = str(path)
                if name == "ParisLille3D":
                    (path / "training_10_classes").mkdir(exist_ok=True)
                    (path / "test_10_classes").mkdir(exist_ok=True)
                if name == "ShapeNet":
                    sub = path / \
                        "shapenetcore_partanno_segmentation_benchmark_v0"
                    (sub / "02691156" / "points").mkdir(parents=True,
                                                        exist_ok=True)
                    (sub / "02691156" / "points_label").mkdir(exist_ok=True)
                    (sub / "train_test_split").mkdir(exist_ok=True)
                    (sub / "synsetoffset2category.txt").write_text(
                        "Airplane\t02691156\n")
                    for s in ("train", "val", "test"):
                        (sub / "train_test_split" /
                         f"shuffled_{s}_file_list.json").write_text("[]")
                cls(**d)


class TestExperimentConfigs:
    """Every experiment YAML builds its model and pipeline classes — the
    analog of the reference's config-driven integration tests
    (tests/test_integration.py)."""

    @pytest.mark.slow
    def test_all_experiment_configs_build(self):
        import glob
        import os
        from open3d_ml_tpu.utils import Config
        from open3d_ml_tpu.utils.builder import get_module

        root = os.path.join(os.path.dirname(__file__), "..",
                            "open3d_ml_tpu", "configs")
        files = sorted(glob.glob(os.path.join(root, "*.yml")))
        assert len(files) == 20
        for f in files:
            cfg = Config.load_from_file(f)
            m = cfg.model.to_dict()
            name = m.pop("name")
            m.pop("batcher", None)
            m.pop("ckpt_path", None)
            model_cls = get_module("model", name)
            model = model_cls(**m)
            assert model.cfg is not None, f
            p = cfg.pipeline.to_dict()
            get_module("pipeline", p["name"])
            d = cfg.dataset.to_dict()
            get_module("dataset", d["name"])


@pytest.mark.slow
def test_convert_checkpoint_cli(tmp_path):
    """scripts/convert_checkpoint.py: synthetic zoo .pth -> orbax ckpt in
    the pipelines' resume layout."""
    import subprocess
    import sys
    from os.path import dirname, join

    torch = pytest.importorskip("torch")
    sys.path.insert(0, join(dirname(__file__)))
    from test_convert import _make_torch_state_dict

    rng = np.random.default_rng(0)
    sd = _make_torch_state_dict(rng)
    pth = tmp_path / "randlanet.pth"
    torch.save({"model_state_dict": sd}, str(pth))

    script = join(dirname(dirname(__file__)), "scripts",
                  "convert_checkpoint.py")
    out = tmp_path / "ckpt_00000"
    r = subprocess.run([sys.executable, script, str(pth), str(out),
                        "--model", "RandLANet"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert out.exists()

    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(str(out))
    assert set(restored) >= {"params", "batch_stats", "epoch"}
    assert "fc0" in restored["params"]["net"]
