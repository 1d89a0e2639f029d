"""Tests for config / registry / cache / logging utilities."""

import argparse

import numpy as np
import pytest

from open3d_ml_tpu.utils import (Cache, Config, ConfigDict, Registry,
                                 get_hash, get_runid)


class TestConfigDict:

    def test_attr_access(self):
        d = ConfigDict({"a": 1, "b": {"c": 2, "d": [1, {"e": 3}]}})
        assert d.a == 1
        assert d.b.c == 2
        assert d.b.d[1].e == 3
        assert d.missing is None

    def test_set(self):
        d = ConfigDict()
        d.x = {"y": 5}
        assert d.x.y == 5
        d["z"] = {"w": 6}
        assert d.z.w == 6


class TestConfig:

    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text("dataset:\n  name: Foo\nmodel:\n  name: Bar\n"
                     "pipeline:\n  name: Baz\n  batch_size: 4\n")
        cfg = Config.load_from_file(str(p))
        assert cfg.dataset.name == "Foo"
        assert cfg.pipeline.batch_size == 4

    def test_merge_cli(self, tmp_path):
        p = tmp_path / "cfg.yml"
        p.write_text("dataset:\n  name: Foo\n  use_cache: false\n"
                     "model:\n  name: Bar\npipeline:\n  name: Baz\n")
        cfg = Config.load_from_file(str(p))
        args = argparse.Namespace(device="tpu", split="train",
                                  dataset_path="/data", main_log_dir=None,
                                  ckpt_path=None, seed=7, batch_size=None,
                                  max_epochs=None)
        ds, model, pipe = Config.merge_cfg_file(
            cfg, args, {"dataset.use_cache": "true", "model.dim": "32",
                        "pipeline.lr": "0.5"})
        assert ds.use_cache is True
        assert ds.dataset_path == "/data"
        assert model.dim == 32
        assert pipe.lr == 0.5
        assert pipe.seed == 7

    def test_py_config(self, tmp_path):
        p = tmp_path / "cfg.py"
        p.write_text("dataset = {'name': 'Foo'}\nmodel = {'name': 'Bar'}\n")
        cfg = Config.load_from_file(str(p))
        assert cfg.dataset.name == "Foo"


class TestRegistry:

    def test_register_and_get(self):
        reg = Registry("thing")

        @reg.register_module()
        class A:
            pass

        @reg.register_module(name="Bee")
        class B:
            pass

        assert reg.get("A") is A
        assert reg.get("Bee", framework="torch") is B  # framework aliased
        assert "A" in reg
        assert reg.keys() == ["A", "Bee"]

    def test_builder(self):
        from open3d_ml_tpu.utils import get_module
        with pytest.raises(KeyError):
            get_module("nonexistent_type", "X")


class TestCache:

    def test_hit_and_miss(self, tmp_path):
        calls = []

        def preprocess(data):
            calls.append(1)
            return {"x": data["x"] * 2}

        cache = Cache(preprocess, str(tmp_path), get_hash(repr(preprocess)))
        out1 = cache("cloud_0", {"x": np.arange(5)})
        out2 = cache("cloud_0", {"x": np.arange(5)})
        assert len(calls) == 1
        np.testing.assert_array_equal(out1["x"], out2["x"])

    def test_persists_across_instances(self, tmp_path):
        def preprocess(data):
            return {"y": 1}

        key = get_hash(repr("fixed"))
        c1 = Cache(preprocess, str(tmp_path), key)
        c1("a", {})
        c2 = Cache(lambda d: (_ for _ in ()).throw(AssertionError), # must not be called
                   str(tmp_path), key)
        assert c2("a", {})["y"] == 1


class TestLog:

    def test_runid(self, tmp_path):
        (tmp_path / "00001_foo").mkdir()
        (tmp_path / "00003_foo").mkdir()
        (tmp_path / "00009_bar").mkdir()
        assert get_runid(str(tmp_path / "foo")) == "00004"
        assert get_runid(str(tmp_path / "new")) == "00001"


class TestProfiling:

    def test_step_timer(self):
        import time
        from open3d_ml_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=1)
        for _ in range(4):
            with t.step():
                time.sleep(0.01)
        s = t.summary()
        assert s["steps"] == 4  # total steps; stats exclude warmup
        assert 0.005 < s["mean_s"] < 0.5

    def test_annotate_and_trace_noop(self, tmp_path):
        import jax.numpy as jnp
        from open3d_ml_tpu.utils.profiling import annotate, trace

        with trace(str(tmp_path / "prof"), enabled=False):
            with annotate("block"):
                x = jnp.ones(4) + 1
        assert float(x.sum()) == 8.0


class TestFlops:
    """Analytic FLOPs accounting used by bench.py's MFU field."""

    def test_randlanet_scales_linearly_in_points_and_batch(self):
        from open3d_ml_tpu.utils.flops import randlanet_forward_flops
        f1 = randlanet_forward_flops(4096)
        assert randlanet_forward_flops(8192) == pytest.approx(2 * f1)
        assert randlanet_forward_flops(4096, batch_size=3) == \
            pytest.approx(3 * f1)

    def test_randlanet_flagship_magnitude(self):
        """Hand-derived bound for the benched config: the dominant terms
        are the two K-axis attention score Denses (2*n*K*d^2 each) at
        every level — 1.2-1.5 GF/level-pair — so one 45,056-pt forward
        must land in the 10-20 GF band."""
        from open3d_ml_tpu.utils.flops import randlanet_forward_flops
        f = randlanet_forward_flops(45056)
        assert 10e9 < f < 20e9, f

    def test_pointpillars_conv_dominated(self):
        """SECOND block1 alone (5+1 convs of 128ch at 124x108) is
        ~12.7 GF; the full forward must exceed it and stay < 100 GF."""
        from open3d_ml_tpu.utils.flops import pointpillars_forward_flops
        f = pointpillars_forward_flops()
        assert 12.7e9 < f < 100e9, f

    def test_peak_lookup(self):
        from open3d_ml_tpu.utils.flops import (DEFAULT_PEAK_BF16,
                                               peak_flops_for)
        assert peak_flops_for("TPU v5 lite") == 197e12
        assert peak_flops_for("TPU v5p chip") == 459e12
        assert peak_flops_for(None) == DEFAULT_PEAK_BF16
