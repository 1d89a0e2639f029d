"""Export layer tests: StableHLO roundtrip + CompiledModel.export
(reference analog: openvino_model.py / ONNX export)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestStableHLO:

    def test_roundtrip(self, tmp_path):
        from open3d_ml_tpu.export import export_stablehlo, load_stablehlo

        def fn(x, y):
            return jnp.tanh(x) @ y + 1.0

        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (4, 8)).astype(np.float32))
        y = jnp.asarray(np.random.default_rng(1).standard_normal(
            (8, 2)).astype(np.float32))
        p = tmp_path / "fn.stablehlo"
        export_stablehlo(fn, (x, y), str(p))
        assert p.exists() and p.stat().st_size > 0

        restored = load_stablehlo(str(p))
        out = restored.call(x, y)
        np.testing.assert_allclose(np.asarray(out), np.asarray(fn(x, y)),
                                   rtol=1e-6)

    @pytest.mark.slow
    def test_export_model_flow(self, tmp_path):
        from open3d_ml_tpu.export import export_model
        from open3d_ml_tpu.models import RandLANet

        model = RandLANet(num_points=128, num_classes=4,
                          ignored_label_inds=[], in_channels=3,
                          dim_features=8, dim_output=[16, 32],
                          sub_sampling_ratio=[4, 4], num_layers=2)
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "coords": jnp.asarray(rng.standard_normal((1, 128, 3)),
                                  jnp.float32),
            "features": jnp.asarray(rng.standard_normal((1, 128, 3)),
                                    jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        variables = net.init({"params": key, "dropout": key}, batch,
                             training=False)
        out = export_model(model, variables, batch, str(tmp_path),
                           formats=("stablehlo",))
        import glob
        assert glob.glob(str(tmp_path / "*.stablehlo"))
