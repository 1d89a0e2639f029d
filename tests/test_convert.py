"""Checkpoint converter test: synthetic torch-layout state dict -> flax
variables that the net accepts, with value-checked first layers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _make_torch_state_dict(rng):
    """Torch-layout RandLANet state dict with correct zoo shapes
    (dim_features=8, dim_output=[16,64,128,256], in=3, classes=19)."""
    import torch

    sd = {}

    def lin(name, i, o, bias=True):
        sd[name + ".weight"] = torch.tensor(
            rng.standard_normal((o, i)).astype(np.float32))
        if bias:
            sd[name + ".bias"] = torch.tensor(
                rng.standard_normal(o).astype(np.float32))

    def conv(name, i, o):
        sd[name + ".weight"] = torch.tensor(
            rng.standard_normal((o, i, 1, 1)).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(
            rng.standard_normal(o).astype(np.float32))

    def convT(name, i, o):
        sd[name + ".weight"] = torch.tensor(
            rng.standard_normal((i, o, 1, 1)).astype(np.float32))
        sd[name + ".bias"] = torch.tensor(
            rng.standard_normal(o).astype(np.float32))

    def bn(name, c):
        sd[name + ".weight"] = torch.ones(c)
        sd[name + ".bias"] = torch.zeros(c)
        sd[name + ".running_mean"] = torch.zeros(c)
        sd[name + ".running_var"] = torch.ones(c)

    def shared(name, i, o, with_bn=True, transpose=False):
        (convT if transpose else conv)(name + ".conv", i, o)
        if with_bn:
            bn(name + ".batch_norm", o)

    lin("fc0", 3, 8)
    bn("bn0", 8)
    dims = [16, 64, 128, 256]
    d_in = 8
    enc_dims = []
    for i, d in enumerate(dims):
        base = f"encoder.{i}"
        shared(f"{base}.mlp1", d_in, d // 2)
        shared(f"{base}.lse1.mlp", 10, d // 2)
        lin(f"{base}.pool1.score_fn.0", d, d)
        shared(f"{base}.pool1.mlp", d, d // 2)
        shared(f"{base}.lse2.mlp", d // 2, d // 2)
        lin(f"{base}.pool2.score_fn.0", d, d)
        shared(f"{base}.pool2.mlp", d, d)
        shared(f"{base}.mlp2", d, 2 * d)
        shared(f"{base}.shortcut", d_in, 2 * d)
        d_in = 2 * d
        if i == 0:
            enc_dims.append(d_in)
        enc_dims.append(d_in)
    shared("mlp", d_in, d_in)
    for i in range(4):
        shared(f"decoder.{i}", enc_dims[-i - 2] + d_in, enc_dims[-i - 2],
               transpose=True)
        d_in = enc_dims[-i - 2]
    shared("fc1.0", d_in, 64)
    shared("fc1.1", 64, 32)
    shared("fc1.3", 32, 19, with_bn=False)
    return sd


class TestRandLANetConversion:

    def test_converted_tree_matches_init(self):
        from open3d_ml_tpu.models import RandLANet
        from open3d_ml_tpu.utils.convert_torch import convert_randlanet

        rng = np.random.default_rng(0)
        sd = _make_torch_state_dict(rng)
        variables = convert_randlanet(
            {k: v.numpy() for k, v in sd.items()})

        model = RandLANet(num_points=512, num_classes=19,
                          ignored_label_inds=[0], in_channels=3,
                          dim_features=8, dim_output=[16, 64, 128, 256],
                          sub_sampling_ratio=[4, 4, 4, 4])
        net = model.get_net()
        batch = {
            "coords": jnp.asarray(rng.standard_normal((1, 512, 3)),
                                  jnp.float32),
            "features": jnp.asarray(rng.standard_normal((1, 512, 3)),
                                    jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        ref = net.init({"params": key, "dropout": key}, batch,
                       training=False)

        # structural match: identical tree paths and leaf shapes
        ref_flat = {jax.tree_util.keystr(k): v.shape
                    for k, v in jax.tree_util.tree_flatten_with_path(
                        ref["params"])[0]}
        got_flat = {jax.tree_util.keystr(k): np.asarray(v).shape
                    for k, v in jax.tree_util.tree_flatten_with_path(
                        variables["params"])[0]}
        assert ref_flat == got_flat

        # the converted variables actually run
        out = net.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, batch,
            training=False)
        assert out.shape == (1, 512, 19)
        assert bool(jnp.isfinite(out).all())

    def test_linear_value_mapping(self):
        """fc0 conversion reproduces torch Linear numerics."""
        import torch
        from open3d_ml_tpu.utils.convert_torch import _dense_from_linear
        rng = np.random.default_rng(1)
        w = rng.standard_normal((8, 3)).astype(np.float32)
        b = rng.standard_normal(8).astype(np.float32)
        sd = {"fc0.weight": w, "fc0.bias": b}
        dense = _dense_from_linear(sd, "fc0")
        x = rng.standard_normal((5, 3)).astype(np.float32)
        torch_out = torch.nn.functional.linear(
            torch.tensor(x), torch.tensor(w), torch.tensor(b)).numpy()
        ours = x @ dense["kernel"] + dense["bias"]
        np.testing.assert_allclose(ours, torch_out, atol=1e-5)
