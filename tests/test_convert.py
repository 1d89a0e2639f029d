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

class TestPointPillarsConversion:
    """convert_pointpillars vs real torch modules shaped like the reference
    (point_pillars.py:385-803): numerics must match in eval mode."""

    def _torch_bev_model(self):
        import torch
        import torch.nn as nn
        torch.manual_seed(0)

        def stage(cin, cout, stride, num):
            layers = [
                nn.Conv2d(cin, cout, 3, bias=False, stride=stride,
                          padding=1),
                nn.BatchNorm2d(cout, eps=1e-3),
                nn.ReLU()
            ]
            for _ in range(num):
                layers += [
                    nn.Conv2d(cout, cout, 3, bias=False, padding=1),
                    nn.BatchNorm2d(cout, eps=1e-3),
                    nn.ReLU()
                ]
            return nn.Sequential(*layers)

        class TorchPP(nn.Module):

            def __init__(self):
                super().__init__()
                self.backbone = nn.Module()
                self.backbone.blocks = nn.ModuleList(
                    [stage(16, 16, 2, 1), stage(16, 32, 2, 1)])
                self.neck = nn.Module()
                self.neck.deblocks = nn.ModuleList([
                    nn.Sequential(
                        nn.ConvTranspose2d(16, 16, 1, stride=1, bias=False),
                        nn.BatchNorm2d(16, eps=1e-3), nn.ReLU()),
                    nn.Sequential(
                        nn.ConvTranspose2d(32, 16, 2, stride=2, bias=False),
                        nn.BatchNorm2d(16, eps=1e-3), nn.ReLU())
                ])
                self.bbox_head = nn.Module()
                self.bbox_head.conv_cls = nn.Conv2d(32, 2, 1)
                self.bbox_head.conv_reg = nn.Conv2d(32, 14, 1)
                self.bbox_head.conv_dir_cls = nn.Conv2d(32, 4, 1)

            def forward(self, x):
                outs = []
                for b in self.backbone.blocks:
                    x = b(x)
                    outs.append(x)
                ups = [d(o) for d, o in zip(self.neck.deblocks, outs)]
                f = torch.cat(ups, 1)
                return (self.bbox_head.conv_cls(f),
                        self.bbox_head.conv_reg(f),
                        self.bbox_head.conv_dir_cls(f))

        m = TorchPP().eval()
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, nn.BatchNorm2d):
                    mod.running_mean.normal_(0, 0.3)
                    mod.running_var.uniform_(0.5, 1.5)
                    mod.weight.normal_(1, 0.2)
                    mod.bias.normal_(0, 0.2)
        return m

    def test_bev_stack_numerics(self):
        """Backbone + neck + head outputs match torch bit-for-nearly-bit,
        covering the Conv2d transpose and the ConvTranspose2d spatial flip."""
        import torch
        from open3d_ml_tpu.models.point_pillars import SECOND, SECONDFPN
        from open3d_ml_tpu.utils.convert_torch import convert_pointpillars

        m = self._torch_bev_model()
        x = torch.randn(1, 16, 16, 16)
        with torch.no_grad():
            tc, tr, td = m(x)

        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        # minimal voxel_encoder so the converter's completeness guard passes
        sd["voxel_encoder.pfn_layers.0.linear.weight"] = np.zeros(
            (16, 9), np.float32)
        for k, v in (("weight", np.ones(16)), ("bias", np.zeros(16)),
                     ("running_mean", np.zeros(16)),
                     ("running_var", np.ones(16))):
            sd[f"voxel_encoder.pfn_layers.0.norm.{k}"] = v.astype(np.float32)
        var = convert_pointpillars(sd)

        bb = SECOND(in_channels=16, out_channels=(16, 32),
                    layer_nums=(1, 1), layer_strides=(2, 2))
        nk = SECONDFPN(in_channels=(16, 32), out_channels=(16, 16),
                       upsample_strides=(1, 2))
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        outs = bb.apply(
            {"params": var["params"]["backbone"],
             "batch_stats": var["batch_stats"]["backbone"]}, xj,
            training=False)
        feat = nk.apply(
            {"params": var["params"]["neck"],
             "batch_stats": var["batch_stats"]["neck"]}, outs,
            training=False)

        def head(p, f):
            return jnp.einsum("bhwc,co->bhwo", f,
                              p["kernel"][0, 0]) + p["bias"]

        for name, t, j in (("conv_cls", tc, head(var["params"]["conv_cls"],
                                                 feat)),
                           ("conv_reg", tr, head(var["params"]["conv_reg"],
                                                 feat)),
                           ("conv_dir_cls", td,
                            head(var["params"]["conv_dir_cls"], feat))):
            tn = t.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(j), tn, atol=2e-4,
                                       err_msg=name)

    def test_pfn_layer_numerics(self):
        """PFNLayer with converted linear+norm reproduces the torch math
        (linear -> eval BN -> relu -> max over pillar points)."""
        from open3d_ml_tpu.models.point_pillars import PFNLayer
        from open3d_ml_tpu.utils.convert_torch import convert_pointpillars

        rng = np.random.default_rng(3)
        w = rng.standard_normal((16, 9)).astype(np.float32)
        gamma = rng.uniform(0.5, 1.5, 16).astype(np.float32)
        beta = rng.standard_normal(16).astype(np.float32)
        mean = rng.standard_normal(16).astype(np.float32) * 0.3
        var_ = rng.uniform(0.5, 1.5, 16).astype(np.float32)
        sd = {
            "voxel_encoder.pfn_layers.0.linear.weight": w,
            "voxel_encoder.pfn_layers.0.norm.weight": gamma,
            "voxel_encoder.pfn_layers.0.norm.bias": beta,
            "voxel_encoder.pfn_layers.0.norm.running_mean": mean,
            "voxel_encoder.pfn_layers.0.norm.running_var": var_,
            # minimal rest of the tree
            "backbone.blocks.0.0.weight": np.zeros((4, 16, 3, 3),
                                                   np.float32),
            "backbone.blocks.0.1.weight": np.ones(4, np.float32),
            "backbone.blocks.0.1.bias": np.zeros(4, np.float32),
            "backbone.blocks.0.1.running_mean": np.zeros(4, np.float32),
            "backbone.blocks.0.1.running_var": np.ones(4, np.float32),
            "neck.deblocks.0.0.weight": np.zeros((4, 4, 1, 1), np.float32),
            "neck.deblocks.0.1.weight": np.ones(4, np.float32),
            "neck.deblocks.0.1.bias": np.zeros(4, np.float32),
            "neck.deblocks.0.1.running_mean": np.zeros(4, np.float32),
            "neck.deblocks.0.1.running_var": np.ones(4, np.float32),
            "bbox_head.conv_cls.weight": np.zeros((2, 4, 1, 1), np.float32),
            "bbox_head.conv_cls.bias": np.zeros(2, np.float32),
            "bbox_head.conv_reg.weight": np.zeros((14, 4, 1, 1), np.float32),
            "bbox_head.conv_reg.bias": np.zeros(14, np.float32),
            "bbox_head.conv_dir_cls.weight": np.zeros((4, 4, 1, 1),
                                                      np.float32),
            "bbox_head.conv_dir_cls.bias": np.zeros(4, np.float32),
        }
        converted = convert_pointpillars(sd)
        pfn_vars = {
            "params": converted["params"]["voxel_encoder"]["pfn_0"],
            "batch_stats": converted["batch_stats"]["voxel_encoder"]["pfn_0"],
        }

        x = rng.standard_normal((5, 8, 9)).astype(np.float32)
        mask = np.ones((5, 8), bool)
        out = PFNLayer(16, last_layer=True).apply(
            pfn_vars, jnp.asarray(x), jnp.asarray(mask), training=False)

        y = x @ w.T
        y = (y - mean) / np.sqrt(var_ + 1e-3) * gamma + beta
        y = np.maximum(y, 0.0)
        expected = y.max(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out)[:, 0, :],
                                   expected[:, 0, :], atol=2e-5)
