"""KPConv (KPFCNN) for semantic segmentation, TPU-native.

Rebuild of /root/reference/ml3d/torch/models/kpconv.py:29-2209 (arch from
Thomas et al., "KPConv", arXiv:1904.08889): kernel-point convolutions (rigid
and deformable) over a radius-neighbor pyramid, with an architecture list
driving the encoder/decoder block stack.

TPU re-design:
* the multi-scale pyramid the reference builds at collate time with external
  FixedRadiusSearch + subsample_batch ops (kpconv.py:2002-2166) is built on
  the host in ``transform`` using the native C++ KD-tree and numpy grid
  subsampling, padded to static per-layer caps (points and neighbor counts),
* the KPConv op itself is pure gather + two einsum contractions (MXU):
  influence weights [N,K,P] x neighbor feats [N,K,C] -> [N,P,C], then
  [N,P,C] x kernel weights [P,C,O] -> [N,O]; shadow neighbors (sentinel
  index) hit a far-away padded point and a zero feature row, exactly like
  the reference's 1e6 shadow trick (kpconv.py:1046-1050),
* deformable offsets keep full fixed shapes (the reference's dynamic top-k
  in-range compaction, :1076-1105, is a CUDA memory optimization that XLA
  does not need),
* kernel point dispositions come from a numpy spherical Lloyd iteration
  (reference spherical_Lloyd :1544-1746), deterministic under a fixed seed.
"""

import numpy as np
from scipy.spatial import cKDTree

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..datasets.augment import SemsegAugmentation
from ..datasets.utils import DataProcessing
from ..modules.losses import filter_valid_label
from ..utils import MODEL
from .base_model import BaseModel
from .common import BatchedNet, batch_norm


# --------------------------------------------------------------------------
# kernel point dispositions
# --------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=64)
def kernel_point_lloyd(radius, num_points, dimension=3, fixed="center",
                       num_iter=60, seed=42):
    """Kernel point positions via Lloyd iteration on the ball.

    A clean reimplementation of the reference's spherical_Lloyd
    (kpconv.py:1544-1746): sample the ball uniformly, k-means the samples
    with the center point optionally pinned, scale to ``radius``.
    """
    rng = np.random.default_rng(seed)
    # dense uniform samples in the unit ball
    n_samples = 20000
    samples = rng.uniform(-1, 1, (n_samples * 3, dimension))
    samples = samples[np.linalg.norm(samples, axis=1) <= 1][:n_samples]

    # init centers: random ball points
    centers = rng.uniform(-1, 1, (num_points * 10, dimension))
    centers = centers[np.linalg.norm(centers, axis=1) <= 1][:num_points]
    if fixed in ("center", "verticals"):
        centers[0] = 0.0
    if fixed == "verticals" and dimension == 3 and num_points >= 3:
        centers[1] = [0, 0, 0.5]
        centers[2] = [0, 0, -0.5]

    for _ in range(num_iter):
        d2 = ((samples[:, None, :] - centers[None, :, :])**2).sum(-1)
        assign = d2.argmin(1)
        for c in range(num_points):
            pts = samples[assign == c]
            if len(pts):
                centers[c] = pts.mean(0)
        if fixed in ("center", "verticals"):
            centers[0] = 0.0
        if fixed == "verticals" and dimension == 3 and num_points >= 3:
            centers[1, :2] = 0.0
            centers[2, :2] = 0.0

    # the reference scales dispositions so the average center spacing
    # matches; here normalize max norm to ~1 then apply radius * 0.66
    # (load_kernels uses kernel points within ~2/3 of the radius)
    scale = np.linalg.norm(centers, axis=1).max()
    if scale > 0:
        centers = centers / scale * 0.66
    return (centers * radius).astype(np.float32)


# --------------------------------------------------------------------------
# device-side op + blocks
# --------------------------------------------------------------------------


class KPConvOp(nn.Module):
    """One kernel-point convolution (reference KPConv :893-1171)."""
    num_kernel_points: int
    in_channels: int
    out_channels: int
    kp_extent: float
    radius: float
    fixed_kernel_points: str = "center"
    kp_influence: str = "linear"
    aggregation_mode: str = "sum"
    deformable: bool = False
    repulse_extent: float = 1.2  # normalized units, reference yml :61

    def _influence(self, sq_distances):
        if self.kp_influence == "constant":
            return jnp.ones_like(sq_distances)
        if self.kp_influence == "linear":
            return jnp.clip(
                1 - jnp.sqrt(sq_distances + 1e-12) / self.kp_extent, 0.0,
                None)
        if self.kp_influence == "gaussian":
            sigma = self.kp_extent * 0.3
            return jnp.exp(-sq_distances / (2 * sigma**2))
        raise ValueError(self.kp_influence)

    @nn.compact
    def __call__(self, q_pts, s_pts, neighb_inds, x):
        """q_pts [Nq,3], s_pts [Ns,3], neighb_inds [Nq,K] (sentinel Ns),
        x [Ns,Cin] -> [Nq,Cout]."""
        p = self.num_kernel_points
        # Kernel-point dispositions live in the "kp_points" collection so a
        # zoo checkpoint's own (randomly optimized) kernel_points buffer can
        # replace the Lloyd-generated default at conversion time — the
        # reference stores them as a no-grad Parameter in the state_dict
        # (kpconv.py:990-1003), and logit parity requires the exact values.
        def _default_kp():
            return jnp.asarray(
                kernel_point_lloyd(self.radius, p,
                                   fixed=self.fixed_kernel_points),
                jnp.float32)

        if self.is_initializing() or self.has_variable("kp_points",
                                                       "points"):
            kp = self.variable("kp_points", "points", _default_kp).value
        else:
            # caller applied without the collection (e.g. plain
            # {params, batch_stats}): identical Lloyd default, no lookup
            kp = _default_kp()  # [P,3]

        ns = s_pts.shape[0]
        # one fused gather for support coords + features (row gathers are
        # latency-bound on TPU; one wide gather beats two narrow ones)
        cat = jnp.concatenate([s_pts, x.astype(s_pts.dtype)], axis=-1)
        cat_pad = jnp.concatenate(
            [cat,
             jnp.concatenate([jnp.full((1, 3), 1e6, s_pts.dtype),
                              jnp.zeros((1, x.shape[-1]), s_pts.dtype)],
                             axis=-1)], axis=0)
        gathered = cat_pad[neighb_inds]  # [Nq,K,3+Cin]
        neighbors = gathered[..., :3] - q_pts[:, None, :]  # [Nq,K,3]

        if self.deformable:
            offset_feat = KPConvOp(
                p, self.in_channels, 3 * p, self.kp_extent, self.radius,
                self.fixed_kernel_points, self.kp_influence,
                self.aggregation_mode, deformable=False,
                name="offset_conv")(q_pts, s_pts, neighb_inds, x)
            offset_bias = self.param("offset_bias", nn.initializers.zeros,
                                     (3 * p,))
            offsets = (offset_feat + offset_bias).reshape(
                -1, p, 3) * self.kp_extent
            k_points = kp[None, :, :] + offsets  # [Nq,P,3]
            diff = neighbors[:, :, None, :] - k_points[:, None, :, :]
        else:
            diff = neighbors[:, :, None, :] - kp[None, None, :, :]
        sq_d = jnp.sum(diff * diff, axis=-1)  # [Nq,K,P]

        if self.deformable:
            # p2p fitting regularizer terms (reference kpconv.py:2167-2209):
            # sown per deformable conv, summed by KPFCNN.regularizer_loss
            # when the train step requests the "p2p_reg" collection.
            ext2 = self.kp_extent ** 2
            min_d2 = jnp.min(sq_d, axis=1)  # [Nq, P] closest input point
            self.sow("p2p_reg", "fitting", jnp.mean(min_d2) / ext2)
            kp_locs = k_points / self.kp_extent  # [Nq, P, 3]
            other = jax.lax.stop_gradient(kp_locs)
            pd = jnp.sqrt(jnp.sum(
                (kp_locs[:, :, None, :] - other[:, None, :, :]) ** 2,
                axis=-1) + 1e-12)  # [Nq, P, P]
            pair_mask = 1.0 - jnp.eye(p, dtype=pd.dtype)
            rep = jnp.sum(
                jnp.minimum(pd - self.repulse_extent, 0.0) ** 2 * pair_mask,
                axis=2)  # [Nq, P] per-point repulsion to the others
            self.sow("p2p_reg", "repulsive",
                     jnp.mean(jnp.sum(rep, axis=1)) / p)

        all_w = self._influence(sq_d)  # [Nq,K,P]
        if self.aggregation_mode == "closest":
            closest = jnp.argmin(sq_d, axis=2)
            all_w = all_w * jax.nn.one_hot(closest, p, dtype=all_w.dtype)

        neighb_x = gathered[..., 3:].astype(x.dtype)  # [Nq,K,Cin]
        # [Nq,P,Cin] = sum_K w[n,k,p] * x[n,k,c]
        weighted = jnp.einsum("nkp,nkc->npc", all_w, neighb_x,
                              preferred_element_type=jnp.float32)
        weights = self.param(
            "weights",
            nn.initializers.variance_scaling(2.0, "fan_in", "uniform"),
            (p, self.in_channels, self.out_channels))
        return jnp.einsum("npc,pco->no", weighted, weights,
                          preferred_element_type=jnp.float32)


def _bn(x, training, use_bn, momentum, name_prefix, module):
    if use_bn:
        return batch_norm(training, name=f"{name_prefix}_bn",
                          momentum=1 - momentum)(x)
    bias = module.param(f"{name_prefix}_bias", nn.initializers.zeros,
                        (x.shape[-1],))
    return x + bias


class UnaryBlock(nn.Module):
    """Linear -> BN -> LeakyReLU (reference :1255-1296)."""
    out_dim: int
    use_bn: bool = True
    bn_momentum: float = 0.02
    no_relu: bool = False
    l_relu: float = 0.1

    @nn.compact
    def __call__(self, x, training=False):
        x = nn.Dense(self.out_dim, use_bias=False, name="mlp")(x)
        x = _bn(x, training, self.use_bn, self.bn_momentum, "unary", self)
        if not self.no_relu:
            x = nn.leaky_relu(x, negative_slope=self.l_relu)
        return x


def max_pool(x, inds):
    """Max over gathered neighbors with a shadow zero row
    (reference :840-858)."""
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)],
                            axis=0)
    return jnp.max(x_pad[inds], axis=1)


def closest_pool(x, inds):
    """Features of the first (closest) neighbor (reference :821-838)."""
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[-1]), x.dtype)],
                            axis=0)
    return x_pad[inds[:, 0]]


class SimpleBlock(nn.Module):
    """KPConv -> BN -> LeakyReLU (reference :1298-1357)."""
    block_name: str
    out_dim: int
    radius: float
    layer_ind: int
    cfg: dict

    @nn.compact
    def __call__(self, x, batch, training=False):
        cfg = self.cfg
        extent = self.radius * cfg["KP_extent"] / cfg["conv_radius"]
        if "strided" in self.block_name:
            q = batch["points"][self.layer_ind + 1]
            s = batch["points"][self.layer_ind]
            nb = batch["pools"][self.layer_ind]
        else:
            q = batch["points"][self.layer_ind]
            s = batch["points"][self.layer_ind]
            nb = batch["neighbors"][self.layer_ind]
        x = KPConvOp(cfg["num_kernel_points"], x.shape[-1],
                     self.out_dim // 2, extent, self.radius,
                     cfg["fixed_kernel_points"], cfg["KP_influence"],
                     cfg["aggregation_mode"],
                     deformable="deform" in self.block_name,
                     repulse_extent=cfg.get("repulse_extent", 1.2),
                     name="KPConv")(q, s, nb, x)
        x = _bn(x, training, cfg["use_batch_norm"],
                cfg["batch_norm_momentum"], "simple", self)
        return nn.leaky_relu(x, negative_slope=cfg["l_relu"])


class ResnetBottleneckBlock(nn.Module):
    """unary -> KPConv -> unary + shortcut (reference :1360-1464)."""
    block_name: str
    in_dim: int
    out_dim: int
    radius: float
    layer_ind: int
    cfg: dict

    @nn.compact
    def __call__(self, x, batch, training=False):
        cfg = self.cfg
        extent = self.radius * cfg["KP_extent"] / cfg["conv_radius"]
        use_bn = cfg["use_batch_norm"]
        mom = cfg["batch_norm_momentum"]
        lr = cfg["l_relu"]

        if "strided" in self.block_name:
            q = batch["points"][self.layer_ind + 1]
            s = batch["points"][self.layer_ind]
            nb = batch["pools"][self.layer_ind]
        else:
            q = batch["points"][self.layer_ind]
            s = batch["points"][self.layer_ind]
            nb = batch["neighbors"][self.layer_ind]

        feat = x
        if self.in_dim != self.out_dim // 4:
            feat = UnaryBlock(self.out_dim // 4, use_bn, mom, l_relu=lr,
                              name="unary1")(feat, training=training)
        feat = KPConvOp(cfg["num_kernel_points"], self.out_dim // 4,
                        self.out_dim // 4, extent, self.radius,
                        cfg["fixed_kernel_points"], cfg["KP_influence"],
                        cfg["aggregation_mode"],
                        deformable="deform" in self.block_name,
                        repulse_extent=cfg.get("repulse_extent", 1.2),
                        name="KPConv")(q, s, nb, feat)
        feat = _bn(feat, training, use_bn, mom, "conv", self)
        feat = nn.leaky_relu(feat, negative_slope=lr)
        feat = UnaryBlock(self.out_dim, use_bn, mom, no_relu=True, l_relu=lr,
                          name="unary2")(feat, training=training)

        if "strided" in self.block_name:
            shortcut = max_pool(x, nb)
        else:
            shortcut = x
        if self.in_dim != self.out_dim:
            shortcut = UnaryBlock(self.out_dim, use_bn, mom, no_relu=True,
                                  l_relu=lr, name="unary_shortcut")(
                shortcut, training=training)
        return nn.leaky_relu(feat + shortcut, negative_slope=lr)


class KPFCNNNet(nn.Module):
    """Single-sample KPFCNN; batched via BatchedNet.

    The architecture list drives the block stack exactly like the reference
    (kpconv.py:143-247).
    """
    cfg: dict  # static hashable dict of the needed config values
    num_classes: int

    @nn.compact
    def __call__(self, inputs, training=False):
        cfg = dict(self.cfg)
        arch = cfg["architecture"]
        layer = 0
        r = cfg["first_subsampling_dl"] * cfg["conv_radius"]
        in_dim = cfg["in_features_dim"]
        out_dim = cfg["first_features_dim"]

        x = inputs["features"]
        batch = inputs

        # ------- encoder
        skip_x = []
        skip_dims = []
        block_i = 0
        for block in arch:
            if any(t in block for t in ("pool", "strided", "upsample",
                                        "global")):
                if "upsample" not in block:
                    skip_x.append(x)
                    skip_dims.append(in_dim)
            if "upsample" in block:
                break
            if "simple" in block:
                x = SimpleBlock(block, out_dim, r, layer, cfg,
                                name=f"enc{block_i}")(x, batch,
                                                      training=training)
                in_dim = out_dim // 2
            elif "resnetb" in block:
                x = ResnetBottleneckBlock(block, in_dim, out_dim, r, layer,
                                          cfg, name=f"enc{block_i}")(
                    x, batch, training=training)
                in_dim = out_dim
            elif block == "unary":
                x = UnaryBlock(out_dim, cfg["use_batch_norm"],
                               cfg["batch_norm_momentum"],
                               l_relu=cfg["l_relu"],
                               name=f"enc{block_i}")(x, training=training)
                in_dim = out_dim
            elif "max_pool" in block or "pool" == block:
                x = max_pool(x, batch["pools"][layer])
            else:
                raise ValueError(f"Unknown encoder block {block}")
            if "pool" in block or "strided" in block:
                layer += 1
                r *= 2
                out_dim *= 2
            block_i += 1

        # skip appended for the level where upsampling starts
        # (reference stores dims at every downsample boundary)

        # ------- decoder
        start_i = block_i
        dec_i = 0
        for bi, block in enumerate(arch[start_i:]):
            if bi > 0 and "upsample" in arch[start_i + bi - 1]:
                x = jnp.concatenate([x, skip_x.pop()], axis=-1)
                in_dim += skip_dims.pop()
            if block == "unary":
                x = UnaryBlock(out_dim, cfg["use_batch_norm"],
                               cfg["batch_norm_momentum"],
                               l_relu=cfg["l_relu"],
                               name=f"dec{dec_i}")(x, training=training)
                in_dim = out_dim
            elif "upsample" in block:
                x = closest_pool(x, batch["upsamples"][layer - 1])
            else:
                raise ValueError(f"Unknown decoder block {block}")
            if "upsample" in block:
                layer -= 1
                r *= 0.5
                out_dim = out_dim // 2
            if bi == 0 and cfg.get("reduce_fc"):
                # reference kpconv.py:219-220 halves the decoder width once
                # more after the first decoder block when reduce_fc is set
                out_dim = out_dim // 2
            dec_i += 1

        if cfg.get("reduce_fc"):
            # reference :229-240: BN'd half-width head
            x = UnaryBlock(cfg["first_features_dim"] // 2,
                           cfg["use_batch_norm"],
                           cfg["batch_norm_momentum"], l_relu=cfg["l_relu"],
                           name="head_mlp")(x, training=training)
        else:
            x = UnaryBlock(cfg["first_features_dim"], False, 0,
                           l_relu=cfg["l_relu"], name="head_mlp")(
                x, training=training)
        x = UnaryBlock(self.num_classes, False, 0, no_relu=True,
                       l_relu=cfg["l_relu"], name="head_softmax")(
            x, training=training)
        return x


class KPFCNN(BaseModel):
    """KPFCNN model wrapper: host radius-pyramid pipeline + flax net."""

    def __init__(self,
                 name="KPFCNN",
                 lbl_values=list(range(20)),
                 num_classes=19,
                 ignored_label_inds=[0],
                 architecture=[
                     "simple", "resnetb", "resnetb_strided", "resnetb",
                     "resnetb", "resnetb_strided", "resnetb", "resnetb",
                     "resnetb_strided", "resnetb", "resnetb",
                     "resnetb_strided", "resnetb", "nearest_upsample",
                     "unary", "nearest_upsample", "unary",
                     "nearest_upsample", "unary", "nearest_upsample", "unary"
                 ],
                 in_radius=4.0,
                 max_in_points=100000,
                 num_points=16384,
                 num_kernel_points=15,
                 first_subsampling_dl=0.06,
                 conv_radius=2.5,
                 deform_radius=6.0,
                 deform_fitting_mode="point2point",
                 deform_fitting_power=1.0,
                 repulse_extent=1.2,
                 KP_extent=1.2,
                 KP_influence="linear",
                 aggregation_mode="sum",
                 first_features_dim=128,
                 in_features_dim=2,
                 modulated=False,
                 use_batch_norm=True,
                 batch_norm_momentum=0.02,
                 fixed_kernel_points="center",
                 num_layers=5,
                 l_relu=0.1,
                 neighborhood_limits=[16, 21, 27, 33, 37],
                 reduce_fc=False,
                 pyramid_ratio=3,
                 batcher="DefaultBatcher",
                 augment=None,
                 t_normalize=None,
                 ckpt_path=None,
                 **kwargs):
        super().__init__(
            name=name, lbl_values=lbl_values, num_classes=num_classes,
            ignored_label_inds=ignored_label_inds,
            architecture=architecture, in_radius=in_radius,
            max_in_points=max_in_points, num_points=num_points,
            num_kernel_points=num_kernel_points,
            first_subsampling_dl=first_subsampling_dl,
            conv_radius=conv_radius, deform_radius=deform_radius,
            deform_fitting_mode=deform_fitting_mode,
            deform_fitting_power=deform_fitting_power,
            repulse_extent=repulse_extent,
            KP_extent=KP_extent, KP_influence=KP_influence,
            aggregation_mode=aggregation_mode,
            first_features_dim=first_features_dim,
            in_features_dim=in_features_dim, modulated=modulated,
            use_batch_norm=use_batch_norm,
            batch_norm_momentum=batch_norm_momentum,
            fixed_kernel_points=fixed_kernel_points, num_layers=num_layers,
            l_relu=l_relu, neighborhood_limits=neighborhood_limits,
            reduce_fc=reduce_fc,
            pyramid_ratio=pyramid_ratio, batcher=batcher, augment=augment,
            t_normalize=t_normalize, ckpt_path=ckpt_path, **kwargs)
        self.augmenter = SemsegAugmentation(self.cfg.augment, seed=self.rng)

    def _num_layers(self):
        """Number of pyramid levels = strided blocks + 1."""
        return 1 + sum("strided" in b or ("pool" in b)
                       for b in self.cfg.architecture)

    def _pyramid_caps(self):
        cfg = self.cfg
        caps = []
        n = cfg.num_points
        for _ in range(self._num_layers()):
            caps.append(max(int(n), 64))
            n = n / cfg.pyramid_ratio
        return caps

    def get_net(self):
        cfg = self.cfg
        net_cfg = {
            "architecture": tuple(cfg.architecture),
            "num_kernel_points": cfg.num_kernel_points,
            "first_subsampling_dl": cfg.first_subsampling_dl,
            "conv_radius": cfg.conv_radius,
            "KP_extent": cfg.KP_extent,
            "KP_influence": cfg.KP_influence,
            "aggregation_mode": cfg.aggregation_mode,
            "first_features_dim": cfg.first_features_dim,
            "in_features_dim": cfg.in_features_dim,
            "use_batch_norm": cfg.use_batch_norm,
            "batch_norm_momentum": cfg.batch_norm_momentum,
            "fixed_kernel_points": cfg.fixed_kernel_points,
            "l_relu": cfg.l_relu,
            "reduce_fc": bool(cfg.get("reduce_fc", False)),
        }
        # flax static fields must be hashable
        from flax.core import FrozenDict
        return BatchedNet(net=KPFCNNNet(cfg=FrozenDict(net_cfg),
                                        num_classes=cfg.num_classes))

    # ------------------------------------------------------------- host side

    def preprocess(self, data, attr):
        """Grid-subsample + KD-tree (same pattern as RandLA-Net)."""
        cfg = self.cfg
        points = np.array(data["point"][:, 0:3], dtype=np.float32)
        labels = (np.zeros((points.shape[0],), np.int32)
                  if data.get("label") is None else
                  np.array(data["label"], np.int32).reshape(-1))
        feat = (None if data.get("feat") is None else
                np.array(data["feat"], np.float32))

        split = attr["split"]
        out = {}
        if feat is None:
            sub_points, sub_labels = DataProcessing.grid_subsampling(
                points, labels=labels, grid_size=cfg.first_subsampling_dl)
            sub_feat = None
        else:
            sub_points, sub_feat, sub_labels = \
                DataProcessing.grid_subsampling(
                    points, features=feat, labels=labels,
                    grid_size=cfg.first_subsampling_dl)
        search_tree = cKDTree(sub_points)
        out["point"] = sub_points
        out["feat"] = sub_feat
        out["label"] = sub_labels
        out["search_tree"] = search_tree
        if split in ("test", "testing"):
            _, proj = search_tree.query(points, k=1)
            out["proj_inds"] = np.asarray(proj, np.int32).reshape(-1)
        return out

    def _radius_neighbors(self, support, queries, radius, cap):
        """Padded [Q, cap] radius neighbors; sentinel len(support).

        The C++ KD-tree writes the padded array directly; the scipy
        fallback pays a Python loop over the per-query lists."""
        from ..native import NativeKDTree, native_available
        if native_available():
            out, _ = NativeKDTree(np.ascontiguousarray(
                support, np.float32)).query_radius_padded(
                    queries, radius, cap, fill=len(support))
            return out
        tree = cKDTree(support)
        lists = tree.query_ball_point(queries, radius)
        out = np.full((len(queries), cap), len(support), np.int32)
        for i, lst in enumerate(lists):
            k = min(len(lst), cap)
            out[i, :k] = lst[:k]
        return out

    def transform(self, data, attr, rng=None):
        """Radius-ball patch + host multi-scale pyramid, padded to caps.

        Mirrors the reference's collate-time segmentation_inputs
        (concat_batcher.py:186-370) but per-sample with static shapes.
        """
        cfg = self.cfg
        rng = rng or self.rng

        pc = data["point"].copy()
        labels = data["label"].copy()
        feat = data["feat"].copy() if data["feat"] is not None else None
        tree = data["search_tree"]

        pts, sel, center = self.trans_point_sampler(
            pc=pc, feat=feat, label=labels, search_tree=tree,
            num_points=cfg.num_points, radius=cfg.in_radius, rng=rng)
        sel = np.asarray(sel)
        labels = labels[sel]
        if feat is not None:
            feat = feat[sel]
        pts = pts - np.asarray(center).reshape(1, -1)

        if attr["split"] in ("training", "train"):
            pts, feat, labels = self.augmenter.augment(
                pts, feat, labels, dict(cfg.get("augment") or {}), seed=rng)

        # features: 1 (ones) + optional feat dims, matching in_features_dim
        n = pts.shape[0]
        ones = np.ones((n, 1), np.float32)
        if cfg.in_features_dim == 1:
            features = ones
        elif cfg.in_features_dim == 2:
            features = np.concatenate([ones, pts[:, 2:3]], axis=1)
        elif feat is not None:
            features = np.concatenate([ones, feat], axis=1)[:,
                                                            :cfg.
                                                            in_features_dim]
        else:
            features = np.concatenate([ones, pts], axis=1)[:,
                                                           :cfg.
                                                           in_features_dim]

        caps = self._pyramid_caps()
        limits = list(cfg.neighborhood_limits)
        while len(limits) < len(caps):
            limits.append(limits[-1])

        def pad_points(p, cap):
            out = np.full((cap, 3), 1e6, np.float32)
            k = min(len(p), cap)
            out[:k] = p[:k]
            return out, k

        points_pyr, neighbors_pyr, pools_pyr, upsamples_pyr = [], [], [], []
        counts = []
        cur = pts
        dl = cfg.first_subsampling_dl
        r = dl * cfg.conv_radius
        for lyr in range(len(caps)):
            cur_pad, k = pad_points(cur, caps[lyr])
            points_pyr.append(cur_pad)
            counts.append(k)
            nb = self._radius_neighbors(cur_pad[:k], cur_pad, r, limits[lyr])
            nb[nb == k] = caps[lyr]  # sentinel -> cap of this layer
            # remap sentinel: pad rows index k.. to cap
            nb = np.where(nb >= k, caps[lyr], nb)
            neighbors_pyr.append(nb.astype(np.int32))
            if lyr == len(caps) - 1:
                break
            sub = DataProcessing.grid_subsampling(cur[:k].astype(np.float32),
                                                  grid_size=dl * 2)
            sub_pad, ks = pad_points(sub, caps[lyr + 1])
            pool = self._radius_neighbors(cur_pad[:k], sub_pad, r,
                                          limits[lyr])
            pool = np.where(pool >= k, caps[lyr], pool)
            pools_pyr.append(pool.astype(np.int32))
            up = self._radius_neighbors(sub_pad[:ks], cur_pad, dl * 2,
                                        1)
            # fall back to nearest when the radius misses
            miss = (up[:, 0] >= ks)
            if miss.any():
                t2 = cKDTree(sub)
                _, nn1 = t2.query(cur_pad[miss][:, :3], k=1)
                up[miss, 0] = nn1
            up = np.where(up >= ks, caps[lyr + 1], up)
            upsamples_pyr.append(up.astype(np.int32))
            cur = sub
            dl *= 2
            r *= 2

        inputs = {
            "features": features.astype(np.float32),
            "labels": labels.astype(np.int32),
            "point_inds": sel.astype(np.int32),
            "points": points_pyr,
            "neighbors": neighbors_pyr,
            "pools": pools_pyr,
            "upsamples": upsamples_pyr,
        }
        # pad features/labels to cap 0
        cap0 = caps[0]
        if features.shape[0] < cap0:
            pad_n = cap0 - features.shape[0]
            inputs["features"] = np.concatenate(
                [inputs["features"],
                 np.zeros((pad_n, features.shape[1]), np.float32)])
            inputs["labels"] = np.concatenate(
                [inputs["labels"],
                 np.zeros((pad_n,), np.int32)])
            inputs["point_inds"] = np.concatenate(
                [inputs["point_inds"],
                 np.full((pad_n,), -1, np.int32)])
            inputs["point_mask"] = np.concatenate(
                [np.ones(features.shape[0], bool),
                 np.zeros(pad_n, bool)])
        else:
            inputs["features"] = inputs["features"][:cap0]
            inputs["labels"] = inputs["labels"][:cap0]
            inputs["point_inds"] = inputs["point_inds"][:cap0]
            inputs["point_mask"] = np.ones(cap0, bool)
        return inputs

    # ----------------------------------------------------------- device side

    def get_loss(self, Loss, results, inputs):
        cfg = self.cfg
        labels = inputs["labels"].reshape(-1)
        scores = results.reshape(-1, cfg.num_classes)
        remapped, valid = filter_valid_label(scores, labels, cfg.num_classes,
                                             cfg.ignored_label_inds)
        valid &= inputs["point_mask"].reshape(-1)
        loss = Loss.weighted_cross_entropy(scores, remapped, valid)
        return loss, remapped, scores

    def regularizer_loss(self, aux_collections):
        """p2p fitting regularizer over the deformable convs (reference
        kpconv.py:2167-2209 + get_loss :340-346): power * (2*fitting +
        repulsive), terms sown per conv by KPConvOp and averaged over the
        vmapped batch axis here."""
        reg = (aux_collections or {}).get("p2p_reg")
        if not reg:
            return 0.0
        mode = self.cfg.get("deform_fitting_mode", "point2point")
        if mode != "point2point":
            raise ValueError(f"fitting mode {mode!r} not implemented")
        fit = rep = 0.0
        leaves = jax.tree_util.tree_flatten_with_path(reg)[0]
        for path, leaf in leaves:
            name = jax.tree_util.keystr(path)
            if "fitting" in name:
                fit = fit + jnp.mean(leaf)
            elif "repulsive" in name:
                rep = rep + jnp.mean(leaf)
        power = self.cfg.get("deform_fitting_power", 1.0)
        return power * (2.0 * fit + rep)

    def get_optimizer(self, cfg_pipeline):
        """SGD+momentum with a reduced learning rate on the deformable
        offset parameters (reference kpconv.py:293-314 param groups +
        kpconv_semantickitti.yml:85 deform_lr_factor)."""
        import optax
        from ..modules.schedulers import exponential_lr
        opt = dict(cfg_pipeline.optimizer or {})
        lr = opt.get("lr", 1e-2)
        gamma = cfg_pipeline.get("scheduler_gamma", 0.98477)
        steps = cfg_pipeline.get("steps_per_epoch", 1)
        schedule = exponential_lr(lr, gamma, steps_per_epoch=steps)
        momentum = opt.get("momentum", 0.98)
        factor = cfg_pipeline.get("deform_lr_factor", 1.0)
        base = optax.sgd(learning_rate=schedule, momentum=momentum)
        if factor == 1.0 or "deform" not in "".join(
                self.cfg.architecture):
            return base, schedule

        deform_sched = lambda count: schedule(count) * factor
        deform = optax.sgd(learning_rate=deform_sched, momentum=momentum)

        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "deform" if "offset" in
                jax.tree_util.keystr(path) else "base", params)

        return optax.multi_transform({"base": base, "deform": deform},
                                     labels), schedule

    def update_probs(self, inputs, results, test_probs):
        test_smooth = 0.98
        results = np.asarray(results)
        for b in range(results.shape[0]):
            probs = np.asarray(jax.nn.softmax(
                jnp.asarray(results[b].reshape(-1, self.cfg.num_classes)),
                axis=-1))
            inds = np.asarray(inputs["point_inds"][b])
            valid = inds >= 0
            inds = inds[valid]
            test_probs[inds] = test_smooth * test_probs[inds] + \
                (1 - test_smooth) * probs[valid]
        return test_probs


MODEL._register_module(KPFCNN)
