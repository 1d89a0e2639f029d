"""PVCNN (Point-Voxel CNN) for semantic segmentation, TPU-native.

Rebuild of /root/reference/ml3d/torch/models/pvcnn.py:66-670 (arch from Liu
et al., arXiv:1907.03739): a PointNet trunk whose PVConv blocks fuse a point
branch (shared MLP) with a voxel branch — average-voxelize features into an
r^3 grid, run dense 3D convs, trilinearly de-voxelize back to points.

TPU re-design: the external CUDA `trilinear_devoxelize_forward/backward`
op pair becomes the autodiff-able gather composition in ops.interpolation;
voxelization is a segment-mean scatter; the voxel branch uses NDHWC
nn.Conv — dense 3D convs are exactly what the MXU wants. Fixed num_points
per sample keeps every shape static.
"""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..datasets.augment import SemsegAugmentation
from ..modules.losses import filter_valid_label
from ..ops.interpolation import trilinear_devoxelize
from ..utils import MODEL
from .base_model import BaseModel
from .common import BatchedNet, batch_norm


def avg_voxelize(feat, vox_coords, r):
    """Mean of point features per voxel cell.

    feat: [N, C]; vox_coords: [N, 3] int in [0, r); returns [r, r, r, C].
    """
    n, c = feat.shape
    hash_ = (vox_coords[:, 0] * r + vox_coords[:, 1]) * r + vox_coords[:, 2]
    grid = jax.ops.segment_sum(feat, hash_, num_segments=r * r * r)
    count = jax.ops.segment_sum(jnp.ones((n, 1), feat.dtype), hash_,
                                num_segments=r * r * r)
    grid = grid / jnp.maximum(count, 1.0)
    return grid.reshape(r, r, r, c)


def voxelize_normalized(features, coords, r, normalize=True, eps=1e-6):
    """Reference Voxelization module (pvcnn.py:622-670): recenters coords,
    normalizes to [0, 1], and average-voxelizes. Returns (grid [r,r,r,C],
    norm_coords [N, 3] in voxel units)."""
    coords = jax.lax.stop_gradient(coords)
    norm = coords - coords.mean(axis=0, keepdims=True)
    if normalize:
        scale = jnp.max(jnp.linalg.norm(norm, axis=1)) * 2.0 + eps
        norm = norm / scale + 0.5
    else:
        norm = (norm + 1) / 2.0
    norm = jnp.clip(norm * r, 0, r - 1)
    vox = jnp.round(norm).astype(jnp.int32)
    return avg_voxelize(features, vox, r), norm


class SharedMLP(nn.Module):
    """1x1 conv + BN + ReLU stack over [N, C] (reference :455-505)."""
    out_channels: tuple

    @nn.compact
    def __call__(self, x, training=False):
        chans = self.out_channels if isinstance(self.out_channels,
                                                (tuple, list)) \
            else (self.out_channels,)
        for i, oc in enumerate(chans):
            x = nn.Dense(oc, name=f"dense_{i}")(x)
            x = batch_norm(training, name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class SE3d(nn.Module):
    """Squeeze-excitation gate over voxel grid channels (reference
    :319-349)."""
    channel: int
    reduction: int = 8

    @nn.compact
    def __call__(self, x):
        # x: [r, r, r, C]
        s = x.mean(axis=(0, 1, 2))
        s = nn.Dense(self.channel // self.reduction, use_bias=False,
                     name="fc0")(s)
        s = nn.relu(s)
        s = nn.Dense(self.channel, use_bias=False, name="fc1")(s)
        s = jax.nn.sigmoid(s)
        return x * s[None, None, None, :]


class PVConv(nn.Module):
    """Point-voxel convolution: voxel 3D-conv branch + point MLP branch
    (reference :504-563)."""
    out_channels: int
    resolution: int
    kernel_size: int = 3
    with_se: bool = False
    normalize: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, features, coords, training=False):
        r = self.resolution
        grid, norm_coords = voxelize_normalized(features, coords, r,
                                                self.normalize, self.eps)
        x = grid[None]  # NDHWC [1, r, r, r, C]
        for i in range(2):
            x = nn.Conv(self.out_channels,
                        (self.kernel_size,) * 3,
                        padding=self.kernel_size // 2,
                        name=f"vconv{i}")(x)
            x = nn.BatchNorm(use_running_average=not training,
                             momentum=0.9, epsilon=1e-4, axis_name="batch",
                             name=f"vbn{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.1)
        x = x[0]
        if self.with_se:
            x = SE3d(self.out_channels, name="se")(x)
        # devoxelize: grid [C,r,r,r], coords [3,N]
        vox_feats = trilinear_devoxelize(
            jnp.transpose(x, (3, 0, 1, 2)), norm_coords.T, r).T  # [N, C]
        point_feats = SharedMLP((self.out_channels,),
                                name="point_features")(features,
                                                       training=training)
        return vox_feats + point_feats


class PVCNNNet(nn.Module):
    """Single-sample PVCNN; batched via BatchedNet."""
    num_classes: int
    in_channels: int
    width_multiplier: float = 1
    voxel_resolution_multiplier: float = 1

    # (out_channels, num_blocks, voxel_resolution)
    blocks = ((64, 1, 32), (64, 2, 16), (128, 1, 16), (1024, 1, None))

    @nn.compact
    def __call__(self, inputs, training=False):
        r_mult = self.width_multiplier
        vr = self.voxel_resolution_multiplier
        coords = inputs["point"]  # [N, 3]
        feat = inputs["feat"]  # [N, 9]
        n = coords.shape[0]

        out_features = []
        li = 0
        for out_ch, num_blocks, res in self.blocks:
            oc = int(r_mult * out_ch)
            for _ in range(num_blocks):
                if res is None:
                    feat = SharedMLP((oc,), name=f"pf{li}")(
                        feat, training=training)
                else:
                    feat = PVConv(oc, int(vr * res),
                                  name=f"pf{li}")(feat, coords,
                                                  training=training)
                out_features.append(feat)
                li += 1

        # global cloud feature: max over points -> MLP [256, 128]
        cloud = jnp.max(feat, axis=0)  # [1024]
        cloud = nn.Dense(int(r_mult * 256), name="cloud0")(cloud)
        cloud = batch_norm(training, name="cloud_bn0")(cloud)
        cloud = nn.relu(cloud)
        cloud = nn.Dense(int(r_mult * 128), name="cloud1")(cloud)
        cloud = batch_norm(training, name="cloud_bn1")(cloud)
        cloud = nn.relu(cloud)
        out_features.append(jnp.broadcast_to(cloud[None, :],
                                             (n, cloud.shape[-1])))

        x = jnp.concatenate(out_features, axis=1)
        x = SharedMLP((int(r_mult * 512),), name="cls0")(x,
                                                         training=training)
        x = nn.Dropout(0.3, deterministic=not training)(x)
        x = SharedMLP((int(r_mult * 256),), name="cls1")(x,
                                                         training=training)
        x = nn.Dropout(0.3, deterministic=not training)(x)
        return nn.Dense(self.num_classes, name="cls2")(x)  # [N, num_classes]


class PVCNN(BaseModel):
    """PVCNN model wrapper: host pipeline + net + wiring."""

    def __init__(self,
                 name="PVCNN",
                 num_classes=13,
                 num_points=40960,
                 extra_feature_channels=6,
                 width_multiplier=1,
                 voxel_resolution_multiplier=1,
                 ignored_label_inds=[],
                 batcher="DefaultBatcher",
                 augment=None,
                 **kwargs):
        super().__init__(name=name,
                         num_classes=num_classes,
                         num_points=num_points,
                         extra_feature_channels=extra_feature_channels,
                         width_multiplier=width_multiplier,
                         voxel_resolution_multiplier=voxel_resolution_multiplier,
                         ignored_label_inds=ignored_label_inds,
                         batcher=batcher,
                         augment=augment,
                         **kwargs)
        self.augmenter = SemsegAugmentation(self.cfg.augment, seed=self.rng)
        self.in_channels = extra_feature_channels + 3

    def get_net(self):
        cfg = self.cfg
        return BatchedNet(net=PVCNNNet(
            num_classes=cfg.num_classes,
            in_channels=self.in_channels,
            width_multiplier=cfg.width_multiplier,
            voxel_resolution_multiplier=cfg.voxel_resolution_multiplier))

    def preprocess(self, data, attr, rng=None):
        """Augment, normalize, build 9-channel features, fixed-size sample
        (reference :162-230)."""
        cfg = self.cfg
        rng = rng or self.rng
        points = np.array(data["point"], dtype=np.float32)
        labels = (np.zeros((points.shape[0],), np.int32)
                  if data.get("label") is None else
                  np.array(data["label"], np.int32).reshape(-1))
        feat = (points.copy() if data.get("feat") is None else
                np.array(data["feat"], np.float32))

        if attr["split"] in ("training", "train"):
            points, feat, labels = self.augmenter.augment(
                points, feat, labels, dict(cfg.get("augment") or {}),
                seed=rng)

        points -= np.min(points, 0)
        feat = feat / 255.0
        mx = np.maximum(np.max(points, 0), 1e-6)
        norm = points / mx
        feat = np.concatenate([points, feat, norm], axis=-1)

        choices = rng.choice(points.shape[0], cfg.num_points,
                             replace=(points.shape[0] < cfg.num_points))
        return {
            "point": points[choices].astype(np.float32),
            "feat": feat[choices].astype(np.float32),
            "label": labels[choices].astype(np.int32),
            "point_inds": choices.astype(np.int32),
        }

    def transform(self, data, attr):
        return data

    def get_loss(self, Loss, results, inputs):
        cfg = self.cfg
        labels = inputs["label"].reshape(-1)
        scores = results.reshape(-1, cfg.num_classes)
        remapped, valid = filter_valid_label(scores, labels, cfg.num_classes,
                                             cfg.ignored_label_inds)
        loss = Loss.weighted_cross_entropy(scores, remapped, valid)
        return loss, remapped, scores

    def get_optimizer(self, cfg_pipeline):
        import optax
        from ..modules.schedulers import exponential_lr
        opt = dict(cfg_pipeline.get("optimizer") or {})
        lr = opt.get("lr", cfg_pipeline.get("adam_lr", 1e-2))
        gamma = cfg_pipeline.get("scheduler_gamma", 1.0)
        steps = cfg_pipeline.get("steps_per_epoch", 1)
        schedule = exponential_lr(lr, gamma, steps_per_epoch=steps)
        return optax.adam(learning_rate=schedule), schedule

    def update_probs(self, inputs, results, test_probs):
        results = np.asarray(results)
        for b in range(results.shape[0]):
            probs = np.asarray(jax.nn.softmax(
                jnp.asarray(results[b].reshape(-1, self.cfg.num_classes)),
                axis=-1))
            inds = np.asarray(inputs["point_inds"][b])
            test_probs[inds] = probs
        return test_probs


MODEL._register_module(PVCNN)
