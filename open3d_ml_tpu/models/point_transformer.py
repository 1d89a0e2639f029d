"""Point Transformer for semantic segmentation, TPU-native.

Rebuild of /root/reference/ml3d/torch/models/point_transformer.py:18-776
(arch from Zhao et al., arXiv:2012.09164): 5 encoder stages (TransitionDown
= FPS + KNN grouping + max-pool) of Bottleneck blocks around vector
self-attention over KNN(16) with positional encoding, and a decoder of
TransitionUp 3-NN inverse-distance interpolation stages.

TPU re-design: the reference batches ragged clouds with row_splits and calls
CUDA ops (knn_search, furthest_point_sample_v2) per ragged segment; here each
sample is a fixed-size patch (cfg.num_points, cropped/padded on the host) and
the whole forward — FPS, KNN, grouping, attention — runs per sample inside
the jitted step, vmapped over the batch. Static strides [1,4,4,4,4] give
static sizes at every level.
"""

import numpy as np
from scipy.spatial import cKDTree

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..datasets.augment import SemsegAugmentation
from ..datasets.utils import DataProcessing
from ..modules.losses import filter_valid_label
from ..ops.interpolation import (inverse_distance_weights, three_interpolate,
                                 three_nn)
from ..ops.neighbors import knn_search
from ..ops.sampling import furthest_point_sampling
from ..utils import MODEL
from .base_model import BaseModel
from .common import BatchedNet, batch_norm


def queryandgroup(nsample, points, queries, feat, use_xyz=True,
                  method="exact"):
    """KNN-group features around queries (reference :650-736, ragged ops
    replaced by dense per-sample gathers).

    The coordinate and feature rows are gathered in ONE fused gather (row
    gathers are latency-bound on TPU, so one wide gather beats two narrow
    ones). ``method`` selects the neighbor search: 'exact', 'approx'
    (jax.lax.approx_min_k) or 'window' (Morton-curve, ops/morton.py).

    Returns [Q, nsample, 3+C] (or [Q, nsample, C] without xyz).
    """
    if method == "window":
        from ..ops.morton import knn_window
        idx, _ = knn_window(points, queries, nsample)
    elif method == "approx":
        idx, _ = knn_search(points, queries, nsample, exact=False)
    else:
        idx, _ = knn_search(points, queries, nsample)
    cat = jnp.concatenate([points, feat], axis=-1)
    gathered = cat[idx]  # [Q, K, 3+C]
    if use_xyz:
        grouped_xyz = gathered[..., :3] - queries[:, None, :]
        return jnp.concatenate([grouped_xyz, gathered[..., 3:]], axis=-1), \
            idx
    return gathered[..., 3:], idx


class Transformer(nn.Module):
    """Vector self-attention over KNN (reference :377-467)."""
    out_planes: int
    share_planes: int = 8
    nsample: int = 16
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, point, feat, training=False):
        c = self.out_planes
        s = self.share_planes
        feat_q = nn.Dense(c, name="linear_q")(feat)
        feat_k = nn.Dense(c, name="linear_k")(feat)
        feat_v = nn.Dense(c, name="linear_v")(feat)

        # k and v share the neighbor indices: gather them fused
        fk, idx = queryandgroup(self.nsample, point, point,
                                jnp.concatenate([feat_k, feat_v], axis=-1),
                                use_xyz=True, method=self.knn_method)
        point_r = fk[:, :, 0:3]
        feat_k = fk[:, :, 3:3 + c]
        feat_v = fk[:, :, 3 + c:]

        # positional MLP: Linear(3,3) -> BN -> ReLU -> Linear(3, C)
        point_r = nn.Dense(3, name="linear_p0")(point_r)
        point_r = batch_norm(training, name="linear_p_bn")(point_r)
        point_r = nn.relu(point_r)
        point_r = nn.Dense(c, name="linear_p1")(point_r)

        n, k = point_r.shape[0], point_r.shape[1]
        w = feat_k - feat_q[:, None, :] + \
            point_r.reshape(n, k, 1, c).sum(2)

        # weight MLP: BN -> ReLU -> Linear(c, c/s) -> BN -> ReLU -> Linear
        w = batch_norm(training, name="linear_w_bn0")(w)
        w = nn.relu(w)
        w = nn.Dense(c // s, name="linear_w0")(w)
        w = batch_norm(training, name="linear_w_bn1")(w)
        w = nn.relu(w)
        w = nn.Dense(c // s, name="linear_w1")(w)

        w = jax.nn.softmax(w, axis=1)  # over neighbors
        out = ((feat_v + point_r).reshape(n, k, s, c // s) *
               w[:, :, None, :]).sum(1).reshape(n, c)
        return out


class TransitionDown(nn.Module):
    """FPS subsample + KNN grouping + maxpool (reference :470-537)."""
    out_planes: int
    stride: int = 1
    nsample: int = 16
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, point, feat, training=False):
        if self.stride != 1:
            m = point.shape[0] // self.stride
            idx = furthest_point_sampling(point, m)
            new_point = point[idx]
            grouped, _ = queryandgroup(self.nsample, point, new_point, feat,
                                       use_xyz=True,
                                       method=self.knn_method)  # [m, K, 3+C]
            x = nn.Dense(self.out_planes, use_bias=False,
                         name="linear")(grouped)
            x = batch_norm(training, name="bn")(x)
            x = nn.relu(x)
            feat = jnp.max(x, axis=1)  # [m, C]
            return new_point, feat
        x = nn.Dense(self.out_planes, use_bias=False, name="linear")(feat)
        x = batch_norm(training, name="bn")(x)
        return point, nn.relu(x)


class TransitionUp(nn.Module):
    """3-NN inverse-distance upsample + skip (reference :539-601)."""
    in_planes: int
    out_planes: int = None  # None = head (global-context concat)

    @nn.compact
    def __call__(self, pxo1, pxo2=None, training=False):
        if pxo2 is None:
            _, feat = pxo1
            n = feat.shape[0]
            mean = jnp.mean(feat, axis=0, keepdims=True)
            g = nn.Dense(self.in_planes, name="linear2")(mean)
            g = nn.relu(g)
            feat = jnp.concatenate(
                [feat, jnp.broadcast_to(g, (n, g.shape[-1]))], axis=1)
            feat = nn.Dense(self.in_planes, name="linear1")(feat)
            feat = batch_norm(training, name="bn1")(feat)
            return nn.relu(feat)
        point_1, feat_1 = pxo1
        point_2, feat_2 = pxo2
        x1 = nn.Dense(self.out_planes, name="linear1")(feat_1)
        x1 = batch_norm(training, name="bn1")(x1)
        x1 = nn.relu(x1)
        x2 = nn.Dense(self.out_planes, name="linear2")(feat_2)
        x2 = batch_norm(training, name="bn2")(x2)
        x2 = nn.relu(x2)
        dist, idx = three_nn(point_1, point_2)
        w = inverse_distance_weights(dist)
        return x1 + three_interpolate(x2, idx, w)


class Bottleneck(nn.Module):
    """Residual block around a Transformer layer (reference :603-647)."""
    planes: int
    share_planes: int = 8
    nsample: int = 16
    knn_method: str = "exact"

    @nn.compact
    def __call__(self, point, feat, training=False):
        identity = feat
        x = nn.Dense(self.planes, use_bias=False, name="linear1")(feat)
        x = batch_norm(training, name="bn1")(x)
        x = nn.relu(x)
        x = Transformer(self.planes, self.share_planes, self.nsample,
                        self.knn_method, name="transformer2")(
            point, x, training=training)
        x = batch_norm(training, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.planes, use_bias=False, name="linear3")(x)
        x = batch_norm(training, name="bn3")(x)
        return nn.relu(x + identity)


class PointTransformerNet(nn.Module):
    """Single-sample network; batched via BatchedNet."""
    blocks: tuple
    in_channels: int
    num_classes: int
    knn_method: str = "exact"  # 'exact' | 'approx' | 'window'

    @nn.compact
    def __call__(self, inputs, training=False):
        planes = [32, 64, 128, 256, 512]
        share_planes = 8
        stride = [1, 4, 4, 4, 4]
        nsample = [8, 16, 16, 16, 16]

        point = inputs["point"]
        feat = inputs["feat"]
        if self.in_channels == 3:
            feat = point
        else:
            feat = jnp.concatenate([point, feat], axis=1)

        points, feats = [point], [feat]
        for i in range(5):
            p, f = TransitionDown(planes[i], stride[i], nsample[i],
                                  self.knn_method, name=f"enc{i}_down")(
                points[-1], feats[-1], training=training)
            for b in range(1, self.blocks[i]):
                p, f2 = p, Bottleneck(planes[i], share_planes, nsample[i],
                                      self.knn_method,
                                      name=f"enc{i}_block{b}")(
                    p, f, training=training)
                f = f2
            points.append(p)
            feats.append(f)

        # decoder: head at the deepest level, then upsampling stages
        for i in range(4, -1, -1):
            name = f"dec{i}"
            if i == 4:
                f = TransitionUp(planes[i] , name=f"{name}_up")(
                    (points[i + 1], feats[i + 1]), training=training)
            else:
                f = TransitionUp(planes[i + 1], planes[i],
                                 name=f"{name}_up")(
                    (points[i + 1], feats[i + 1]),
                    (points[i + 2], feats[i + 2]), training=training)
            f = Bottleneck(planes[i], share_planes, nsample[i],
                           self.knn_method, name=f"{name}_block1")(
                points[i + 1], f, training=training)
            feats[i + 1] = f

        x = nn.Dense(planes[0], name="cls0")(feats[1])
        x = batch_norm(training, name="cls_bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, name="cls1")(x)


class PointTransformer(BaseModel):
    """Point Transformer model wrapper: host pipeline + net + wiring."""

    def __init__(self,
                 name="PointTransformer",
                 blocks=[2, 2, 2, 2, 2],
                 in_channels=6,
                 num_classes=13,
                 voxel_size=0.04,
                 max_voxels=80000,
                 num_points=16384,
                 ignored_label_inds=[],
                 batcher="DefaultBatcher",
                 augment=None,
                 knn_method="exact",
                 **kwargs):
        super().__init__(name=name,
                         blocks=blocks,
                         in_channels=in_channels,
                         num_classes=num_classes,
                         voxel_size=voxel_size,
                         max_voxels=max_voxels,
                         num_points=num_points,
                         ignored_label_inds=ignored_label_inds,
                         batcher=batcher,
                         augment=augment,
                         knn_method=knn_method,
                         **kwargs)
        self.augmenter = SemsegAugmentation(self.cfg.augment, seed=self.rng)

    def get_net(self):
        cfg = self.cfg
        return BatchedNet(net=PointTransformerNet(
            blocks=tuple(cfg.blocks),
            in_channels=cfg.in_channels,
            num_classes=cfg.num_classes,
            knn_method=cfg.get("knn_method", "exact")))

    def preprocess(self, data, attr):
        """Voxel-subsample + KD-tree (reference :198-256)."""
        cfg = self.cfg
        points = np.array(data["point"], dtype=np.float32)
        labels = (np.zeros((points.shape[0],), np.int32)
                  if data.get("label") is None else
                  np.array(data["label"], np.int32).reshape(-1))
        feat = None if data.get("feat") is None else \
            np.array(data["feat"], np.float32)

        out = {}
        if cfg.voxel_size:
            points = points - points.min(0)
            if feat is None:
                sub_points, sub_labels = DataProcessing.grid_subsampling(
                    points, labels=labels, grid_size=cfg.voxel_size)
                sub_feat = None
            else:
                sub_points, sub_feat, sub_labels = \
                    DataProcessing.grid_subsampling(
                        points, features=feat, labels=labels,
                        grid_size=cfg.voxel_size)
        else:
            sub_points, sub_feat, sub_labels = points, feat, labels

        search_tree = cKDTree(sub_points)
        out["point"] = sub_points
        out["feat"] = sub_feat
        out["label"] = sub_labels
        out["search_tree"] = search_tree
        if attr["split"] in ("test", "testing"):
            _, proj = search_tree.query(points, k=1)
            out["proj_inds"] = np.asarray(proj, np.int32).reshape(-1)
        return out

    def transform(self, data, attr, rng=None):
        """Augment + crop/pad to exactly num_points (fixed shape)."""
        cfg = self.cfg
        rng = rng or self.rng
        points = np.asarray(data["point"], np.float32).copy()
        feat = None if data["feat"] is None else \
            np.asarray(data["feat"], np.float32).copy()
        labels = np.asarray(data["label"], np.int32).copy()

        if attr["split"] in ("training", "train"):
            points, feat, labels = self.augmenter.augment(
                points, feat, labels, dict(cfg.get("augment") or {}),
                seed=rng)

        n_target = cfg.num_points
        n = points.shape[0]
        if n > n_target:
            # crop the n_target nearest points around a (random) seed
            init_idx = int(rng.integers(n)) if "train" in attr["split"] \
                else n // 2
            d2 = np.sum(np.square(points - points[init_idx]), 1)
            crop_idx = np.argsort(d2)[:n_target]
            rng.shuffle(crop_idx)
            points = points[crop_idx]
            labels = labels[crop_idx]
            if feat is not None:
                feat = feat[crop_idx]
            sel = crop_idx
        else:
            pad = rng.choice(n, n_target - n) if n_target > n else \
                np.empty((0,), np.int64)
            sel = np.concatenate([np.arange(n), pad])
            points = points[sel]
            labels = labels[sel]
            if feat is not None:
                feat = feat[sel]

        pmin, pmax = points.min(0), points.max(0)
        points = points - (pmin + pmax) / 2.0

        out = {
            "point": points.astype(np.float32),
            "label": labels.astype(np.int32),
            "point_inds": np.asarray(sel, np.int32),
        }
        out["feat"] = (feat / 255.0).astype(np.float32) \
            if feat is not None else np.zeros((n_target, 0), np.float32)
        return out

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
        opt = dict(cfg_pipeline.optimizer or {})
        lr = opt.get("lr", 0.5)
        max_epoch = cfg_pipeline.get("max_epoch", 100)
        steps = cfg_pipeline.get("steps_per_epoch", 1)
        boundaries = {
            int(max_epoch * 0.6) * steps: 0.1,
            int(max_epoch * 0.8) * steps: 0.1,
        }
        schedule = optax.piecewise_constant_schedule(lr, boundaries)
        tx = optax.sgd(learning_rate=schedule,
                       momentum=opt.get("momentum", 0.9))
        return tx, schedule

    def update_probs(self, inputs, results, test_probs):
        """Whole-(sub)cloud probabilities; the spatially-regular sampler is
        told the cloud is fully covered (reference :308-315)."""
        results = np.asarray(results)
        for b in range(results.shape[0]):
            probs = np.asarray(jax.nn.softmax(
                jnp.asarray(results[b].reshape(-1, self.cfg.num_classes)),
                axis=-1))
            inds = np.asarray(inputs["point_inds"][b])
            test_probs[inds] = probs
        return test_probs


MODEL._register_module(PointTransformer)
