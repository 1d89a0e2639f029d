"""PointNet++ set-abstraction / feature-propagation modules, TPU-native.

Rebuild of /root/reference/ml3d/torch/utils/pointnet/pointnet2_modules.py:
37-218 and ml3d/torch/modules/pointnet.py:40-106 (Pointnet2MSG): the CUDA ops
(furthest_point_sample, ball_query, grouping, three_nn/interpolate) become
the device compositions in ops/ (FPS fori_loop, masked radius search, gather,
3-NN weighted sum). All modules operate on one sample ([N, ...]) and are
vmapped over the batch by their callers — fixed npoint/nsample keep shapes
static.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.interpolation import (inverse_distance_weights, three_interpolate,
                                 three_nn)
from ..ops.neighbors import ball_query
from ..ops.sampling import furthest_point_sampling
from ..utils import MODEL
from .common import batch_norm


class SharedMLP2d(nn.Module):
    """Dense+BN+ReLU stack over the channel axis of [..., C] tensors."""
    channels: tuple
    bn: bool = True

    @nn.compact
    def __call__(self, x, training=False):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=not self.bn, name=f"conv{i}")(x)
            if self.bn:
                x = batch_norm(training, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class PointnetSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (single sample).

    npoint None = group-all (global feature).
    """
    npoint: int  # None/-1 => group all
    radii: tuple
    nsamples: tuple
    mlps: tuple  # tuple of channel tuples (first entry already includes +3)
    use_xyz: bool = True

    @nn.compact
    def __call__(self, xyz, features, training=False):
        """xyz [N,3]; features [N,C] or None -> (new_xyz [M,3],
        new_features [M, sum(mlp[-1])])."""
        group_all = self.npoint is None or self.npoint == -1
        if group_all:
            new_xyz = jnp.zeros((1, 3), xyz.dtype)
        else:
            idx = furthest_point_sampling(xyz, self.npoint)
            new_xyz = xyz[idx]

        outs = []
        for i, (radius, nsample) in enumerate(zip(self.radii,
                                                  self.nsamples)):
            if group_all:
                grouped_xyz = xyz[None, :, :] - new_xyz[:, None, :]
                grouped_feat = features[None, :, :] \
                    if features is not None else None
                mask = jnp.ones((1, xyz.shape[0]), bool)
            else:
                nidx, mask = ball_query(xyz, new_xyz, radius, nsample)
                # one fused gather for coords + features: row gathers are
                # latency-bound on TPU, a wide gather beats two narrow ones
                if features is not None:
                    cat = jnp.concatenate([xyz, features], axis=-1)
                    g = cat[nidx]
                    grouped_xyz = g[..., :3] - new_xyz[:, None, :]
                    grouped_feat = g[..., 3:]
                else:
                    grouped_xyz = xyz[nidx] - new_xyz[:, None, :]
                    grouped_feat = None
            if self.use_xyz:
                feats = grouped_xyz if grouped_feat is None else \
                    jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
            else:
                feats = grouped_feat
            feats = SharedMLP2d(tuple(self.mlps[i]), name=f"mlp{i}")(
                feats, training=training)
            feats = jnp.where(mask[..., None], feats, -1e9)
            outs.append(jnp.max(feats, axis=1))  # [M, C_i]
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointnetSAModule(PointnetSAModuleMSG):
    """Single-scale set abstraction (reference :139-168)."""

    @classmethod
    def create(cls, mlp, npoint=None, radius=None, nsample=None,
               use_xyz=True, name=None):
        return cls(npoint=npoint, radii=(radius,), nsamples=(nsample,),
                   mlps=(tuple(mlp),), use_xyz=use_xyz, name=name)


class PointnetFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""
    mlp: tuple

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 training=False):
        """unknown [n,3], known [m,3], unknown_feats [n,C1] or None,
        known_feats [m,C2] -> [n, mlp[-1]]."""
        if known is not None:
            dist, idx = three_nn(unknown, known)
            w = inverse_distance_weights(dist)
            interp = three_interpolate(known_feats, idx, w)
        else:
            interp = jnp.broadcast_to(known_feats,
                                      (unknown.shape[0],
                                       known_feats.shape[-1]))
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP2d(tuple(self.mlp), name="mlp")(interp,
                                                        training=training)


class Pointnet2MSG(nn.Module):
    """PointNet++ MSG backbone (single sample): SA stages + FP decoding
    (reference ml3d/torch/modules/pointnet.py:40-106).
    """
    in_channels: int = 6
    use_xyz: bool = True
    sa_npoints: tuple = (128, 32, -1)
    sa_radii: tuple = ((0.2,), (0.4,), (100,))
    sa_nsamples: tuple = ((64,), (64,), (64,))
    sa_mlps: tuple = (((128, 128, 128),), ((128, 128, 256),),
                      ((256, 256, 512),))
    fp_mlps: tuple = ()

    @nn.compact
    def __call__(self, pointcloud, training=False):
        """pointcloud [N, 3+C] -> (xyz [N,3], features [N, C_out])."""
        xyz = pointcloud[:, 0:3]
        features = pointcloud[:, 3:] if pointcloud.shape[-1] > 3 else None

        skip_ch = [self.in_channels]
        l_xyz, l_features = [xyz], [features]
        in_ch = self.in_channels
        for i in range(len(self.sa_npoints)):
            mlps = []
            out_ch = 0
            for spec in self.sa_mlps[i]:
                full = [in_ch + (3 if self.use_xyz else 0)] + list(spec)
                mlps.append(tuple(full[1:]))  # SharedMLP infers in dim
                out_ch += spec[-1]
            li_xyz, li_feat = PointnetSAModuleMSG(
                npoint=self.sa_npoints[i],
                radii=tuple(self.sa_radii[i]),
                nsamples=tuple(self.sa_nsamples[i]),
                mlps=tuple(mlps),
                use_xyz=self.use_xyz,
                name=f"sa{i}")(l_xyz[-1], l_features[-1], training=training)
            l_xyz.append(li_xyz)
            l_features.append(li_feat)
            in_ch = out_ch
            skip_ch.append(out_ch)

        n_fp = len(self.fp_mlps)
        for j in range(n_fp):
            # FP module j propagates level -(j+1) -> level -(j+2)
            lvl = len(l_xyz) - 1 - j
            l_features[lvl - 1] = PointnetFPModule(
                mlp=tuple(self.fp_mlps[n_fp - 1 - j]),
                name=f"fp{n_fp - 1 - j}")(
                    l_xyz[lvl - 1], l_xyz[lvl], l_features[lvl - 1],
                    l_features[lvl], training=training)

        return l_xyz[0], l_features[0]


MODEL._register_module(Pointnet2MSG)
