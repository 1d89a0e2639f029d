"""Convert reference model-zoo torch checkpoints to flax variable pytrees.

The reference publishes pretrained `.pth` checkpoints (model_zoo.md); this
module maps their state_dict layouts onto this framework's parameter trees so
zoo weights can seed TPU inference/fine-tuning. Conventions:

* torch nn.Linear / 1x1 nn.Conv2d weight [out, in(,1,1)] -> Dense kernel
  [in, out] (transpose);
* 1x1 nn.ConvTranspose2d weight [in, out, 1, 1] -> Dense kernel [in, out]
  (no transpose);
* BatchNorm weight/bias -> scale/bias params; running_mean/var ->
  batch_stats.
"""

import logging

import numpy as np

log = logging.getLogger(__name__)


def _t(x):
    return np.asarray(x, np.float32)


def _dense_from_linear(sd, prefix):
    w = _t(sd[prefix + ".weight"])
    if w.ndim == 4:  # 1x1 conv
        w = w[:, :, 0, 0]
    out = {"kernel": w.T}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _dense_from_convT(sd, prefix):
    w = _t(sd[prefix + ".weight"])  # [in, out, 1, 1]
    out = {"kernel": w[:, :, 0, 0]}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": _t(sd[prefix + ".weight"]),
              "bias": _t(sd[prefix + ".bias"])}
    stats = {"mean": _t(sd[prefix + ".running_mean"]),
             "var": _t(sd[prefix + ".running_var"])}
    return params, stats


def _shared_mlp(sd, prefix, transpose_conv=False, bn=True):
    params = {}
    stats = {}
    conv = _dense_from_convT(sd, prefix + ".conv") if transpose_conv \
        else _dense_from_linear(sd, prefix + ".conv")
    params["conv"] = conv
    if bn:
        p, s = _bn(sd, prefix + ".batch_norm")
        params["batch_norm"] = p
        stats["batch_norm"] = s
    return params, stats


def convert_randlanet(state_dict, num_layers=4):
    """Map a reference RandLANet state_dict (randlanet.py:17-113 layout) to
    this framework's BatchedNet(RandLANetNet) variables.

    Returns {"params": ..., "batch_stats": ...} ready for net.apply.
    """
    sd = {k: v for k, v in state_dict.items()}
    params = {}
    stats = {}

    params["fc0"] = _dense_from_linear(sd, "fc0")
    p, s = _bn(sd, "bn0")
    params["bn0"] = p
    stats["bn0"] = s

    def lse(prefix):
        return _shared_mlp(sd, prefix + ".mlp")

    for i in range(num_layers):
        enc = {}
        enc_s = {}
        base = f"encoder.{i}"
        for sub, tname in (("mlp1", "mlp1"), ("mlp2", "mlp2"),
                           ("shortcut", "shortcut")):
            enc[sub], enc_s[sub] = _shared_mlp(sd, f"{base}.{tname}")
        for lse_name in ("lse1", "lse2"):
            mp, ms = _shared_mlp(sd, f"{base}.{lse_name}.mlp")
            enc[lse_name] = {"mlp": mp}
            enc_s[lse_name] = {"mlp": ms}
        for pool in ("pool1", "pool2"):
            score = _dense_from_linear(sd, f"{base}.{pool}.score_fn.0")
            mp, ms = _shared_mlp(sd, f"{base}.{pool}.mlp")
            enc[pool] = {"score_fn": score, "mlp": mp}
            enc_s[pool] = {"mlp": ms}
        params[f"encoder_{i}"] = enc
        stats[f"encoder_{i}"] = enc_s

    params["mlp"], stats["mlp"] = _shared_mlp(sd, "mlp")

    for i in range(num_layers):
        params[f"decoder_{i}"], stats[f"decoder_{i}"] = _shared_mlp(
            sd, f"decoder.{i}", transpose_conv=True)

    params["fc1_0"], stats["fc1_0"] = _shared_mlp(sd, "fc1.0")
    params["fc1_1"], stats["fc1_1"] = _shared_mlp(sd, "fc1.1")
    params["fc1_3"], _ = _shared_mlp(sd, "fc1.3", bn=False)

    return {"params": {"net": params}, "batch_stats": {"net": stats}}


def _conv2d(sd, prefix, weight_key=None):
    """torch nn.Conv2d weight [out, in, kh, kw] -> flax nn.Conv kernel
    [kh, kw, in, out]."""
    w = _t(sd[(weight_key or prefix + ".weight")])
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def _convT2d(sd, prefix):
    """torch nn.ConvTranspose2d weight [in, out, kh, kw] -> flax
    nn.ConvTranspose kernel [kh, kw, in, out].

    torch's ConvTranspose2d is the gradient-of-conv; flax's default
    (transpose_kernel=False) is a fractionally-strided conv with the kernel
    unflipped, so the spatial axes must be reversed here.
    """
    w = _t(sd[prefix + ".weight"])
    out = {"kernel": w.transpose(2, 3, 0, 1)[::-1, ::-1]}
    if prefix + ".bias" in sd:
        out["bias"] = _t(sd[prefix + ".bias"])
    return out


def convert_pointpillars(state_dict):
    """Map a reference PointPillars state_dict (point_pillars.py:385-803
    layout: PillarFeatureNet / SECOND / SECONDFPN / Anchor3DHead) to this
    framework's PointPillarsNet variables.

    Returns {"params": ..., "batch_stats": ...} ready for net.apply. The
    head convs keep torch's channel order [anchor*attr], which matches the
    NHWC head here since only the channel axis ordering matters.
    """
    sd = dict(state_dict)
    params = {}
    stats = {}

    # PillarFeatureNet: pfn_layers.{i}.linear (no bias) + .norm
    enc_p, enc_s = {}, {}
    i = 0
    while f"voxel_encoder.pfn_layers.{i}.linear.weight" in sd:
        base = f"voxel_encoder.pfn_layers.{i}"
        p, s = _bn(sd, base + ".norm")
        enc_p[f"pfn_{i}"] = {"linear": _dense_from_linear(sd, base + ".linear"),
                             "norm": p}
        enc_s[f"pfn_{i}"] = {"norm": s}
        i += 1
    if i == 0:
        raise KeyError("no voxel_encoder.pfn_layers.* keys found")
    params["voxel_encoder"] = enc_p
    stats["voxel_encoder"] = enc_s

    # SECOND backbone: blocks.{i} is a flat Sequential
    # [conv, bn, relu, (conv, bn, relu) * layer_num]
    bb_p, bb_s = {}, {}
    i = 0
    while f"backbone.blocks.{i}.0.weight" in sd:
        j = 0
        while f"backbone.blocks.{i}.{3 * j}.weight" in sd:
            bb_p[f"block{i}_conv{j}"] = _conv2d(
                sd, f"backbone.blocks.{i}.{3 * j}")
            p, s = _bn(sd, f"backbone.blocks.{i}.{3 * j + 1}")
            bb_p[f"block{i}_bn{j}"] = p
            bb_s[f"block{i}_bn{j}"] = s
            j += 1
        i += 1
    params["backbone"] = bb_p
    stats["backbone"] = bb_s

    # SECONDFPN neck: deblocks.{i} = [convT-or-conv, bn, relu]
    nk_p, nk_s = {}, {}
    i = 0
    while f"neck.deblocks.{i}.0.weight" in sd:
        w = _t(sd[f"neck.deblocks.{i}.0.weight"])
        # ConvTranspose2d kernel==stride; the stride-1 no-conv branch also
        # uses ConvTranspose2d(k=1). A Conv2d branch (use_conv_for_no_stride)
        # would have weight [out, in, k, k] with out!=in ambiguity resolved
        # by the flax module name present in the target tree; default to
        # transpose mapping, matching the reference defaults.
        nk_p[f"deblock{i}_up"] = _convT2d(sd, f"neck.deblocks.{i}.0")
        p, s = _bn(sd, f"neck.deblocks.{i}.1")
        nk_p[f"deblock{i}_bn"] = p
        nk_s[f"deblock{i}_bn"] = s
        del w
        i += 1
    params["neck"] = nk_p
    stats["neck"] = nk_s

    # Anchor3DHead: 1x1 convs with bias
    for name in ("conv_cls", "conv_reg", "conv_dir_cls"):
        params[name] = _conv2d(sd, f"bbox_head.{name}")

    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path):
    """Load a .pth checkpoint's model state dict as numpy arrays."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def convert_checkpoint(path, model_name="RandLANet", **kwargs):
    """Top-level entry: .pth path -> flax variables for the named model."""
    sd = load_torch_checkpoint(path)
    converters = {"RandLANet": convert_randlanet,
                  "PointPillars": convert_pointpillars}
    if model_name not in converters:
        raise NotImplementedError(
            f"No torch-checkpoint converter for {model_name} yet "
            f"(available: {sorted(converters)})")
    return converters[model_name](sd, **kwargs)
