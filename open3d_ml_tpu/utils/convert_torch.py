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
    if w.ndim == 4:  # 1x1 Conv2d
        w = w[:, :, 0, 0]
    elif w.ndim == 3:  # 1x1 Conv1d
        w = w[:, :, 0]
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


def _prune_empty(tree):
    """Drop empty sub-dicts so the converted tree matches net.init exactly
    (flax only materializes collections for modules that create variables)."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        pv = _prune_empty(v)
        if not (isinstance(pv, dict) and len(pv) == 0):
            out[k] = pv
    return out


def convert_kpfcnn(state_dict, architecture=None, reduce_fc=False):
    """Map a reference KPFCNN state_dict (kpconv.py:29-296 module layout:
    encoder_blocks/decoder_blocks ModuleLists + head) to this framework's
    BatchedNet(KPFCNNNet) variables.

    The architecture list drives both module stacks identically on the two
    sides (reference kpconv.py:146-227; ours models/kpconv.py KPFCNNNet), so
    indices line up one-to-one — including param-free pool/upsample entries.
    KPConv ``weights`` are [P, Cin, Cout] on both sides (direct copy) and
    the checkpoint's own ``kernel_points`` buffers (randomly optimized at
    training time, kpconv.py:990-1003) land in the "kp_points" collection,
    replacing the Lloyd-generated defaults — required for logit parity.

    Returns {"params", "batch_stats", "kp_points"} ready for net.apply.
    """
    if architecture is None:
        architecture = [
            "simple", "resnetb", "resnetb_strided", "resnetb", "resnetb",
            "resnetb_strided", "resnetb", "resnetb", "resnetb_strided",
            "resnetb", "resnetb", "resnetb_strided", "resnetb",
            "nearest_upsample", "unary", "nearest_upsample", "unary",
            "nearest_upsample", "unary", "nearest_upsample", "unary"
        ]
    sd = dict(state_dict)
    params, stats, kpp = {}, {}, {}

    def bn_or_bias(tp, prefix):
        """reference BatchNormBlock at `tp` -> (params, stats) under our
        `{prefix}_bn` / `{prefix}_bias` naming."""
        if tp + ".batch_norm.weight" in sd:
            p, s = _bn(sd, tp + ".batch_norm")
            return {f"{prefix}_bn": p}, {f"{prefix}_bn": s}
        return {f"{prefix}_bias": _t(sd[tp + ".bias"])}, {}

    def unary(tp):
        p = {"mlp": {"kernel": _t(sd[tp + ".mlp.weight"]).T}}
        bp, bs = bn_or_bias(tp + ".batch_norm", "unary")
        p.update(bp)
        return p, bs

    def kpconv_op(tp):
        p = {"weights": _t(sd[tp + ".weights"])}
        kp = {"points": _t(sd[tp + ".kernel_points"])}
        if tp + ".offset_bias" in sd:  # deformable
            p["offset_bias"] = _t(sd[tp + ".offset_bias"])
            p["offset_conv"] = {
                "weights": _t(sd[tp + ".offset_conv.weights"])}
            kp["offset_conv"] = {
                "points": _t(sd[tp + ".offset_conv.kernel_points"])}
        return p, kp

    # find the encoder/decoder split exactly like both constructions do
    start_i = next(i for i, b in enumerate(architecture) if "upsample" in b)

    for i, block in enumerate(architecture[:start_i]):
        tp = f"encoder_blocks.{i}"
        name = f"enc{i}"
        if "simple" in block:
            kc, kp = kpconv_op(tp + ".KPConv")
            bp, bs = bn_or_bias(tp + ".batch_norm", "simple")
            params[name] = {"KPConv": kc, **bp}
            stats[name] = bs
            kpp[name] = {"KPConv": kp}
        elif "resnetb" in block:
            p, s, k = {}, {}, {}
            if tp + ".unary1.mlp.weight" in sd:
                p["unary1"], s1 = unary(tp + ".unary1")
                s.update({"unary1": s1} if s1 else {})
            kc, kp = kpconv_op(tp + ".KPConv")
            p["KPConv"] = kc
            k["KPConv"] = kp
            bp, bs = bn_or_bias(tp + ".batch_norm_conv", "conv")
            p.update(bp)
            s.update(bs)
            p["unary2"], s2 = unary(tp + ".unary2")
            if s2:
                s["unary2"] = s2
            if tp + ".unary_shortcut.mlp.weight" in sd:
                p["unary_shortcut"], s3 = unary(tp + ".unary_shortcut")
                if s3:
                    s["unary_shortcut"] = s3
            params[name] = p
            stats[name] = s
            kpp[name] = k
        elif block == "unary":
            params[name], s = unary(tp)
            stats[name] = s
        # pool/strided-pool entries consume an index but carry no params

    dec_i = 0
    for i, block in enumerate(architecture[start_i:]):
        if block == "unary":
            tp = f"decoder_blocks.{i}"
            params[f"dec{dec_i}"], s = unary(tp)
            stats[f"dec{dec_i}"] = s
        dec_i += 1

    params["head_mlp"], s = unary("head_mlp")
    stats["head_mlp"] = s
    params["head_softmax"], s = unary("head_softmax")
    stats["head_softmax"] = s

    return _prune_empty({"params": {"net": params},
                         "batch_stats": {"net": stats},
                         "kp_points": {"net": kpp}})


def _sparse_kernel(sd, key, spatial_axes="zyx"):
    """open3d SparseConv kernel [d, h, w, Cin, Cout] -> [K, Cin, Cout] in
    this framework's x-fastest offset enumeration (ops/sparse.py
    kernel_offsets: z-major, x-fastest — identical to a C-order flatten of
    a [z][y][x] kernel). spatial_axes="xyz" reverses the spatial axes first
    for checkpoints stored x-major."""
    w = _t(sd[key])
    if w.ndim == 3:  # already flat [K, Cin, Cout]
        return w
    if spatial_axes == "xyz":
        w = w.transpose(2, 1, 0, 3, 4)
    return w.reshape(-1, w.shape[-2], w.shape[-1])


def convert_sparseconvunet(state_dict, num_levels=7, conv_block_reps=1,
                           residual_blocks=False, spatial_axes="zyx"):
    """Map a reference SparseConvUnet state_dict (sparseconvnet.py:13-73 +
    UNet.get_UNet :595-630 flattened ModuleList layout) to this framework's
    BatchedNet(SparseConvUnetNet) variables.

    The reference flattens its recursive U into ``unet.net.{i}`` indices;
    this walks the same recursion to assign each index to the corresponding
    level-tagged module here (l{L}_block/post{r}, l{L}_down/up kernels).
    BatchNormBlock (eps=1e-4, momentum 0.01; sparseconvnet.py:227-231) maps
    onto MaskedBatchNorm params/stats; SparseConv `.net.offset` buffers are
    fixed geometry constants and are dropped.

    Returns {"params", "batch_stats"} ready for net.apply.
    """
    sd = dict(state_dict)
    params, stats = {}, {}

    def bn(tp):
        p = {"scale": _t(sd[tp + ".bn.weight"]),
             "bias": _t(sd[tp + ".bn.bias"])}
        s = {"mean": _t(sd[tp + ".bn.running_mean"]),
             "var": _t(sd[tp + ".bn.running_var"])}
        return p, s

    def conv(tp):
        return {"kernel": _sparse_kernel(sd, tp + ".net.kernel",
                                         spatial_axes)}

    idx = [0]  # flat unet.net index, shared across the recursion

    def take():
        i = idx[0]
        idx[0] += 1
        return f"unet.net.{i}"

    def block(name):
        """One UNet.block occurrence -> my SCBlock / ResidualSCBlock."""
        p, s = {}, {}
        if residual_blocks:
            tp = take()  # ResidualBlock
            if tp + ".lin.linear.weight" in sd:
                p["lin"] = {"kernel": _t(sd[tp + ".lin.linear.weight"]).T}
            p["bn1"], s["bn1"] = bn(tp + ".batch_norm1")
            p["conv1"] = conv(tp + ".sub_sparse_conv1")
            p["bn2"], s["bn2"] = bn(tp + ".batch_norm2")
            p["conv2"] = conv(tp + ".sub_sparse_conv2")
        else:
            tp_bn = take()   # BatchNormBlock
            take()           # ReLUBlock (no params)
            tp_conv = take()  # SubmanifoldSparseConv
            p["bn"], s["bn"] = bn(tp_bn)
            p["conv"] = conv(tp_conv)
        params[name] = p
        stats[name] = s

    def walk(level):
        for r in range(conv_block_reps):
            block(f"l{level}_block{r}")
        if level == num_levels - 1:
            return
        take()  # ConcatFeat
        tp_bn = take()  # BatchNormBlock before down conv
        take()  # ReLU
        tp_dn = take()  # Convolution k2 s2
        params[f"l{level}_down_bn"], stats[f"l{level}_down_bn"] = bn(tp_bn)
        params[f"l{level}_down_kernel"] = _sparse_kernel(
            sd, tp_dn + ".net.kernel", spatial_axes)
        walk(level + 1)
        tp_bn = take()  # BatchNormBlock before up deconv
        take()  # ReLU
        tp_up = take()  # DeConvolution k2
        params[f"l{level}_up_bn"], stats[f"l{level}_up_bn"] = bn(tp_bn)
        params[f"l{level}_up_kernel"] = _sparse_kernel(
            sd, tp_up + ".net.kernel", spatial_axes)
        take()  # JoinFeat
        for r in range(conv_block_reps):
            block(f"l{level}_post{r}")

    params["input_conv"] = conv("sub_sparse_conv")
    walk(0)
    params["final_bn"], stats["final_bn"] = bn("batch_norm")
    params["linear"] = {"kernel": _t(sd["linear.linear.weight"]).T,
                        "bias": _t(sd["linear.linear.bias"])}

    return _prune_empty({"params": {"net": params},
                         "batch_stats": {"net": stats}})


def convert_pointtransformer(state_dict, blocks=(2, 2, 2, 2, 2)):
    """Map a reference PointTransformer state_dict (point_transformer.py:
    58-87 encoders/decoders ModuleLists + cls Sequential) to this
    framework's BatchedNet(PointTransformerNet) variables.

    encoders.{i} = [TransitionDown, Bottleneck x (blocks[i]-1)] maps to
    enc{i}_down / enc{i}_block{b}; decoders are built i=4..0 (reference
    :75-82), so decoders.{4-i} maps to dec{i}_up / dec{i}_block1; the
    Transformer's torch Sequentials linear_p/.0/.1/.3 and linear_w
    /.0/.2/.3/.5 map to linear_p0/linear_p_bn/linear_p1 and
    linear_w_bn0/linear_w0/linear_w_bn1/linear_w1.

    Returns {"params", "batch_stats"} ready for net.apply.
    """
    sd = dict(state_dict)
    params, stats = {}, {}

    def lin(tp):
        return _dense_from_linear(sd, tp)

    def bn(tp):
        p, s = _bn(sd, tp)
        return p, s

    def transformer(tp):
        p, s = {}, {}
        for k in ("linear_q", "linear_k", "linear_v"):
            p[k] = lin(f"{tp}.{k}")
        p["linear_p0"] = lin(tp + ".linear_p.0")
        p["linear_p_bn"], s["linear_p_bn"] = bn(tp + ".linear_p.1")
        p["linear_p1"] = lin(tp + ".linear_p.3")
        p["linear_w_bn0"], s["linear_w_bn0"] = bn(tp + ".linear_w.0")
        p["linear_w0"] = lin(tp + ".linear_w.2")
        p["linear_w_bn1"], s["linear_w_bn1"] = bn(tp + ".linear_w.3")
        p["linear_w1"] = lin(tp + ".linear_w.5")
        return p, s

    def bottleneck(tp):
        p, s = {}, {}
        p["linear1"] = lin(tp + ".linear1")
        p["bn1"], s["bn1"] = bn(tp + ".bn1")
        p["transformer2"], st = transformer(tp + ".transformer2")
        s["transformer2"] = st
        p["bn2"], s["bn2"] = bn(tp + ".bn2")
        p["linear3"] = lin(tp + ".linear3")
        p["bn3"], s["bn3"] = bn(tp + ".bn3")
        return p, s

    for i in range(5):
        tp = f"encoders.{i}.0"
        params[f"enc{i}_down"] = {"linear": lin(tp + ".linear")}
        bp, bs = bn(tp + ".bn")
        params[f"enc{i}_down"]["bn"] = bp
        stats[f"enc{i}_down"] = {"bn": bs}
        for b in range(1, blocks[i]):
            params[f"enc{i}_block{b}"], stats[f"enc{i}_block{b}"] = \
                bottleneck(f"encoders.{i}.{b}")

    for i in range(4, -1, -1):
        d = 4 - i
        tp = f"decoders.{d}.0"
        up_p, up_s = {}, {}
        up_p["linear1"] = lin(tp + ".linear1.0")
        up_p["bn1"], up_s["bn1"] = bn(tp + ".linear1.1")
        up_p["linear2"] = lin(tp + ".linear2.0")
        if tp + ".linear2.1.weight" in sd:  # non-head: BN'd skip branch
            up_p["bn2"], up_s["bn2"] = bn(tp + ".linear2.1")
        params[f"dec{i}_up"] = up_p
        stats[f"dec{i}_up"] = up_s
        params[f"dec{i}_block1"], stats[f"dec{i}_block1"] = \
            bottleneck(f"decoders.{d}.1")

    params["cls0"] = lin("cls.0")
    params["cls_bn"], stats["cls_bn"] = bn("cls.1")
    params["cls1"] = lin("cls.3")

    return _prune_empty({"params": {"net": params},
                         "batch_stats": {"net": stats}})


def convert_pvcnn(state_dict, width_multiplier=1):
    """Map a reference PVCNN state_dict (pvcnn.py:107-134: point_features
    ModuleList of PVConv/SharedMLP, cloud_features/classifier Sequentials)
    to this framework's BatchedNet(PVCNNNet) variables.

    Conv3d [out, in, kd, kh, kw] -> flax NDHWC kernel [kd, kh, kw, in, out]
    (both sides quantize coords to the grid in the same x,y,z axis order);
    SharedMLP's 1x1 Conv1d -> Dense. Reference uses with_se=False
    (pvcnn.py:114), so no SE keys exist in zoo checkpoints.

    Returns {"params", "batch_stats"} ready for net.apply.
    """
    sd = dict(state_dict)
    params, stats = {}, {}

    def bn(tp):
        return _bn(sd, tp)

    def conv3d(tp):
        w = _t(sd[tp + ".weight"])  # [out, in, kd, kh, kw]
        out = {"kernel": w.transpose(2, 3, 4, 1, 0)}
        if tp + ".bias" in sd:
            out["bias"] = _t(sd[tp + ".bias"])
        return out

    def shared_mlp(tp):
        """torch SharedMLP(.layers Sequential) -> flax SharedMLP
        (dense_0/bn_0)."""
        p = {"dense_0": _dense_from_linear(sd, tp + ".layers.0")}
        bp, bs = bn(tp + ".layers.1")
        p["bn_0"] = bp
        return p, {"bn_0": bs}

    def pvconv(tp):
        p, s = {}, {}
        for i in range(2):
            p[f"vconv{i}"] = conv3d(f"{tp}.voxel_layers.{3 * i}")
            bp, bs = bn(f"{tp}.voxel_layers.{3 * i + 1}")
            p[f"vbn{i}"] = bp
            s[f"vbn{i}"] = bs
        pf, pfs = shared_mlp(tp + ".point_features")
        p["point_features"] = pf
        s["point_features"] = pfs
        return p, s

    li = 0
    blocks = ((64, 1, 32), (64, 2, 16), (128, 1, 16), (1024, 1, None))
    for _, num_blocks, res in blocks:
        for _ in range(num_blocks):
            tp = f"point_features.{li}"
            if res is None:
                params[f"pf{li}"], stats[f"pf{li}"] = shared_mlp(tp)
            else:
                params[f"pf{li}"], stats[f"pf{li}"] = pvconv(tp)
            li += 1

    for j in range(2):  # cloud_features: _linear_bn_relu pairs
        params[f"cloud{j}"] = _dense_from_linear(sd,
                                                 f"cloud_features.{j}.0")
        bp, bs = bn(f"cloud_features.{j}.1")
        params[f"cloud_bn{j}"] = bp
        stats[f"cloud_bn{j}"] = bs

    # classifier: [SharedMLP, Dropout, SharedMLP, Dropout, Conv1d]
    params["cls0"], stats["cls0"] = shared_mlp("classifier.0")
    params["cls1"], stats["cls1"] = shared_mlp("classifier.2")
    params["cls2"] = _dense_from_linear(sd, "classifier.4")

    return _prune_empty({"params": {"net": params},
                         "batch_stats": {"net": stats}})


def convert_pointrcnn(state_dict):
    """Map a reference PointRCNN state_dict (point_rcnn.py:616-835: RPN =
    Pointnet2MSG backbone + Conv1d/BN head stacks; RCNN = SA modules +
    gen_CNN xyz_up/merge_down + plain Conv1d heads) to this framework's
    PointRCNNNet variables.

    Index discovery is key-driven (the reference's Sequential strides: RPN
    heads pack [conv, bn, relu, dropout] per block = stride 4; RCNN heads
    [conv, relu] = stride 2). pt_utils SharedMLP convs live at
    `...layer{k}.conv` with BN at `...layer{k}.bn.bn`
    (pytorch_utils.py:48-132). ProposalLayer/TargetLayer carry no params.

    Returns {"params", "batch_stats"} ready for net.apply (no BatchedNet
    wrapper: PointRCNNNet batches internally).
    """
    sd = dict(state_dict)
    params = {"rpn": {}, "rcnn": {}}
    stats = {"rpn": {}, "rcnn": {}}

    def shared_mlp(tp):
        """pt_utils.SharedMLP at `tp` -> my SharedMLP2d conv{k}/bn{k}."""
        p, s = {}, {}
        k = 0
        while f"{tp}.layer{k}.conv.weight" in sd:
            p[f"conv{k}"] = _dense_from_linear(sd, f"{tp}.layer{k}.conv")
            if f"{tp}.layer{k}.bn.bn.weight" in sd:
                bp, bs = _bn(sd, f"{tp}.layer{k}.bn.bn")
                p[f"bn{k}"] = bp
                s[f"bn{k}"] = bs
            k += 1
        if k == 0:
            raise KeyError(f"no {tp}.layer0.conv.weight")
        return p, s

    def head(tp, stride, with_bn):
        """Sequential head stack -> my _ConvHead conv{i}/bn{i}/final."""
        p, s = {}, {}
        i = 0
        while f"{tp}.{stride * (i + 1)}.weight" in sd:
            p[f"conv{i}"] = _dense_from_linear(sd, f"{tp}.{stride * i}")
            if with_bn:
                bp, bs = _bn(sd, f"{tp}.{stride * i + 1}")
                p[f"bn{i}"] = bp
                s[f"bn{i}"] = bs
            i += 1
        p["final"] = _dense_from_linear(sd, f"{tp}.{stride * i}")
        return p, s

    # ---- RPN backbone (Pointnet2MSG)
    bb_p, bb_s = {}, {}
    i = 0
    while f"rpn.backbone.SA_modules.{i}.mlps.0.layer0.conv.weight" in sd:
        sa_p, sa_s = {}, {}
        j = 0
        while f"rpn.backbone.SA_modules.{i}.mlps.{j}.layer0.conv.weight" \
                in sd:
            sa_p[f"mlp{j}"], sa_s[f"mlp{j}"] = shared_mlp(
                f"rpn.backbone.SA_modules.{i}.mlps.{j}")
            j += 1
        bb_p[f"sa{i}"] = sa_p
        bb_s[f"sa{i}"] = sa_s
        i += 1
    i = 0
    while f"rpn.backbone.FP_modules.{i}.mlp.layer0.conv.weight" in sd:
        mp, ms = shared_mlp(f"rpn.backbone.FP_modules.{i}.mlp")
        bb_p[f"fp{i}"] = {"mlp": mp}
        bb_s[f"fp{i}"] = {"mlp": ms}
        i += 1
    params["rpn"]["backbone"] = bb_p
    stats["rpn"]["backbone"] = bb_s

    for name in ("cls_blocks", "reg_blocks"):
        p, s = head(f"rpn.{name}", 4, with_bn=True)
        params["rpn"][name] = p
        stats["rpn"][name] = s

    # ---- RCNN
    params["rcnn"]["xyz_up_layer"] = {}
    i = 0
    while f"rcnn.xyz_up_layer.{2 * i}.weight" in sd:
        params["rcnn"]["xyz_up_layer"][f"conv{i}"] = _dense_from_linear(
            sd, f"rcnn.xyz_up_layer.{2 * i}")
        i += 1
    params["rcnn"]["merge_down_layer"] = {
        "conv0": _dense_from_linear(sd, "rcnn.merge_down_layer.0")}

    i = 0
    while f"rcnn.SA_modules.{i}.mlps.0.layer0.conv.weight" in sd:
        mp, ms = shared_mlp(f"rcnn.SA_modules.{i}.mlps.0")
        params["rcnn"][f"sa{i}"] = {"mlp0": mp}
        stats["rcnn"][f"sa{i}"] = {"mlp0": ms}
        i += 1

    for name in ("cls_blocks", "reg_blocks"):
        p, s = head(f"rcnn.{name}", 2, with_bn=False)
        params["rcnn"][name] = p
        stats["rcnn"][name] = s

    return _prune_empty({"params": params, "batch_stats": stats})


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
                  "PointPillars": convert_pointpillars,
                  "KPFCNN": convert_kpfcnn,
                  "KPConv": convert_kpfcnn,
                  "SparseConvUnet": convert_sparseconvunet,
                  "PointTransformer": convert_pointtransformer,
                  "PVCNN": convert_pvcnn}
    if model_name not in converters:
        raise NotImplementedError(
            f"No torch-checkpoint converter for {model_name} yet "
            f"(available: {sorted(converters)})")
    return converters[model_name](sd, **kwargs)
