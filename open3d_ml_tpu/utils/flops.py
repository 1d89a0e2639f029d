"""Analytic model-FLOPs accounting for the benched forwards.

MFU = model_flops / (wall_time * peak_flops): the numerator counts only the
*algorithmic* dense/conv matmul work (2*rows*Cin*Cout per Dense,
2*H*W*Cin*Cout*kh*kw per conv) — NOT the one-hot gather matmuls the fused
execution strategy spends to avoid latency-bound HBM gathers, and not
elementwise/BN/softmax work. This matches the standard MFU convention
(model FLOPs over peak), so low numbers for gather-dominated point-cloud
nets are expected and honest: the gap between MFU and hardware utilization
IS the cost of neighbor structure.

The reference publishes no FLOPs/MFU accounting (SURVEY.md §6); this is a
rebuild-specific requirement (VERDICT r2, Missing #2).
"""


def _dense(rows, cin, cout):
    return 2.0 * rows * cin * cout


def _conv2d(h_out, w_out, cin, cout, kh=3, kw=3):
    return 2.0 * h_out * w_out * cin * cout * kh * kw


def randlanet_forward_flops(num_points,
                            num_neighbors=16,
                            dim_output=(16, 64, 128, 256),
                            dim_features=8,
                            in_channels=3,
                            sub_sampling_ratio=(4, 4, 4, 4),
                            num_classes=19,
                            batch_size=1):
    """Dense-layer FLOPs of one RandLA-Net forward (models/randlanet.py).

    Counts every nn.Dense in the net at its true row count (per-level
    point counts n_i = N / prod(ratios), K-axis layers at n_i*K rows).
    Neighbor search / gather / pool / upsample work is excluded (see
    module docstring).
    """
    k = num_neighbors
    dims = list(dim_output)
    ratios = list(sub_sampling_ratio)
    n_lvl = [num_points]
    for r in ratios:
        n_lvl.append(n_lvl[-1] // r)

    total = _dense(n_lvl[0], in_channels, dim_features)  # fc0
    f_in = dim_features
    for i, d in enumerate(dims):
        n = n_lvl[i]
        total += _dense(n, f_in, d // 2)            # mlp1
        total += _dense(n * k, 10, d // 2)          # lse1.mlp (rel feats)
        total += _dense(n * k, d, d)                # pool1.score_fn
        total += _dense(n, d, d // 2)               # pool1.mlp
        total += _dense(n * k, d // 2, d // 2)      # lse2.mlp
        total += _dense(n * k, d, d)                # pool2.score_fn
        total += _dense(n, d, d)                    # pool2.mlp
        total += _dense(n, d, 2 * d)                # mlp2
        total += _dense(n, f_in, 2 * d)             # shortcut
        f_in = 2 * d

    total += _dense(n_lvl[-1], 2 * dims[-1], 2 * dims[-1])  # bottleneck mlp

    # decoder: skip dims at levels [0..4] are
    # [2*d0 (pre-pool), 2*d0, 2*d1, 2*d2, 2*d3]
    enc_dims = [2 * dims[0]] + [2 * d for d in dims]
    f = 2 * dims[-1]
    for i in range(len(dims)):
        target = enc_dims[-i - 2]
        n = n_lvl[len(dims) - i - 1]
        total += _dense(n, target + f, target)
        f = target

    total += _dense(n_lvl[0], f, 64)                # fc1_0
    total += _dense(n_lvl[0], 64, 32)               # fc1_1
    total += _dense(n_lvl[0], 32, num_classes)      # fc1_3
    return total * batch_size


def pointpillars_forward_flops(max_points=32768,
                               feat_channels=(64,),
                               output_shape=(496, 432),
                               backbone=None,
                               neck=None,
                               num_classes=3,
                               num_anchors=6,
                               batch_size=1):
    """Dense/conv FLOPs of one PointPillars forward
    (models/point_pillars.py: point-major PFN -> SECOND -> FPN -> head).

    The PFN runs over the static max_points rows (the program's real row
    count — padded rows are computed and masked, exactly what the chip
    executes).
    """
    backbone = dict(backbone or {})
    neck = dict(neck or {})
    out_ch = list(backbone.get("out_channels", (64, 128, 256)))
    layer_nums = list(backbone.get("layer_nums", (3, 5, 5)))
    strides = list(backbone.get("layer_strides", (2, 2, 2)))
    n_out = list(neck.get("out_channels", (128, 128, 128)))
    n_up = list(neck.get("upsample_strides", (1, 2, 4)))

    total = 0.0
    # PFN: Dense 9 -> feat_channels chain over all points (decorated
    # features: xyzr + cluster-delta(3) + center-delta(2) = 9)
    cin = 9
    for i, ch in enumerate(feat_channels):
        units = ch if i == len(feat_channels) - 1 else ch // 2
        total += _dense(max_points, cin, units)
        cin = units

    # SECOND backbone
    h, w = output_shape
    cin = feat_channels[-1]
    feat_hw = []
    for i, num in enumerate(layer_nums):
        h, w = h // strides[i], w // strides[i]
        total += _conv2d(h, w, cin, out_ch[i])
        for _ in range(num):
            total += _conv2d(h, w, out_ch[i], out_ch[i])
        cin = out_ch[i]
        feat_hw.append((h, w))

    # FPN: ConvTranspose k=s counts 2*H_in*W_in*k^2*Cin*Cout
    for i, s in enumerate(n_up):
        h, w = feat_hw[i]
        if s >= 1:
            total += _conv2d(h, w, out_ch[i], n_out[i], kh=s, kw=s)
        else:
            ss = int(round(1 / s))
            total += _conv2d(h // ss, w // ss, out_ch[i], n_out[i],
                             kh=ss, kw=ss)

    # head: three 1x1 convs at the first (finest) FPN map size
    h, w = feat_hw[0]
    c = sum(n_out)
    total += _conv2d(h, w, c, num_anchors * num_classes, 1, 1)
    total += _conv2d(h, w, c, num_anchors * 7, 1, 1)
    total += _conv2d(h, w, c, num_anchors * 2, 1, 1)
    return total * batch_size


# bf16 peak matmul FLOP/s per chip by device_kind substring. The bench
# divides by the matched entry; unknown kinds fall back to v5p.
TPU_PEAK_BF16 = {
    "v6": 918e12,        # Trillium
    "v5p": 459e12,
    "v5 lite": 197e12,   # v5e device_kind is "TPU v5 lite"
    "v5e": 197e12,
    "v4": 275e12,
    "v3": 123e12,
}
DEFAULT_PEAK_BF16 = 459e12


def peak_flops_for(device_kind):
    """Map a jax device_kind string to bf16 peak FLOP/s (best-effort)."""
    kind = (device_kind or "").lower()
    for key, val in TPU_PEAK_BF16.items():
        if key in kind:
            return val
    return DEFAULT_PEAK_BF16
