"""Benchmark: RandLA-Net SemanticKITTI-config inference throughput.

Measures end-to-end device throughput of the flagship semseg model at the
real SemanticKITTI patch size (num_points=45056, batch 4), INCLUDING the
on-device KNN/pool/upsample pyramid (which the reference computes on the CPU
in DataLoader workers — here it is part of the XLA program).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (SURVEY.md section
6). We use 1.0e6 points/sec as the reference-CUDA estimate for RandLA-Net
inference on a single modern GPU (45k-point patch in ~45 ms); the BASELINE
target is >=3x that per chip, i.e. vs_baseline >= 3.0.
"""

import json
import time

import numpy as np

REFERENCE_POINTS_PER_SEC = 1.0e6


def main():
    import jax
    import jax.numpy as jnp
    from open3d_ml_tpu.models import RandLANet

    batch_size = 4
    num_points = 45056
    model = RandLANet(num_points=num_points, num_classes=19,
                      ignored_label_inds=[0], in_channels=3, dim_features=8,
                      dim_output=[16, 64, 128, 256],
                      sub_sampling_ratio=[4, 4, 4, 4])
    net = model.get_net()

    rng = np.random.default_rng(0)
    batch = {
        "coords": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
        "features": jnp.asarray(
            rng.uniform(-25, 25, (batch_size, num_points, 3)), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    # jit the init: eager init dispatches hundreds of small programs
    variables = jax.jit(
        lambda b: net.init({"params": key, "dropout": key}, b,
                           training=False))(batch)

    # reduce to a scalar inside the jit and fetch it: on this relay-backed
    # runtime, block_until_ready alone does not reliably force execution.
    fwd = jax.jit(
        lambda v, b: jnp.sum(net.apply(v, b, training=False)))
    float(fwd(variables, batch))  # warmup + compile

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(fwd(variables, batch))
    dt = time.perf_counter() - t0

    points_per_sec = batch_size * num_points * iters / dt
    print(json.dumps({
        "metric": "randlanet_inference_points_per_sec",
        "value": round(points_per_sec, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(points_per_sec / REFERENCE_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
