#!/usr/bin/env python
"""Convert a reference model-zoo .pth checkpoint into an orbax checkpoint
this framework's pipelines can resume from.

    python scripts/convert_checkpoint.py model.pth out_dir \
        --model RandLANet [--arch-yml cfg.yml]

Wraps utils/convert_torch.py (all 7 model families) and writes the
{params, batch_stats[, consts], epoch} layout that
SemanticSegmentation/ObjectDetection.load_ckpt restores
(pipelines/semantic_segmentation.py save_ckpt). KPFCNN checkpoints also
carry their kernel-point constants ('kp_points' -> consts).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Conversion is pure host work (torch tensors -> numpy -> orbax); never
# touch an accelerator backend — a TPU relay outage must not hang a
# checkpoint conversion. Must be set before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pth", help="reference .pth checkpoint path")
    parser.add_argument("out", help="output orbax checkpoint dir")
    parser.add_argument("--model", default="RandLANet",
                        help="model family (RandLANet, PointPillars, "
                             "KPFCNN, SparseConvUnet, PointTransformer, "
                             "PVCNN, PointRCNN)")
    parser.add_argument("--arch-yml", default=None,
                        help="experiment YAML supplying the architecture "
                             "list / blocks (KPFCNN, PointTransformer)")
    args = parser.parse_args()

    from open3d_ml_tpu.utils.convert_torch import convert_checkpoint

    kwargs = {}
    if args.arch_yml:
        from open3d_ml_tpu.utils import Config
        model_cfg = Config.load_from_file(args.arch_yml).model
        if args.model in ("KPFCNN", "KPConv"):
            kwargs["architecture"] = list(model_cfg.architecture)
            kwargs["reduce_fc"] = bool(model_cfg.get("reduce_fc", False))
        elif args.model == "PointTransformer":
            kwargs["blocks"] = tuple(model_cfg.get("blocks",
                                                   (2, 2, 2, 2, 2)))
        elif args.model == "SparseConvUnet":
            kwargs["conv_block_reps"] = int(
                model_cfg.get("conv_block_reps", 1))
            kwargs["residual_blocks"] = bool(
                model_cfg.get("residual_blocks", False))

    variables = convert_checkpoint(args.pth, model_name=args.model,
                                   **kwargs)

    import jax
    import orbax.checkpoint as ocp
    ckpt = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "epoch": 0,
    }
    consts = {k: v for k, v in variables.items()
              if k not in ("params", "batch_stats")}
    if consts:
        ckpt["consts"] = jax.device_get(consts)
    out = Path(args.out).absolute()
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(out, ckpt, force=True)
    n = len(jax.tree.leaves(ckpt["params"]))
    print(f"wrote {out} ({args.model}, {n} param tensors)")


if __name__ == "__main__":
    main()
