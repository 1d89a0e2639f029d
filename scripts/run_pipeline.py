#!/usr/bin/env python
"""CLI: train/test/inference driver.

Rebuild of /root/reference/scripts/run_pipeline.py:15-260 for the single JAX
backend. The reference's torch.multiprocessing.spawn + DDP plumbing
(:195-260) is gone: a single program spans all chips via the device mesh; on
multi-host pods, launch one process per host and pass --distributed to call
jax.distributed.initialize().

Usage:
    python scripts/run_pipeline.py -c cfg.yml --split train \
        --dataset.dataset_path /data [--pipeline.x.y val ...]
"""

import argparse
import logging
import sys
from pathlib import Path

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from open3d_ml_tpu.utils import Config, get_module


def parse_args():
    parser = argparse.ArgumentParser(
        description="Train/test 3D perception pipelines",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--framework", default="jax",
                        help="ignored (single JAX backend); kept for "
                             "reference-CLI compatibility")
    parser.add_argument("-c", "--cfg_file", help="path to the config file")
    parser.add_argument("-m", "--model", help="network model name")
    parser.add_argument("-p", "--pipeline", default="SemanticSegmentation",
                        help="pipeline name")
    parser.add_argument("-d", "--dataset", help="dataset name")
    parser.add_argument("--cfg_model", help="path to model config")
    parser.add_argument("--cfg_pipeline", help="path to pipeline config")
    parser.add_argument("--cfg_dataset", help="path to dataset config")
    parser.add_argument("--dataset_path", help="path to the dataset root")
    parser.add_argument("--ckpt_path", help="path to a checkpoint")
    parser.add_argument("--device", default="tpu",
                        help="tpu | cpu")
    parser.add_argument("--split", default="train",
                        help="train | valid | test")
    parser.add_argument("--mode", default=None, help="model-specific mode "
                        "(e.g. RPN | RCNN for PointRCNN stage-wise training)")
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--main_log_dir", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() (multi-host)")

    args, unknown = parser.parse_known_args()

    parser_extra = argparse.ArgumentParser(add_help=False)
    for arg in unknown:
        if arg.startswith(("--")):
            parser_extra.add_argument(arg.split("=")[0])
    extra_ns, _ = parser_extra.parse_known_args(unknown)
    extra = {k: v for k, v in vars(extra_ns).items() if v is not None}
    return args, extra


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname)s - %(asctime)s - %(module)s - %(message)s")
    args, extra_dict = parse_args()

    import os
    if os.environ.get("OPEN3D_ML_TPU_FORCE_CPU") or \
            args.device == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        import jax
        jax.distributed.initialize()

    rng = np.random.default_rng(args.seed)

    if args.cfg_file is not None:
        cfg = Config.load_from_file(args.cfg_file)
        if args.mode is not None:
            extra_dict["model.mode"] = args.mode
        cfg_dataset, cfg_model, cfg_pipeline = Config.merge_cfg_file(
            cfg, args, extra_dict)

        Pipeline = get_module("pipeline", cfg.pipeline.name)
        Model = get_module("model", cfg.model.name)
        Dataset = get_module("dataset", cfg.dataset.name)

        ds_kwargs = cfg_dataset.to_dict()
        model_kwargs = cfg_model.to_dict()
        pipe_kwargs = cfg_pipeline.to_dict()
        model_kwargs.setdefault("seed", int(rng.integers(1 << 31)))
        pipe_kwargs.setdefault("seed", int(rng.integers(1 << 31)))
        dataset = Dataset(**ds_kwargs)
        model = Model(**model_kwargs)
        pipeline = Pipeline(model, dataset, **pipe_kwargs)
    else:
        if args.pipeline is None or args.model is None or \
                args.dataset is None:
            raise ValueError("Provide -c cfg.yml or all of "
                             "--pipeline/--model/--dataset")
        Pipeline = get_module("pipeline", args.pipeline)
        Model = get_module("model", args.model)
        Dataset = get_module("dataset", args.dataset)
        dataset = Dataset(dataset_path=args.dataset_path)
        model = Model(ckpt_path=args.ckpt_path)
        pipeline = Pipeline(model, dataset,
                            main_log_dir=args.main_log_dir or "./logs")

    split = args.split
    if split in ("train", "training"):
        pipeline.run_train()
    elif split in ("valid", "validation"):
        pipeline.run_valid() if hasattr(pipeline, "run_valid") \
            else pipeline.run_test()
    else:
        pipeline.run_test()


if __name__ == "__main__":
    main()
