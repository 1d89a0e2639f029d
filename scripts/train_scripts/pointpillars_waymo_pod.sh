#!/bin/bash
# Multi-host TPU pod training: run this same script on EVERY host of the
# slice (e.g. via gcloud compute tpus tpu-vm ssh --worker=all). JAX picks up
# the pod topology from the TPU runtime; --distributed calls
# jax.distributed.initialize(). (Replaces the reference's SLURM +
# torch.multiprocessing DDP template, scripts/train_scripts/
# pointpillars_waymo.sh.)
python scripts/run_pipeline.py \
  -c open3d_ml_tpu/configs/pointpillars_waymo.yml \
  --dataset.dataset_path "$DATASET_DIR/Waymo" --split train \
  --distributed \
  --pipeline.batch_size 32
