#!/bin/bash
# Single-host training (all local TPU chips form the mesh automatically).
python scripts/run_pipeline.py \
  -c open3d_ml_tpu/configs/randlanet_semantickitti.yml \
  --dataset.dataset_path "$DATASET_DIR/SemanticKITTI" --split train
