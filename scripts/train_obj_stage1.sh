#!/usr/bin/env bash
# Object-level stage-1 training (reference scripts/train_obj_stage1.sh).
# TPU-native: one process per host; devices on the host form the data mesh
# automatically (no torchrun). Multi-host: set JAX_COORDINATOR.
python launch.py --train \
  --config configs/diffusionGS_rel.yaml \
  "$@"
