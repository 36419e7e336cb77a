#!/usr/bin/env bash
# Object-level stage-2 training at 512^2, bootstrapped from the stage-1
# checkpoint (reference scripts/train_obj_stage2.sh; set
# system.shape_model.pretrained_model_name_or_path or system.weights).
# TPU-native: one process per host, no torchrun; multi-host via
# JAX_COORDINATOR.
python launch.py --train --use_ema \
  --config configs/diffusionGS_rel_512.yaml \
  "$@"
