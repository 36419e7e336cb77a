#!/usr/bin/env bash
# Scene-level 512^2 training (reference scripts/train_scene_stage1.sh
# runs diffusionGS_scene_512.yaml).
python launch.py --train --use_ema \
  --config configs/diffusionGS_scene_512.yaml \
  "$@"
