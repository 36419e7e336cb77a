#!/usr/bin/env bash
# Scene-level training on RealEstate10K (reference scripts/train_scene_stage2.sh).
python launch.py --train \
  --config configs/diffusionGS_scene.yaml \
  "$@"
