#!/usr/bin/env bash
# Scene evaluation (reference scripts/eval.sh): writes npz result dumps.
python launch.py --validate --use_ema \
  --config configs/diffusionGS_scene_eval.yaml \
  "$@"
