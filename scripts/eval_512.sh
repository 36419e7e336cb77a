#!/usr/bin/env bash
# Scene evaluation with the 512^2 checkpoint (reference scripts/eval_512.sh).
python launch.py --validate --use_ema \
  --config configs/diffusionGS_scene_eval_512.yaml \
  "$@"
