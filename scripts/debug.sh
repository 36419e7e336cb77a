#!/usr/bin/env bash
# 1-device smoke training (reference scripts/debug.sh).
python launch.py --train --max_steps 3 \
  --config configs/diffusionGS_rel.yaml \
  "$@"
