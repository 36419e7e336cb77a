#!/usr/bin/env bash
# Single-process scene eval smoke (reference scripts/debug_eval.sh).
python launch.py --validate --use_ema \
  --config configs/diffusionGS_scene_eval.yaml \
  data.num_workers=0 trainer.limit_val_batches=2 \
  "$@"
