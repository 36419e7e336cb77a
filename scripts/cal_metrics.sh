#!/usr/bin/env bash
# Metric computation over eval dumps (reference scripts/cal_metrics.sh).
# Usage: scripts/cal_metrics.sh <result_dir>
python eval_scene_result.py --result_dir "$1" "${@:2}"
