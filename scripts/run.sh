#!/usr/bin/env bash
# Single-image -> 3D demo (reference scripts/run.sh).
python run.py "$@"
