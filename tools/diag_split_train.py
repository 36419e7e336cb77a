"""A/B the split-stream binning cond in the TRAIN step and 256^2 sampler.

Companion to tools/diag_512_split.py, which found the adaptive
split-binning `lax.cond` costs ~+15 ms/view inside the jitted 30-step
512^2 sampler regardless of population (init 18.10 -> 19.52 s, trained
18.36 -> 19.81 s).  This measures the same knob where the r5 configs also
enabled it: the 256^2 training step (b=1, 4 gen + 10 rendered supervision
views — the real object recipe view count) and the 256^2 sampler.

Usage: python tools/diag_split_train.py [--what train,sample]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="train,sample")
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()

    import bench as bench_mod

    bench_mod.wait_for_device()
    h = w = args.res
    out = {}

    if "train" in args.what:
        for split in (False, True):
            ms, _, _ = bench_mod.bench_train_step(
                h, w, n_views=4, sup_views=10, iters=6, b=1, split=split)
            out[f"train_10v_ms_split{2 if split else 0}"] = round(ms, 1)
            print(json.dumps(out), flush=True)

    if "sample" in args.what:
        for split in (False, True):
            s, c = bench_mod.bench_sample(h, w, 4, 30, split=split)
            out[f"sample_{h}_s_split{2 if split else 0}"] = round(s, 3)
            out[f"compile_split{2 if split else 0}_s"] = round(c, 1)
            print(json.dumps(out), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
