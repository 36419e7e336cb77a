"""Summarize a trial dir's metrics.csv / eval_metrics.csv into the
markdown evidence blocks docs/CONVERGENCE.md carries (VERDICT r4 #1: the
at-scale story must be written down, curves included).

Usage: python tools/summarize_run.py outputs/convergence_r5/run2@...
"""

from __future__ import annotations

import csv
import os
import sys


def read(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [
            {k: float(v) for k, v in row.items()}
            for row in csv.DictReader(f)
        ]


def main():
    trial = sys.argv[1]
    train = read(os.path.join(trial, "metrics.csv"))
    evals = read(os.path.join(trial, "eval_metrics.csv"))
    if not train:
        raise SystemExit(f"no metrics.csv under {trial}")

    def col(rows, k):
        return [r[k] for r in rows if k in r]

    print(f"trial: {trial}")
    print(f"train rows: {len(train)} (steps {int(train[0]['step'])}.."
          f"{int(train[-1]['step'])}); eval rows: {len(evals)}")

    sps = col(train, "steps_per_sec")
    if sps:
        mid = sorted(sps)[len(sps) // 2]
        print(f"steps_per_sec median {mid:.2f} "
              f"({1e3 / mid:.0f} ms/step)")

    # eval table, decimated to ~12 rows
    if evals:
        keep = evals[:: max(1, len(evals) // 12)]
        if keep[-1] is not evals[-1]:
            keep.append(evals[-1])
        print("\n| step | eval PSNR | loss | overflow_frac |")
        print("|---|---|---|---|")
        for r in keep:
            print(f"| {int(r['step'])} | {r['psnr']:.2f} | "
                  f"{r['loss']:.4f} | {r['overflow_frac']:.3f} |")
        ps = col(evals, "psnr")
        lo_i = ps.index(min(ps))
        print(f"\neval PSNR min {min(ps):.2f} (step "
              f"{int(evals[lo_i]['step'])}) -> final {ps[-1]:.2f} "
              f"(climb +{ps[-1] - min(ps):.2f} dB); max {max(ps):.2f}")
        of = col(evals, "overflow_frac")
        print(f"overflow_frac first {of[0]:.3f} -> final {of[-1]:.3f}")
        ot = col(evals, "overflow_tiles")
        if ot:
            print(f"overflow_tiles first {ot[0]:.3g} -> final {ot[-1]:.3g}")


if __name__ == "__main__":
    main()
