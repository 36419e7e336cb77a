"""Input-pipeline benchmark: samples/s through PrefetchLoader at flagship
shapes vs num_workers / prefetch depth (VERDICT r4 weak #4: at-scale runs
logged 600-800 ms/step against a 336 ms benched step — the loader starved
the chip at data.num_workers=2).

Usage:
  python tools/bench_loader.py [--data outputs/synth_obja] [--batches 40]

Writes outputs/bench/loader.json; the recommended num_workers for the
convergence-run configs comes from this table (docs/CONVERGENCE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="outputs/synth_obja")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--workers", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--out", default="outputs/bench/loader.json")
    args = ap.parse_args()

    import open_diffusiongs_tpu as pkg
    from open_diffusiongs_tpu.data.loader import PrefetchLoader
    from open_diffusiongs_tpu.utils.config import load_config
    pkg._register_builtins()

    cfg = load_config("configs/diffusionGS_rel.yaml", cli_args=[
        f"data.local_dir={args.data}/meta",
        f"data.image_dir={args.data}/images",
        f"data.batch_size={args.batch_size}"], n_devices=1)
    dataset = pkg.find(cfg.data_type)(cfg.data, split="train", seed=0)

    # single-sample cost (the floor any worker count must amortize)
    t0 = time.perf_counter()
    n_probe = 8
    for i in range(n_probe):
        dataset[i % len(dataset)]
    per_sample_ms = (time.perf_counter() - t0) / n_probe * 1e3

    results = {"per_sample_ms": round(per_sample_ms, 1)}
    print(f"single-thread sample load: {per_sample_ms:.1f} ms", flush=True)
    for nw in args.workers:
        loader = PrefetchLoader(dataset, batch_size=args.batch_size,
                                shuffle=True, num_threads=nw, seed=0)
        it = iter(loader)
        for _ in range(4):      # warm the queue
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.batches):
            next(it)
        dt = time.perf_counter() - t0
        sps = args.batches * args.batch_size / dt
        results[f"workers_{nw}_samples_per_s"] = round(sps, 2)
        results[f"workers_{nw}_ms_per_batch"] = round(dt / args.batches * 1e3, 1)
        print(f"num_workers={nw}: {sps:.2f} samples/s "
              f"({dt / args.batches * 1e3:.0f} ms/batch)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
