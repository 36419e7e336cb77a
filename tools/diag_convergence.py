"""Flagship-scale convergence probe (docs/CONVERGENCE.md).

Round-4's at-scale runs (outputs/convergence_r4/) showed train PSNR
FALLING over 1000 steps at 94-96% rasterizer overflow; this tool isolates
the mechanism with short fixed-data overfit probes at the flagship config
(24-layer / width-1024 / 256^2, configs/diffusionGS_rel.yaml), A/B-ing:

  * rect_clip 'first' (pre-r5: keep the first D row-major tiles of an
    over-D rect) vs 'center' (keep a <=D window around the Gaussian mean),
  * max_per_tile K,
  * learning rate,
  * constant lambdas vs the reference step-150 C() switch.

Learning signal: every --eval-every steps, the train loss is evaluated on
a FIXED batch with FIXED rngs (same noise + timestep draws every time), so
`eval_psnr` is a deterministic function of the parameters — the monotone
curve the per-step random-t train PSNR can never be.

Usage:
  python tools/diag_convergence.py --tag center_lr1e-4 --steps 300 \
      --rect-clip center --lr 1e-4 [--k 1024] [--scenes 8] [--const-lambdas]

Writes one JSON line per eval to outputs/diag_convergence/<tag>.jsonl.
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
    ap.add_argument("--tag", required=True)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--rect-clip", default="center",
                    choices=["center", "first"])
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--const-lambdas", action="store_true",
                    help="diffusion=1/xyz=0.025/pointsdist=0 from step 0 "
                         "instead of the reference step-150 C() switch")
    ap.add_argument("--config", default="configs/diffusionGS_rel.yaml")
    ap.add_argument("--data", default="outputs/synth_obja")
    ap.add_argument("--out", default="outputs/diag_convergence")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import open_diffusiongs_tpu as pkg
    from open_diffusiongs_tpu.data.loader import collate
    from open_diffusiongs_tpu.parallel.train_step import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step)
    from open_diffusiongs_tpu.systems.builder import build_system
    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    from open_diffusiongs_tpu.utils.config import load_config

    enable_persistent_cache()
    pkg._register_builtins()

    overrides = [
        f"data.local_dir={args.data}/meta",
        f"data.image_dir={args.data}/images",
        f"data.batch_size={args.batch_size}",
        "system.loss.lambda_lpips=0.0",
        f"system.raster.max_per_tile={args.k}",
        f"system.raster.max_tiles_per_gaussian={args.d}",
        f"system.raster.rect_clip={args.rect_clip}",
    ]
    if args.const_lambdas:
        overrides += ["system.loss.lambda_diffusion=1.0",
                      "system.loss.lambda_pointsdist=0.0",
                      "system.loss.lambda_xyz=0.025"]
    cfg = load_config(args.config, cli_args=overrides, n_devices=1)

    data_cls = pkg.find(cfg.data_type)
    dataset = data_cls(cfg.data, split="train", seed=cfg.seed)
    n = min(args.scenes, len(dataset))
    print(f"loading {n} scenes x {args.batch_size} batch...", flush=True)
    batches = []
    for i in range(0, n, args.batch_size):
        idxs = [(i + j) % n for j in range(args.batch_size)]
        b = collate([dataset[j] for j in idxs])
        batches.append({k: v for k, v in b.items() if k != "uid"})

    system = build_system(cfg.system_type, cfg.system, bf16=True)
    opt_cfg = OptimizerConfig(lr=args.lr, grad_clip=0.5,
                              scheduler="constant")
    tx = make_optimizer(opt_cfg)
    th, tw = cfg.data.get("training_res", [256, 256])
    rng = jax.random.PRNGKey(cfg.seed)
    params = system.init_params(rng, th, tw,
                                v=int(cfg.data.get("gen_views", 4)))
    state = init_train_state(params, tx, ema_decay=None)
    step_fn = make_train_step(system.train_loss, tx, ema_decay=None)

    # deterministic eval: fixed batch, 4 fixed rng draws (fixed t + noise),
    # step pinned past the lambda switch so the weighted loss is comparable
    eval_batch = jax.tree.map(jnp.asarray, batches[0])
    eval_keys = [jax.random.PRNGKey(10_000 + i) for i in range(4)]

    @jax.jit
    def eval_fn(params, eb):
        outs = [system.train_loss(params, eb, k, jnp.int32(10**6))[1]
                for k in eval_keys]
        return jax.tree.map(lambda *xs: jnp.mean(jnp.stack(
            [jnp.asarray(x, jnp.float32) for x in xs])), *outs)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"{args.tag}.jsonl")
    fh = open(path, "w")
    meta = dict(vars(args), n_scenes=n)
    fh.write(json.dumps({"meta": meta}) + "\n")
    fh.flush()

    rng_train = jax.random.PRNGKey(cfg.seed + 1)
    dev_batches = [jax.tree.map(jnp.asarray, b) for b in batches]
    t0 = time.time()
    for step in range(args.steps + 1):
        if step % args.eval_every == 0:
            ev = {k: float(v) for k, v in eval_fn(state.params,
                                      eval_batch).items()}
            rec = {"step": step, "wall_s": round(time.time() - t0, 1),
                   **{f"eval_{k}": round(v, 5) for k, v in ev.items()}}
            print(json.dumps(rec), flush=True)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
        if step == args.steps:
            break
        state, m = step_fn(state, dev_batches[step % len(dev_batches)],
                           rng_train)
    fh.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
