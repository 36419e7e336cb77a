"""Training / evaluation CLI — the reference `launch.py` equivalent.

Usage (mirrors the reference, launch.py:128-343):
  python launch.py --config configs/diffusionGS_rel.yaml --train [a.b=c ...]
  python launch.py --config configs/diffusionGS_scene_eval.yaml --validate \
      resume=outputs/.../ckpts

TPU-native: one process per host (`jax.distributed.initialize` when
JAX_COORDINATOR is set), one jitted train step over a `data` mesh (XLA
all-reduces gradients over ICI), orbax checkpoints, CSV + TensorBoard
logging on process 0, config/cmd snapshots in the trial dir.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time
from typing import Any, Dict

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--export", action="store_true",
                        help="asset-export mode from a resumed ckpt "
                             "(reference launch.py:298,319 trainer.predict; "
                             "NB the reference's own predict_step is "
                             "NotImplementedError, systems/base.py:151-152 "
                             "— this implements the advertised capability: "
                             "PLY + path video + renders per scene)")
    parser.add_argument("--use_ema", action="store_true",
                        help="use EMA weights for validate/test")
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--gradio", action="store_true",
                        help="write a single-line progress file to "
                             "<trial_dir>/progress (reference launch.py "
                             "--gradio + utils/callbacks.py:144-179)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (e.g. cpu); needed because "
                             "the axon plugin overrides JAX_PLATFORMS")
    args, extras = parser.parse_known_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if os.environ.get("JAX_COORDINATOR"):
        # "host:port" -> explicit wiring (with JAX_NUM_PROCESSES /
        # JAX_PROCESS_ID); any other truthy value -> jax's cluster
        # auto-detection (TPU pod metadata / SLURM / OMPI).
        coord = os.environ["JAX_COORDINATOR"]
        if ":" in coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
    import jax.numpy as jnp

    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # warm restarts skip the 30-40 s XLA compile

    import open_diffusiongs_tpu as pkg
    from open_diffusiongs_tpu.data.loader import PrefetchLoader
    from open_diffusiongs_tpu.parallel.mesh import make_mesh, shard_batch
    from open_diffusiongs_tpu.parallel.train_step import (
        init_train_state, make_optimizer, make_train_step)
    from open_diffusiongs_tpu.systems.builder import (build_optimizer_config,
                                                      build_system)
    from open_diffusiongs_tpu.utils.checkpoint import CheckpointManager
    from open_diffusiongs_tpu.utils.config import dump_config, load_config

    pkg._register_builtins()

    cfg = load_config(args.config, cli_args=extras,
                      n_devices=jax.device_count())
    is_main = jax.process_index() == 0

    # --- reproducibility + snapshots (launch.py:172-173, 262-267) ---------
    np.random.seed(cfg.seed + jax.process_index())
    if is_main:
        os.makedirs(cfg.trial_dir, exist_ok=True)
        with open(os.path.join(cfg.trial_dir, "cmd.txt"), "w") as f:
            f.write(" ".join(["python"] + sys.argv))
        dump_config(os.path.join(cfg.trial_dir, "parsed.yaml"), cfg)
        _snapshot_code(cfg.trial_dir)

    trainer_cfg = dict(cfg.trainer)
    bf16 = str(trainer_cfg.get("precision", "bf16")) in (
        "16-mixed", "bf16", "bf16-mixed", "16")

    # --- data -------------------------------------------------------------
    data_cls = pkg.find(cfg.data_type)
    dataset = data_cls(cfg.data, split="train" if args.train else "test",
                       seed=cfg.seed)

    # --- system + optimizer ----------------------------------------------
    # trainer.model_parallel > 1 activates the dp x tp mesh: DiT width
    # megatron-sharded on `model` (parallel/mesh.py::dit_tp_rule) with the
    # attention kernel shard_mapped over it (models/transformer.py)
    tp = int(trainer_cfg.get("model_parallel", 1))
    # trainer.seq_parallel > 1 additionally shards the DiT token axis over
    # a `seq` mesh axis (ring attention, parallel/ring.py);
    # trainer.pipe_parallel > 1 stages the layer stack over a `pipe` axis
    # (GPipe microbatching, parallel/pipeline.py)
    sp = int(trainer_cfg.get("seq_parallel", 1))
    pp = int(trainer_cfg.get("pipe_parallel", 1))
    mesh = make_mesh(model_parallel=tp, seq_parallel=sp, pipe_parallel=pp)
    system = build_system(cfg.system_type, cfg.system, bf16=bf16,
                          tp_mesh=mesh if tp * sp * pp > 1 else None)
    opt_cfg = build_optimizer_config(cfg.system, trainer_cfg)
    tx = make_optimizer(opt_cfg)

    th, tw = cfg.data.get("training_res", [256, 256])
    n_input_views = (cfg.data.get("gen_views", 4)
                     if "gen_views" in cfg.data
                     else cfg.data.get("sel_views", 4) + 1)
    rng = jax.random.PRNGKey(cfg.seed)
    params = system.init_params(rng, th, tw, v=n_input_views)
    # stage-2-from-stage-1 / partial weight bootstrap (overridden by resume)
    params = system.load_pretrained(params)
    state = init_train_state(params, tx, ema_decay=0.9999)

    ckpt_cfg = dict(cfg.checkpoint)
    ckpt = CheckpointManager(
        os.path.join(cfg.trial_dir, "ckpts"),
        every_n_train_steps=ckpt_cfg.get("every_n_train_steps", 1000))
    if cfg.resume:
        resume_mngr = CheckpointManager(cfg.resume) \
            if os.path.abspath(cfg.resume) != ckpt.directory else ckpt
        state = resume_mngr.restore(state)
        print(f"Resumed from {cfg.resume} at step {int(state.step)}")

    if args.train:
        state = train(cfg, args, system, tx, state, dataset, mesh, ckpt,
                      is_main)
        if args.gradio:
            # gradio mode also exports assets after training
            # (reference launch.py:287-289)
            export(cfg, args, system, state, dataset, mesh, is_main)
    elif args.validate or args.test:
        validate(cfg, args, system, state, dataset, mesh, is_main)
    elif args.export:
        export(cfg, args, system, state, dataset, mesh, is_main)
    else:
        parser.error("one of --train / --validate / --test / --export "
                     "is required")


def train(cfg, args, system, tx, state, dataset, mesh, ckpt, is_main):
    import jax

    from open_diffusiongs_tpu.data.loader import PrefetchLoader
    from open_diffusiongs_tpu.parallel.mesh import shard_batch
    from open_diffusiongs_tpu.parallel.train_step import make_train_step

    trainer_cfg = dict(cfg.trainer)
    log_every = int(trainer_cfg.get("log_every_n_steps", 5))
    max_steps = args.max_steps or int(trainer_cfg.get("max_steps", 10 ** 9))

    # global batch over ALL devices; the index stream is seeded identically
    # on every process so hosts agree on the global batch, and each host
    # loads only its local slice (mesh.local_batch_slice)
    n_data = mesh.shape.get("data", jax.device_count())
    batch_size = int(cfg.data.get("batch_size", 4)) * n_data
    from open_diffusiongs_tpu.parallel.mesh import local_batch_slice
    loader = PrefetchLoader(
        dataset, batch_size=batch_size, shuffle=True,
        num_threads=max(1, int(cfg.data.get("num_workers", 2))),
        seed=cfg.seed,
        process_slice=(local_batch_slice(batch_size)
                       if jax.process_count() > 1 else None))

    state_sh = None
    tp_on = mesh.shape.get("model", 1) > 1
    pp_on = mesh.shape.get("pipe", 1) > 1
    # trainer.zero1: ZeRO-1 optimizer-state sharding — mu/nu/EMA sharded
    # over the data axis (parallel/mesh.py::train_state_sharding)
    z1_on = bool(trainer_cfg.get("zero1", False)) \
        and mesh.shape.get("data", 1) > 1
    if tp_on or pp_on or z1_on:
        # shard params/EMA/optimizer moments per the megatron TP rule and/or
        # the pipe rule (scanned layer axis with its stage); the batch-size
        # divisor is the DATA axis alone
        from open_diffusiongs_tpu.parallel.mesh import train_state_sharding
        state_sh = train_state_sharding(mesh, state, tp=tp_on, pp=pp_on,
                                        zero1=z1_on)
        state = jax.device_put(state, state_sh)
    step_fn = make_train_step(system.train_loss, tx, mesh=mesh,
                              state_shardings=state_sh)
    rng = jax.random.PRNGKey(cfg.seed + 1)

    writer = None
    csv_path = os.path.join(cfg.trial_dir, "metrics.csv")
    wandb_run = None
    if is_main:
        try:
            from flax.metrics import tensorboard
            writer = tensorboard.SummaryWriter(
                os.path.join(cfg.trial_dir, "tb"))
        except Exception as e:
            print(f"tensorboard disabled: {e}")
        # optional wandb logger — the reference's system.loggers.wandb
        # surface (launch.py:252-261, utils/saving.py:58-68); degrades to a
        # warning when the wandb package/egress is unavailable
        wb = dict(dict(cfg.system.get("loggers", {}) or {}).get("wandb",
                                                                {}) or {})
        if wb.get("enable", False):
            try:
                import wandb
                wandb_run = wandb.init(
                    project=wb.get("project", "open_diffusiongs_tpu"),
                    name=wb.get("name") or cfg.name,
                    dir=cfg.trial_dir)
            except Exception as e:
                print(f"wandb logging disabled: {e}")

    progress = ProgressFile(os.path.join(cfg.trial_dir, "progress")
                            if (args.gradio and is_main) else None)
    t0 = time.time()
    drop = {"uid"}
    # host-side step counter: fetching state.step every iteration would
    # force a device sync per step and serialize dispatch against compute
    step = int(state.step)
    start_step = step
    last_logged_step = step
    # deterministic learning signal: every trainer.eval_every_n_steps, run
    # the loss on a FIXED batch with FIXED rngs (same t + noise draws), so
    # eval_psnr is a function of the parameters alone — the per-step train
    # PSNR is one sample at a random diffusion timestep and cannot show a
    # monotone curve (docs/CONVERGENCE.md)
    eval_every = int(trainer_cfg.get("eval_every_n_steps", 0))
    eval_fn, eval_batch = None, None
    eval_csv = os.path.join(cfg.trial_dir, "eval_metrics.csv")

    def run_eval():
        m = {k: float(v) for k, v in eval_fn(state.params,
                                             eval_batch).items()}
        if is_main:
            print("eval step {}: {}".format(step, " ".join(
                f"{k}={v:.4g}" for k, v in sorted(m.items()))), flush=True)
            _append_csv(eval_csv, step, m)
            if writer:
                for k, v in m.items():
                    writer.scalar(f"eval/{k}", v, step)
        return m

    with mesh:
        for batch in loader:
            if step >= max_steps:
                break
            device_batch = shard_batch(
                mesh, {k: v for k, v in batch.items() if k not in drop})
            if eval_every and eval_fn is None:
                import jax.numpy as jnp
                eval_batch = jax.tree.map(jnp.copy, device_batch)
                keys = [jax.random.PRNGKey(10_000 + i) for i in range(4)]

                # batch passed as a jit ARGUMENT — closing over device
                # arrays embeds them as MLIR constants, fetched value-by-
                # value through the axon relay at compile time
                def _eval(params, eb):
                    outs = [system.train_loss(params, eb, k,
                                              jnp.int32(10 ** 6))[1]
                            for k in keys]
                    return jax.tree.map(
                        lambda *xs: jnp.mean(jnp.stack(
                            [jnp.asarray(x, jnp.float32) for x in xs])),
                        *outs)
                eval_fn = jax.jit(_eval)
                run_eval()
            state, metrics = step_fn(state, device_batch, rng)
            step += 1
            if eval_every and step % eval_every == 0:
                run_eval()
            # the `or` term guarantees a log line right after (re)start —
            # resume evidence must not wait a full log_every window
            if step % log_every == 0 or step == start_step + 1:
                m = {k: float(v) for k, v in metrics.items()}  # syncs here
                dt = time.time() - t0
                t0 = time.time()
                m["steps_per_sec"] = (step - last_logged_step) / dt
                last_logged_step = step
                if is_main:
                    line = " ".join(f"{k}={v:.4g}" for k, v in
                                    sorted(m.items()))
                    print(f"step {step}: {line}", flush=True)
                    # capacity alarm ("no silent caps"): drop-farthest is
                    # benign at small fractions (tests/test_overflow_
                    # accuracy.py) but a persistently high fraction means
                    # raster.max_per_tile / max_tiles_per_gaussian are
                    # undersized — see docs/CAPACITY.md
                    if m.get("overflow_frac", 0.0) > 0.05:
                        print(f"WARNING: rasterizer dropped "
                              f"{100 * m['overflow_frac']:.1f}% of per-tile "
                              f"entries (> 5%); consider raising "
                              f"system.raster.max_per_tile "
                              f"(docs/CAPACITY.md)", flush=True)
                    _append_csv(csv_path, step, m)
                    progress.write("Generation progress: "
                                   f"{step / max_steps * 100:.2f}%")
                    if writer:
                        for k, v in m.items():
                            writer.scalar(f"train/{k}", v, step)
                    if wandb_run:
                        wandb_run.log({f"train/{k}": v
                                       for k, v in m.items()}, step=step)
            ckpt.maybe_save(state, step=step)
    ckpt.maybe_save(state, force=True, step=step)
    ckpt.wait()
    if wandb_run:
        wandb_run.finish()
    if is_main:
        print(f"training done at step {step}")
    return state


def validate(cfg, args, system, state, dataset, mesh, is_main):
    import jax
    import jax.numpy as jnp

    from open_diffusiongs_tpu.utils.saving import (chw_to_hwc, save_image_grid)

    from open_diffusiongs_tpu.ops.gaussians import NumpyGaussians
    from open_diffusiongs_tpu.systems import eval_utils

    from open_diffusiongs_tpu.parallel.mesh import (allreduce_metric_sums,
                                                    eval_shard_indices)

    params = state.ema_params if (args.use_ema and
                                  state.ema_params is not None) else state.params
    step = int(state.step)
    rng = jax.random.PRNGKey(cfg.seed + 2)
    n_total = len(dataset)
    eval_bs = int(cfg.data.get("eval_batch_size", 1))
    save_videos = bool(getattr(system.cfg, "save_intermediate_video", False))
    # --test mirrors --validate (the reference's own test_step is
    # NotImplementedError, systems/base.py:135-136; Lightning would route
    # it to the test dataloader, which is the split our dataset already
    # loads) but keeps its artifacts separate
    suffix = "-test" if getattr(args, "test", False) else ""
    out_dir = os.path.join(cfg.trial_dir, "save", f"it{step}{suffix}")
    if getattr(args, "gradio", False) and is_main:
        ProgressFile(os.path.join(cfg.trial_dir, "progress")).write(
            "Rendering video ..." if suffix else
            "Rendering validation image ...")
    sample_jit = None
    # multi-host: each process owns a round-robin shard of the eval set and
    # writes artifacts only for its scenes (reference: DistributedSampler +
    # all_gather_batch, utils/misc.py:136-168)
    owned = eval_shard_indices(n_total)
    # Lightning-parity trainer.limit_val_batches: int = batch count,
    # float in (0, 1] = fraction of the eval set (debug_eval.sh uses it)
    lim = cfg.trainer.get("limit_val_batches") if cfg.trainer else None
    if lim is not None:
        n_batches = -(-len(owned) // eval_bs)
        keep = (max(1, int(round(n_batches * float(lim))))
                if 0 < float(lim) < 1 else int(lim))
        owned = owned[:keep * eval_bs]
    psnr_sum, view_count = 0.0, 0
    for i in range(0, len(owned), eval_bs):
        samples = [dataset[j] for j in owned[i:i + eval_bs]]
        from open_diffusiongs_tpu.data.loader import collate
        batch = collate(samples)
        cond = jnp.asarray(batch["rgbs_input"][:, :1])
        c2w = jnp.asarray(batch["c2ws_input"])
        fxy = jnp.asarray(batch["fxfycxcys_input"])
        if sample_jit is None:
            sample_jit = jax.jit(lambda p, c, cw, fx, r: system.sample(
                p, c, cw, fx, r, return_trajectory=save_videos))
        out = sample_jit(params, cond, c2w, fxy,
                         jax.random.fold_in(rng, owned[i]))
        renders = np.asarray(out["renders"])  # [b, v, 3, h, w]
        # novel-view PSNR vs GT (summed; merged across processes below)
        gt = np.asarray(batch["rgbs_input"], np.float32)
        vv = min(renders.shape[1], gt.shape[1])
        if vv > 1:
            mse = ((np.clip(renders[:, 1:vv], 0, 1) - gt[:, 1:vv]) ** 2
                   ).reshape(renders.shape[0], vv - 1, -1).mean(-1)
            psnr_sum += float((-10.0 * np.log10(np.maximum(mse, 1e-10))).sum())
            view_count += mse.size
        for bi, uid in enumerate(batch["uid"]):
            if getattr(system.cfg, "save_result_for_eval", False):
                system.save_result_for_eval(
                    cfg.trial_dir, step, uid, renders[bi],
                    np.asarray(batch["rgbs_input"][bi]))
            grid = chw_to_hwc(renders[bi])
            save_image_grid(os.path.join(out_dir, f"{uid}.png"), grid)
            if save_videos:
                # x_t / pred_x0 trajectories + per-scene PLY + path video
                # (diffusion_gs_system_scene validation_step :203-219)
                xt, x0 = out["trajectory"]
                tmap = np.asarray(system.sched_infer.timestep_map)[::-1]
                eval_utils.save_trajectory_videos(
                    out_dir, str(uid), np.asarray(xt[:, bi]),
                    np.asarray(x0[:, bi]),
                    np.asarray(batch["rgbs_input"][bi, :1]), tmap)
                g = NumpyGaussians.from_device(
                    jax.tree.map(lambda x: x[bi], out["gaussians"]))
                eval_utils.save_scene_gaussians(
                    out_dir, str(uid), g,
                    keyframe_c2ws=np.asarray(batch["c2ws_input"][bi]),
                    fxfycxcy=np.asarray(batch["fxfycxcys_input"][bi]),
                    h=renders.shape[-2], w=renders.shape[-1],
                    raster_cfg=system.cfg.raster)
        if is_main:
            print(f"validated {i + len(samples)}/{len(owned)} (of {n_total} "
                  f"total over {jax.process_count()} processes)", flush=True)

    # merge metrics across processes (all_gather_batch equivalent) and
    # write a summary from the main process only
    total_psnr, total_views = allreduce_metric_sums([psnr_sum, view_count])
    if is_main and total_views > 0:
        summary = {"psnr": total_psnr / total_views,
                   "num_views": int(total_views), "step": step}
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "val_metrics.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(f"val PSNR {summary['psnr']:.3f} dB over "
              f"{summary['num_views']} views", flush=True)


def export(cfg, args, system, state, dataset, mesh, is_main):
    """Asset-export mode (reference launch.py:298,316-319: trainer.predict
    over the datamodule from a resumed ckpt; its predict_step is
    NotImplementedError in both shipped systems, systems/base.py:151-152 —
    here the mode delivers the capability it advertises).

    Per owned scene: sample -> renders grid PNG, Gaussians PLY, and a
    slerp camera-path video through the scene's input poses
    (utils/saving.py + systems/eval_utils.py)."""
    import jax
    import jax.numpy as jnp

    from open_diffusiongs_tpu.data.loader import collate
    from open_diffusiongs_tpu.ops.gaussians import NumpyGaussians
    from open_diffusiongs_tpu.parallel.mesh import eval_shard_indices
    from open_diffusiongs_tpu.systems import eval_utils
    from open_diffusiongs_tpu.utils.saving import chw_to_hwc, save_image_grid

    params = state.ema_params if (args.use_ema and
                                  state.ema_params is not None) \
        else state.params
    step = int(state.step)
    out_dir = os.path.join(cfg.trial_dir, "save", f"it{step}-export")
    rng = jax.random.PRNGKey(cfg.seed + 3)
    progress = ProgressFile(os.path.join(cfg.trial_dir, "progress")
                            if (args.gradio and is_main) else None)
    progress.write("Exporting assets ...")
    owned = eval_shard_indices(len(dataset))
    lim = cfg.trainer.get("limit_val_batches") if cfg.trainer else None
    if lim is not None:
        keep = (max(1, int(round(len(owned) * float(lim))))
                if 0 < float(lim) < 1 else int(lim))
        owned = owned[:keep]
    sample_jit = None
    for i, j in enumerate(owned):
        batch = collate([dataset[j]])
        cond = jnp.asarray(batch["rgbs_input"][:, :1])
        c2w = jnp.asarray(batch["c2ws_input"])
        fxy = jnp.asarray(batch["fxfycxcys_input"])
        if sample_jit is None:
            sample_jit = jax.jit(lambda p, c, cw, fx, r: system.sample(
                p, c, cw, fx, r))
        out = sample_jit(params, cond, c2w, fxy, jax.random.fold_in(rng, j))
        renders = np.asarray(out["renders"])              # [1, v, 3, h, w]
        uid = str(batch["uid"][0])
        save_image_grid(os.path.join(out_dir, f"{uid}.png"),
                        chw_to_hwc(renders[0]))
        g = NumpyGaussians.from_device(
            jax.tree.map(lambda x: x[0], out["gaussians"]))
        eval_utils.save_scene_gaussians(
            out_dir, uid, g,
            keyframe_c2ws=np.asarray(batch["c2ws_input"][0]),
            fxfycxcy=np.asarray(batch["fxfycxcys_input"][0]),
            h=renders.shape[-2], w=renders.shape[-1],
            raster_cfg=system.cfg.raster)
        if is_main:
            print(f"exported {uid} ({i + 1}/{len(owned)}) -> {out_dir}",
                  flush=True)
        progress.write(f"Exporting assets ... {i + 1}/{len(owned)}")
    if is_main:
        print(f"export done: {len(owned)} scenes in {out_dir}")


class ProgressFile:
    """Single-line overwrite progress reporter (the reference's gradio
    ProgressCallback, utils/callbacks.py:144-179): an external UI polls the
    file for 'Generation progress: NN.NN%'-style lines."""

    def __init__(self, path):
        self.path = path
        self._fh = None

    def write(self, msg: str):
        if self.path is None:
            return
        if self._fh is None:
            self._fh = open(self.path, "w")
        self._fh.seek(0)
        self._fh.truncate()
        self._fh.write(msg)
        self._fh.flush()


def _snapshot_code(trial_dir: str):
    """Copy git-tracked sources into the trial dir (CodeSnapshot callback,
    utils/callbacks.py:83-117)."""
    import shutil
    import subprocess
    try:
        files = subprocess.run(
            ["git", "ls-files"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=30).stdout.splitlines()
    except Exception:
        return
    root = os.path.dirname(os.path.abspath(__file__))
    dst_root = os.path.join(trial_dir, "code")
    for f in files:
        if not f.endswith((".py", ".yaml", ".cpp", ".md", "Makefile")):
            continue
        src = os.path.join(root, f)
        dst = os.path.join(dst_root, f)
        if os.path.exists(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            try:
                shutil.copy2(src, dst)
            except OSError:
                pass


def _append_csv(path: str, step: int, metrics: Dict[str, float]):
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["step"] + sorted(metrics))
        w.writerow([step] + [metrics[k] for k in sorted(metrics)])


if __name__ == "__main__":
    main()
