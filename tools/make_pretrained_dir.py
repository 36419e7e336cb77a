"""Assemble a `from_pretrained`-loadable directory from converted weights.

Reference flow: HF hub ckpt + yaml (pipline_obj.py:53-60) /
download_scene_ckpt.py.  Zero-egress equivalent: convert the torch ckpt
offline (tools/convert_reference_ckpt.py -> NPZ), then:

  python tools/make_pretrained_dir.py --config configs/diffusionGS_rel.yaml \
      --weights shape_model_params.npz --out pretrained/obj_256

The output dir holds config.yaml + an orbax ckpt of a TrainState whose
params (and EMA) are the converted weights — exactly what
DiffusionGSPipeline.from_pretrained and `launch.py resume=` expect.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--weights", required=True, help="NPZ from convert_reference_ckpt")
    p.add_argument("--out", required=True)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from convert_reference_ckpt import load_converted_params
    from open_diffusiongs_tpu.parallel.train_step import (
        OptimizerConfig, init_train_state, make_optimizer)
    from open_diffusiongs_tpu.systems.builder import build_system
    from open_diffusiongs_tpu.utils.checkpoint import CheckpointManager
    from open_diffusiongs_tpu.utils.config import load_config
    import open_diffusiongs_tpu as pkg
    pkg._register_builtins()

    cfg = load_config(args.config, makedirs=False)
    system = build_system(cfg.system_type, cfg.system, bf16=False)
    th, tw = cfg.data.get("training_res", [256, 256])
    n_views = cfg.data.get("gen_views",
                           cfg.data.get("sel_views", 3) + 1)
    params = system.init_params(jax.random.PRNGKey(0), th, tw, v=n_views)
    params = load_converted_params(args.weights, params)

    # the optimizer must come from the SAME config launch.py will use, or
    # the saved opt_state tree won't match at `resume=` restore time
    from open_diffusiongs_tpu.systems.builder import build_optimizer_config
    tx = make_optimizer(build_optimizer_config(cfg.system,
                                               dict(cfg.trainer)))
    state = init_train_state(params, tx, ema_decay=0.9999)

    os.makedirs(args.out, exist_ok=True)
    shutil.copy2(args.config, os.path.join(args.out, "config.yaml"))
    mngr = CheckpointManager(os.path.join(args.out, "ckpts"))
    mngr.maybe_save(state, force=True)
    mngr.close()
    print(f"pretrained dir ready: {args.out}")


if __name__ == "__main__":
    main()
