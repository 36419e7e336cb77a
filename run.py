"""Single-image -> 3D demo (reference run.py equivalent).

  python run.py --ckpt <dir with config.yaml + ckpts/> --image input.png \
      --seed 62 --foreground-ratio 0.825 --extract-mesh --out out/

Without --ckpt it runs with random weights (pipeline smoke test).
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", required=True, nargs="+",
                   help="one or more input images; >1 runs the batched "
                        "serving path (one jitted sampler call)")
    p.add_argument("--ckpt", default=None,
                   help="pretrained dir (config.yaml + ckpts/); random "
                        "weights if omitted")
    p.add_argument("--out", default="output")
    p.add_argument("--seed", type=int, default=62)
    p.add_argument("--foreground-ratio", type=float, default=0.825)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--extract-mesh", action="store_true")
    p.add_argument("--matting", default="u2net",
                   choices=["u2net", "grabcut", "border"],
                   help="background-removal method; u2net (reference "
                        "parity) needs a converted weights NPZ — pass "
                        "grabcut/border to acknowledge the fallback")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # warm restarts skip the 30-40 s XLA compile

    import numpy as np

    from open_diffusiongs_tpu.pipeline import DiffusionGSPipeline
    from open_diffusiongs_tpu.utils.saving import save_image, chw_to_hwc

    if args.ckpt:
        pipe = DiffusionGSPipeline.from_pretrained(args.ckpt)
    else:
        print("[warn] no --ckpt: random weights (smoke-test mode)")
        from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
        from open_diffusiongs_tpu.systems.object_system import (
            ObjectSystem, ObjectSystemConfig)
        import jax.numpy as jnp
        system = ObjectSystem(ObjectSystemConfig(
            shape_model=dict(width=1024, num_layers=24, patch_size=8,
                             dim_heads=64, dtype=jnp.bfloat16),
            raster=RasterizeConfig(16, 512, 32), use_lpips=False))
        params = system.init_params(jax.random.PRNGKey(0), args.resolution,
                                    args.resolution, v=4)
        pipe = DiffusionGSPipeline(system, params)

    os.makedirs(args.out, exist_ok=True)
    multi = len(args.image) > 1
    subdirs = [os.path.join(args.out, os.path.splitext(
                   os.path.basename(im))[0]) if multi else args.out
               for im in args.image]
    for d in subdirs:
        os.makedirs(d, exist_ok=True)
    outs = pipe.batch(args.image, seed=args.seed,
                      foreground_ratio=args.foreground_ratio,
                      resolution=args.resolution,
                      extract_mesh=args.extract_mesh,
                      matting=args.matting,
                      save_ply=[os.path.join(d, "gaussians.ply")
                                for d in subdirs])

    for d, out in zip(subdirs, outs):
        save_image(os.path.join(d, "input_processed.png"),
                   chw_to_hwc(out.input_image))
        for i in range(out.renders.shape[0]):
            save_image(os.path.join(d, f"render_{i}.png"),
                       chw_to_hwc(out.renders[i]))
        if out.mesh is not None:
            from open_diffusiongs_tpu.ops.mesh import save_mesh_obj
            save_mesh_obj(os.path.join(d, "mesh.obj"), *out.mesh)
        print(f"saved outputs to {d}/ "
              f"({out.gaussians.xyz.shape[0]} gaussians)")


if __name__ == "__main__":
    main()
