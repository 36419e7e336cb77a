"""Scene evaluation metric CLI (reference eval_scene_result.py equivalent).

Loads the .npz result packages dumped by the scene system's
save_result_for_eval (render_images [v, 3, h, w] + image [v_in, 3, h, w]),
computes chunked PSNR / SSIM / LPIPS, and writes eval_result.json
(reference :9-56, which loads .pt dumps; the contents and metrics match).

--protocol reference (default) compares ALL saved views against GT —
including the conditioning view 0 — exactly like the reference CLI
(eval_scene_result.py:22-37 stacks render_images vs image whole), so
numbers are comparable to the published RE10K 21.26/0.672/0.257.
--protocol strict excludes the conditioning view (novel views only) —
a more honest but non-comparable variant.

  python eval_scene_result.py --result_dir outputs/.../save/it0 \
      [--protocol reference|strict] [--chunk 16] \
      [--lpips-weights lpips_vgg.npz] [--platform cpu]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--result_dir", required=True)
    p.add_argument("--protocol", choices=("reference", "strict"),
                   default="reference")
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--lpips-weights", default=None)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from open_diffusiongs_tpu.systems import losses as L

    # .npz: dumps from this framework's save_result_for_eval.
    # .pt: dumps from the REFERENCE scene system (torch.save packages,
    #      diffusion_gs_system_scene.py:222-229) — read torch-free via
    #      utils/torch_load.py, so reference results can be re-scored with
    #      this CLI for apples-to-apples metric comparison.
    files = sorted(glob.glob(os.path.join(args.result_dir, "*.npz"))
                   + glob.glob(os.path.join(args.result_dir, "*.pt")))
    assert files, f"no .npz/.pt results in {args.result_dir}"
    lpips_params = L.lpips_init_params(args.lpips_weights) \
        if args.lpips_weights else None
    if lpips_params is None:
        print("[warn] no --lpips-weights: LPIPS omitted from results")

    lo = 0 if args.protocol == "reference" else 1
    gts, preds = [], []
    for fp in files:
        if fp.endswith(".pt"):
            from open_diffusiongs_tpu.utils.torch_load import torch_load
            d = torch_load(fp)
        else:
            d = np.load(fp)
        render = np.asarray(d["render_images"])  # [v, 3, h, w] (incl. view 0)
        gt = np.asarray(d["image"])              # [v_in, 3, h, w]
        v = min(render.shape[0], gt.shape[0])
        # reference protocol: ALL views incl. the conditioning view 0
        # (reference :22-37); strict: novel views only
        preds.append(render[lo:v])
        gts.append(gt[lo:v])
    preds = np.concatenate(preds)
    gts = np.concatenate(gts)
    print(f"{len(files)} scenes, {len(preds)} views ({args.protocol})")

    metric_fn = jax.jit(lambda t, r: L.compute_metrics(t, r, lpips_params))
    psnrs, ssims, lpipss = [], [], []
    for i in range(0, len(preds), args.chunk):
        m = metric_fn(jnp.asarray(gts[i:i + args.chunk]),
                      jnp.asarray(preds[i:i + args.chunk]))
        psnrs.append(np.asarray(m["psnr"]))
        ssims.append(np.asarray(m["ssim"]))
        if "lpips" in m:
            lpipss.append(np.asarray(m["lpips"]))
    result = {
        "psnr": float(np.concatenate(psnrs).mean()),
        "ssim": float(np.concatenate(ssims).mean()),
        "num_scenes": len(files),
        "num_views": int(len(preds)),
        "protocol": args.protocol,
    }
    if lpipss:
        result["lpips"] = float(np.concatenate(lpipss).mean())
    out_path = os.path.join(args.result_dir, "eval_result.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
