"""Fetch + convert the published DiffusionGS scene checkpoint.

Reference equivalent: download_scene_ckpt.py (an hf_hub_download of
CaiYuanhao/DiffusionGS scene_ckpt_256.ckpt).  This build targets
zero-egress environments too, so the flow is split:

  1. where network access exists, download the torch checkpoint from the
     Hugging Face hub (same repo/filename as the reference);
  2. convert it to this framework's format with
     tools/convert_reference_ckpt.py (torch-free: the reader in
     utils/torch_load.py parses the zip/pickle format directly) and lay
     out a from_pretrained dir with tools/make_pretrained_dir.py.

Usage:
  python download_scene_ckpt.py                  # download + convert
  python download_scene_ckpt.py --ckpt path.ckpt # offline: convert only
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO_ID = "CaiYuanhao/DiffusionGS"
FILENAME = "scene_ckpt_256.ckpt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="already-downloaded .ckpt (skips the hub fetch)")
    ap.add_argument("--out", default="scene_ckpts",
                    help="output dir for the converted pretrained layout")
    ap.add_argument("--config", default="configs/diffusionGS_scene.yaml")
    ap.add_argument("--convert-only", action="store_true",
                    help="stop after the NPZ conversion (no pretrained dir)")
    ap.add_argument("--evaluate", action="store_true",
                    help="after the pretrained dir is built, run the FULL "
                         "reference protocol: launch.py --validate on the "
                         "converted weights, then eval_scene_result.py -> "
                         "RE10K PSNR/SSIM/LPIPS (README.md:160-193 of the "
                         "reference; its published scene_ckpt_256 numbers "
                         "are 21.26 dB / 0.672 / 0.257)")
    ap.add_argument("--override", action="append", default=[],
                    help="dotlist config override passed to launch.py "
                         "(repeatable), e.g. data.local_eval_dir=...")
    ap.add_argument("--protocol", choices=("reference", "strict"),
                    default="reference")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform for the evaluate leg")
    args = ap.parse_args()

    ckpt = args.ckpt
    if ckpt is None:
        try:
            from huggingface_hub import hf_hub_download
        except ImportError:
            print(
                "huggingface_hub is not installed (zero-egress image?).\n"
                f"Download {REPO_ID}/{FILENAME} on a connected machine and "
                "re-run:\n  python download_scene_ckpt.py --ckpt "
                f"{FILENAME}", file=sys.stderr)
            raise SystemExit(2)
        os.makedirs(args.out, exist_ok=True)
        ckpt = hf_hub_download(repo_id=REPO_ID, filename=FILENAME,
                               repo_type="model", cache_dir=args.out)
        print(f"downloaded {ckpt}")

    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(args.out, exist_ok=True)
    conv = os.path.join(args.out, "converted_weights.npz")
    subprocess.run(
        [sys.executable, os.path.join(here, "tools",
                                      "convert_reference_ckpt.py"),
         "--ckpt", ckpt, "--out", conv], check=True)
    if args.convert_only:
        print(f"converted weights: {conv}")
        return
    pretrained = os.path.join(args.out, "pretrained")
    mpd_cmd = [sys.executable,
               os.path.join(here, "tools", "make_pretrained_dir.py"),
               "--weights", conv, "--config", args.config,
               "--out", pretrained]
    if args.platform:
        mpd_cmd += ["--platform", args.platform]
    subprocess.run(mpd_cmd, check=True)
    print(f"pretrained dir ready: {pretrained}")
    if args.evaluate:
        evaluate(here, pretrained, args)


def evaluate(here: str, pretrained: str, args) -> None:
    """launch.py --validate on the converted weights, then the metric CLI.

    This is the reference's eval protocol in one leg (README.md:160-193:
    test.sh -> eval_scene_result.py): every val scene is sampled, views are
    dumped as npz, and PSNR/SSIM(/LPIPS when weights exist) are computed
    over them.  Writes <pretrained>/../eval/eval_result.json and prints a
    PARITY row."""
    import glob
    import json

    overrides = list(args.override)
    launch_cmd = [sys.executable, os.path.join(here, "launch.py"),
                  "--config", os.path.join(pretrained, "config.yaml"),
                  "--validate", f"resume={os.path.join(pretrained, 'ckpts')}"]
    if args.platform:
        launch_cmd += ["--platform", args.platform]
    launch_cmd += overrides
    subprocess.run(launch_cmd, check=True)

    # locate the trial dir the validate run used (same config + overrides)
    sys.path.insert(0, here)
    from open_diffusiongs_tpu.utils.config import load_config
    cfg = load_config(os.path.join(pretrained, "config.yaml"),
                      cli_args=overrides, makedirs=False)
    save_dirs = sorted(glob.glob(os.path.join(cfg.trial_dir, "save", "it*")),
                       key=os.path.getmtime)
    assert save_dirs, f"validate produced no save dir under {cfg.trial_dir}"
    result_dir = save_dirs[-1]

    eval_cmd = [sys.executable, os.path.join(here, "eval_scene_result.py"),
                "--result_dir", result_dir, "--protocol", args.protocol]
    if args.platform:
        eval_cmd += ["--platform", args.platform]
    subprocess.run(eval_cmd, check=True)

    result = json.load(open(os.path.join(result_dir, "eval_result.json")))
    row = {"benchmark": "RE10K", "protocol": result["protocol"],
           "psnr": result.get("psnr"), "ssim": result.get("ssim"),
           "lpips": result.get("lpips"),
           "num_scenes": result.get("num_scenes"),
           "reference_published": {"psnr": 21.26, "ssim": 0.672,
                                   "lpips": 0.257}}
    print("PARITY_ROW " + json.dumps(row))


if __name__ == "__main__":
    main()
