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
    subprocess.run(
        [sys.executable, os.path.join(here, "tools",
                                      "make_pretrained_dir.py"),
         "--weights", conv, "--config", args.config, "--out",
         os.path.join(args.out, "pretrained")], check=True)
    print(f"pretrained dir ready: {os.path.join(args.out, 'pretrained')}")


if __name__ == "__main__":
    main()
