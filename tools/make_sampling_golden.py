"""Generate the END-TO-END sampling-chain golden by RUNNING THE REFERENCE.

The per-module goldens (make_golden_fixtures.py) pin the denoiser forward;
this fixture pins the *composed* sampling chain — spaced-schedule
construction, the _WrappedModel timestep remap, p_mean_variance posterior
math, FIXED_LARGE variance, the nonzero-mask reparameterized step, and the
final Gaussian filter chain — executed jointly, the way the reference
pipeline runs it (pipline_obj.py:297-316).

How: importlib-load the reference's diffusion package UNMODIFIED
(/root/reference/diffusionGS/models/diffusion/{__init__,gaussian_diffusion,
respace,diffusion_utils}.py) under CPU torch, build a SpacedDiffusion via
the reference's own create_diffusion, and drive p_sample_loop_progressive
with

  * a deterministic STUB model (fixed view-mixing matrix + timestep bias,
    1.5*tanh so clip_denoised matters) standing in for the denoiser —
    the denoiser itself is pinned separately by the activation goldens;
  * th.randn_like intercepted (module-global `th` swap) so every noise
    draw is a pre-generated, recorded array.

Recorded per step: x_{t-1} (`sample`), pred_xstart, the remapped model
timestep.  Run twice: clip_denoised True and False (the pipeline uses
False, pipline_obj.py:303).

Also executes the reference GaussianModel filter chain (ast-extracted from
gs_core.py:321-475 — the class's heavy imports are render-path only) on a
random raw-Gaussian set and records the surviving tensors, pinning
prune/crop/nearfar semantics (quantile interpolation, boundary strictness).

tests/test_sampling_golden.py asserts our jitted p_sample_loop and
NumpyGaussians.apply_all_filters reproduce all of it.

Usage: python tools/make_sampling_golden.py  (needs CPU torch)
"""

from __future__ import annotations

import argparse
import ast
import importlib.util
import os
import sys
import types

import numpy as np

REF_DIFF = "/root/reference/diffusionGS/models/diffusion"
REF_GS = "/root/reference/diffusionGS/models/gsrenderer/gs_core.py"


def _load_reference_diffusion():
    """Import the reference diffusion package unmodified as `refdiff`."""
    spec = importlib.util.spec_from_file_location(
        "refdiff", os.path.join(REF_DIFF, "__init__.py"),
        submodule_search_locations=[REF_DIFF])
    pkg = importlib.util.module_from_spec(spec)
    sys.modules["refdiff"] = pkg
    spec.loader.exec_module(pkg)
    return pkg


class _ThWrapper:
    """Delegates to torch but serves randn_like from a recorded queue."""

    def __init__(self, torch, queue):
        self._torch = torch
        self._queue = queue

    def __getattr__(self, k):
        return getattr(self._torch, k)

    def randn_like(self, x):
        arr = self._queue.pop(0)
        assert tuple(arr.shape) == tuple(x.shape), (arr.shape, x.shape)
        return self._torch.from_numpy(arr).to(x.dtype)


def _extract_gaussian_model(torch):
    """exec the reference GaussianModel class (gs_core.py:321) with stub
    globals — only the filter methods are called, so the render-path
    imports (cv2, kiui, diff_gaussian_rasterization) are never touched."""
    tree = ast.parse(open(REF_GS).read())
    nodes = [n for n in tree.body
             if isinstance(n, ast.ClassDef) and n.name == "GaussianModel"]
    assert len(nodes) == 1
    module = ast.Module(body=nodes, type_ignores=[])
    code = compile(ast.fix_missing_locations(module), REF_GS, "exec")
    g = dict(torch=torch, np=np, math=__import__("math"),
             nn=__import__("torch.nn", fromlist=["nn"]),
             rearrange=None, OrderedDict=dict, stx=None)
    exec(code, g)
    return g["GaussianModel"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden/reference_sampling.npz")
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import torch

    refdiff = _load_reference_diffusion()
    gd_mod = sys.modules["refdiff.gaussian_diffusion"]
    respace_mod = sys.modules["refdiff.respace"]

    rng = np.random.default_rng(42)
    b, v_noisy, c, h, w = 1, 3, 3, 8, 8
    v_total = v_noisy + 1

    # deterministic stub model: fixed mixing over ALL views + t bias.
    # 1.5*tanh keeps some outputs outside [-1, 1] so clipping is exercised.
    mix = rng.normal(0, 0.6, (v_total, v_total)).astype(np.float32)
    mix_t = torch.from_numpy(mix)
    seen_model_ts = []

    def stub_model(input_batch, ts):
        seen_model_ts.append(int(ts[0]))
        imgs = input_batch["image"]                       # [b, V, 3, h, w]
        tt = ts.to(torch.float32).view(-1, 1, 1, 1, 1)
        out = 1.5 * torch.tanh(
            torch.einsum("uv,bvchw->buchw", mix_t, imgs) + 0.001 * tt)
        return out, None

    diffusion = refdiff.create_diffusion(timestep_respacing=str(args.steps))
    T = diffusion.num_timesteps
    assert T == args.steps

    cond = rng.uniform(0, 1, (b, 1, c, h, w)).astype(np.float32)
    x_T = rng.normal(0, 1, (b, v_noisy, c, h, w)).astype(np.float32)
    step_noise = rng.normal(0, 1, (T, b, v_noisy, c, h, w)).astype(np.float32)

    fixture = {
        "mix": mix, "cond": cond, "x_T": x_T, "step_noise": step_noise,
        "num_steps": np.int32(T),
        "timestep_map": np.asarray(diffusion.timestep_map, np.int32),
        "betas": np.asarray(diffusion.betas, np.float64),
    }

    for clip in (False, True):
        # fresh noise queue + th swap for both loaded reference modules
        queue = [step_noise[i].copy() for i in range(T)]
        wrapper = _ThWrapper(torch, queue)
        gd_mod.th = wrapper
        respace_mod.th = wrapper
        seen_model_ts.clear()

        input_batch = {
            "image": torch.from_numpy(cond.copy()),
            "image_noisy": torch.from_numpy(x_T.copy()),
        }
        samples, pred_x0s = [], []
        for out in diffusion.p_sample_loop_progressive(
                stub_model, x_T.shape, input_batch=input_batch,
                clip_denoised=clip, progress=False,
                device=torch.device("cpu")):
            samples.append(out["sample"].numpy().copy())
            pred_x0s.append(out["pred_xstart"].numpy().copy())
            input_batch = out["input_batch"]
        assert not queue, "not all recorded noise was consumed"
        key = "clip" if clip else "noclip"
        fixture[f"{key}/samples"] = np.stack(samples)      # [T, b, v, 3, h, w]
        fixture[f"{key}/pred_x0"] = np.stack(pred_x0s)
        fixture[f"{key}/model_ts"] = np.asarray(seen_model_ts, np.int32)

    # --- Gaussian filter chain (pipline_obj.py:310-315 arguments) ---------
    GaussianModel = _extract_gaussian_model(torch)
    n = 512
    xyz = rng.normal(0, 0.7, (n, 3)).astype(np.float32)
    feat = rng.normal(0, 1, (n, 1, 3)).astype(np.float32)
    scaling = rng.normal(-3, 1, (n, 3)).astype(np.float32)
    rot = rng.normal(0, 1, (n, 4)).astype(np.float32)
    opac = rng.normal(0, 2, (n, 1)).astype(np.float32)
    cam_origins = rng.normal(0, 2.0, (4, 3)).astype(np.float32)

    gm = GaussianModel(sh_degree=0)
    gm._xyz = torch.from_numpy(xyz.copy())
    gm._features_dc = torch.from_numpy(feat.copy())
    gm._scaling = torch.from_numpy(scaling.copy())
    gm._rotation = torch.from_numpy(rot.copy())
    gm._opacity = torch.from_numpy(opac.copy())
    gm.apply_all_filters(
        opacity_thres=0.02, crop_bbx=[-0.91, 0.91, -0.91, 0.91, -0.91, 0.91],
        cam_origins=torch.from_numpy(cam_origins), nearfar_percent=(0.05, 0.95))

    fixture.update({
        "filt/xyz_in": xyz, "filt/features_in": feat,
        "filt/scaling_in": scaling, "filt/rotation_in": rot,
        "filt/opacity_in": opac, "filt/cam_origins": cam_origins,
        "filt/xyz_out": gm._xyz.numpy(),
        "filt/features_out": gm._features_dc.numpy(),
        "filt/scaling_out": gm._scaling.numpy(),
        "filt/rotation_out": gm._rotation.numpy(),
        "filt/opacity_out": gm._opacity.numpy(),
    })

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, **fixture)
    print(f"wrote {args.out}: T={T}, timestep_map="
          f"{list(np.asarray(diffusion.timestep_map))}, "
          f"filter kept {gm._xyz.shape[0]}/{n}")


if __name__ == "__main__":
    main()
