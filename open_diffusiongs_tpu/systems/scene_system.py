"""Scene-level system (RE10K): training loss + sampling + eval dumps.

Equivalent of the reference "diffusion-gs-scene-system"
(systems/diffusion_gs_system_scene.py:26-239).  Differences from the object
system it mirrors:
  * no depth ground truth: the xyz loss term is zero (:96-104 passes no
    gt_img_aligned_xyz);
  * sampling uses clip_denoised=False (:178);
  * eval saves npz result packages (render_images + input images) for the
    metric CLI (save_result_for_eval, :221-228) — the reference's `.pt`
    dumps become `.npz`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import open_diffusiongs_tpu as pkg

from ..diffusion import p_sample_loop, q_sample
from ..ops import rasterize
from ..ops.rays import rays_chw
from ..utils.schedules import C
from . import losses as losses_lib
from .object_system import ObjectSystem, ObjectSystemConfig


@dataclasses.dataclass(frozen=True)
class SceneSystemConfig(ObjectSystemConfig):
    save_intermediate_video: bool = True
    save_result_for_eval: bool = False
    # scene renders are unbounded: black background matches RE10K frames
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)


@pkg.register("diffusion-gs-scene-system")
class SceneSystem(ObjectSystem):
    cfg: SceneSystemConfig

    def train_loss(self, params, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, step):
        cfg = self.cfg
        images = batch["rgbs_input"].astype(jnp.float32)
        b, v, _, h, w = images.shape
        ray_o, ray_d = rays_chw(batch["c2ws_input"],
                                batch["fxfycxcys_input"], h, w)

        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, images.shape, jnp.float32)
        t = jax.random.randint(rng_t, (b,), 0, cfg.num_train_timesteps)
        noisy = q_sample(self.sched_train, images[:, 1:], t, noise[:, 1:])
        x = jnp.concatenate([images[:, :1], noisy], axis=1)

        gaussians, img_xyz = self.model.apply(
            params, x, ray_o, ray_d, t, training=True)
        out = rasterize.render(gaussians, batch["c2ws"], batch["fxfycxcys"],
                               h, w, bg_color=cfg.bg_color, cfg=cfg.raster)

        lo = losses_lib.compute_losses(
            out["render"], batch["rgbs"].astype(jnp.float32), ray_o,
            img_aligned_xyz=img_xyz, gt_img_aligned_xyz=None,
            masks=batch.get("masks_input"),
            lpips_params=self.lpips_params, use_lpips=cfg.use_lpips)

        parts = {
            "loss_diffusion": (lo.l2.mean(), cfg.lambda_diffusion),
            "loss_lpips": (lo.lpips, cfg.lambda_lpips),
            "loss_ssim": (lo.ssim.mean(), cfg.lambda_ssim),
            "loss_pointsdist": (lo.pointsdist.mean(), cfg.lambda_pointsdist),
            "loss_xyz": (lo.xyz, cfg.lambda_xyz),
        }
        total = jnp.zeros((), jnp.float32)
        metrics = {"psnr": lo.psnr.mean(),
                   "overflow_gaussians": out["overflow_gaussians"],
                   "overflow_tiles": out["overflow_tiles"]}
        for name, (value, lam) in parts.items():
            metrics[name] = value
            total = total + value * C(lam, step)
        metrics["loss"] = total
        return total, metrics

    def sample(self, params, cond_images, c2w, fxfycxcy, rng,
               return_trajectory: bool = False):
        """Scene sampling: clip_denoised=False (diffusion_gs_system_scene
        validation_step :178)."""
        b, n_cond, _, h, w = cond_images.shape
        v_total = c2w.shape[1]
        rng_noise, rng_loop = jax.random.split(rng)
        noise = jax.random.normal(
            rng_noise, (b, v_total - n_cond, 3, h, w), jnp.float32)
        loop_fn = self.make_model_fn(params, c2w, fxfycxcy, h, w,
                                     skip_cond_render=n_cond)
        final_fn = self.make_model_fn(params, c2w, fxfycxcy, h, w)
        out = p_sample_loop(self.sched_infer, loop_fn,
                            cond_images.astype(jnp.float32), noise, rng_loop,
                            clip_denoised=False,
                            return_trajectory=return_trajectory,
                            final_model_fn=final_fn)
        gaussians, alpha = out.pop("aux")
        out["gaussians"] = gaussians
        out["alpha"] = alpha
        return out

    @staticmethod
    def save_result_for_eval(trial_dir: str, step: int, uid: str,
                             render_images: np.ndarray,
                             input_images: np.ndarray) -> str:
        """npz dump for eval_scene_result (reference saves .pt, :221-228)."""
        d = os.path.join(trial_dir, "save", f"it{step}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{uid}.npz")
        np.savez_compressed(path, render_images=render_images,
                            image=input_images)
        return path
