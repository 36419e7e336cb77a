"""Object-level system: training loss + sampling, functional for pjit.

TPU-native re-design of the reference `PointDiffusionSystem`
("diffusion-gs-system", systems/diffusion_gs_system.py:27-216).  Instead of
a LightningModule with hooks, the system is a plain object exposing pure
functions:

  * `train_loss(params, batch, rng, step)` — the reference forward()
    (:71-115): rays for the input views, noise injection on views 1:
    (view 0 stays the clean condition), denoiser -> Gaussians -> render all
    supervision views, loss assembly with C()-scheduled lambdas (:118-124).
  * `sample(params, cond, cameras, rng)` — the 30-step inference loop
    (pipline_obj.py:297-306) fully jitted.

Batch dict keys follow the reference data contract (data/base.py:158-243):
  rgbs_input [b, v_in, 3, h, w], c2ws_input [b, v_in, 4, 4],
  fxfycxcys_input [b, v_in, 4], depths_input [b, v_in, 1, h, w],
  masks_input [b, v_in, 1, h, w], rgbs / c2ws / fxfycxcys / masks for the
  supervision views.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import open_diffusiongs_tpu as pkg

from ..diffusion import create_schedule, p_sample_loop, q_sample
from ..models.denoiser import DGSDenoiser
from ..ops import rasterize
from ..ops.rays import rays_chw
from ..utils import config as config_lib
from ..utils.schedules import C
from . import losses as losses_lib


@dataclasses.dataclass(frozen=True)
class ObjectSystemConfig:
    num_inference_steps: int = 30
    num_train_timesteps: int = 1000
    noise_schedule: str = "squaredcos_cap_v2"
    # loss lambdas: float or [start_step, v0, v1, end_step]
    # (configs/diffusionGS_rel.yaml:50-56)
    lambda_diffusion: Any = (150, 0.0, 1.0, 151)
    lambda_lpips: Any = (150, 0.0, 0.5, 151)
    lambda_ssim: Any = 0.0
    lambda_pointsdist: Any = (150, 1.0, 0.0, 151)
    lambda_xyz: Any = (150, 0.0, 0.025, 151)
    use_lpips: bool = True
    lpips_weights: Optional[str] = None
    # random-init VGG is harmful as a loss; require explicit opt-in to use
    # LPIPS without converted pretrained weights
    allow_random_lpips: bool = False
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    raster: rasterize.RasterizeConfig = rasterize.RasterizeConfig()
    # model config passed straight to DGSDenoiser
    shape_model: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # stage-2-from-stage-1 bootstrap: weight source loaded into the denoiser
    # at init, strict (denoiser_scene.py:264-290 via
    # system.shape_model.pretrained_model_name_or_path in the scene YAML)
    pretrained_model_name_or_path: Optional[str] = None
    # BaseSystem-style partial load, non-strict, with module exclusions
    # (systems/base.py:27-28,47-57 + utils/misc.py:40-70)
    weights: Optional[str] = None
    weights_ignore_modules: Optional[Tuple[str, ...]] = None

    def make_model(self) -> DGSDenoiser:
        return DGSDenoiser(**dict(self.shape_model))


@pkg.register("diffusion-gs-system")
class ObjectSystem:
    """Owns model + schedules; all heavy methods are pure functions of
    (params, batch, rng) suitable for jit/pjit."""

    def __init__(self, cfg: ObjectSystemConfig):
        self.cfg = cfg
        self.model = cfg.make_model()
        self.sched_train = create_schedule(
            None, cfg.noise_schedule, cfg.num_train_timesteps)
        self.sched_infer = create_schedule(
            str(cfg.num_inference_steps), cfg.noise_schedule,
            cfg.num_train_timesteps)
        self.lpips_params = (
            losses_lib.lpips_init_params(cfg.lpips_weights)
            if cfg.use_lpips else None)
        self._lpips_missing = False
        if (self.lpips_params is not None
                and not self.lpips_params["pretrained"]
                and not cfg.allow_random_lpips):
            # The reference always uses pretrained lpips-VGG; optimizing
            # against a random network would silently corrupt training.
            # Sampling never touches LPIPS, so init only records the gap;
            # train_loss hard-fails if the config actually weights it.
            self._lpips_missing = True
            self.lpips_params = None

    # -- initialization ----------------------------------------------------
    def init_params(self, rng: jax.Array, h: int, w: int, v: int = 4):
        imgs = jnp.zeros((1, v, 3, h, w), jnp.float32)
        rays = jnp.zeros((1, v, 3, h, w), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        # jit the init: XLA dead-code-eliminates the (discarded) forward
        # pass, leaving only the parameter initializers — one small
        # executable instead of thousands of eager op dispatches (122 s ->
        # ~2 s at 256^2 through the axon relay; docs/PERF_NOTES.md r3).
        return jax.jit(self.model.init)(rng, imgs, rays, rays, t)

    def load_pretrained(self, params):
        """Apply the config's weight bootstraps to freshly-init params.

        1. `pretrained_model_name_or_path`: strict full-denoiser load — the
           stage-2-from-stage-1 recipe (denoiser_scene.py:264-290).
        2. `weights` (+ `weights_ignore_modules`): non-strict partial load
           (systems/base.py:47-57).
        """
        import re as _re

        from ..utils import checkpoint as ckpt_lib
        cfg = self.cfg
        if cfg.pretrained_model_name_or_path:
            print(f"Loading pretrained shape model from "
                  f"{cfg.pretrained_model_name_or_path}")
            src = ckpt_lib.load_weights_file(cfg.pretrained_model_name_or_path)
            params = ckpt_lib.load_module_weights(params, src, strict=True)
        if cfg.weights:
            src = ckpt_lib.load_weights_file(cfg.weights)
            ignore = None
            if cfg.weights_ignore_modules:
                ignore = ("^(?:" + "|".join(
                    _re.escape(m) for m in cfg.weights_ignore_modules)
                    + ")(/|$)")
            params = ckpt_lib.load_module_weights(params, src, ignore=ignore,
                                                  strict=False)
        return params

    # -- training ----------------------------------------------------------
    def _gt_xyz(self, batch, ray_o, ray_d) -> Optional[jnp.ndarray]:
        """Ground-truth pixel points from depth (object data has depth;
        the scene system overrides this to None)."""
        return ray_o + ray_d * batch["depths_input"].astype(jnp.float32)

    def train_loss(self, params, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, step) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        if self._lpips_missing and config_lib.C_max(cfg.lambda_lpips) > 0:
            # The reference recipe weights LPIPS from step 150
            # (configs/diffusionGS_rel.yaml:52); training without the
            # pretrained VGG would silently optimize a DIFFERENT loss.
            # Refuse rather than diverge (VERDICT r3 #6).
            raise RuntimeError(
                "LPIPS is weighted in this config (lambda_lpips="
                f"{cfg.lambda_lpips}) but no pretrained VGG-LPIPS weights "
                "are available. Provide system.lpips_weights (NPZ from "
                "tools/convert_lpips_weights.py), or explicitly waive the "
                "term with system.use_lpips=false / system.lambda_lpips=0.0 "
                "/ system.allow_random_lpips=true.")
        images = batch["rgbs_input"].astype(jnp.float32)
        b, v, _, h, w = images.shape
        ray_o, ray_d = rays_chw(batch["c2ws_input"],
                                batch["fxfycxcys_input"], h, w)

        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, images.shape, jnp.float32)
        t = jax.random.randint(rng_t, (b,), 0, cfg.num_train_timesteps)
        noisy = q_sample(self.sched_train, images[:, 1:], t, noise[:, 1:])
        x = jnp.concatenate([images[:, :1], noisy], axis=1)

        # training=False: the reference never passes training=True, so its
        # clip_xyz clamp NEVER fires in its training path either
        # (image_to_gaussians call sites, diffusion_gs_system.py:90)
        gaussians, img_xyz = self.model.apply(
            params, x, ray_o, ray_d, t, training=False)
        out = rasterize.render(gaussians, batch["c2ws"], batch["fxfycxcys"],
                               h, w, bg_color=cfg.bg_color, cfg=cfg.raster)

        gt_xyz = self._gt_xyz(batch, ray_o, ray_d)
        lo = losses_lib.compute_losses(
            out["render"], batch["rgbs"].astype(jnp.float32), ray_o,
            img_aligned_xyz=img_xyz, gt_img_aligned_xyz=gt_xyz,
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
                   "overflow_tiles": out["overflow_tiles"],
                   # fraction of per-tile candidate entries dropped by the
                   # K capacity — see docs/CAPACITY.md for thresholds
                   "overflow_frac": out["overflow_gaussians"].astype(
                       jnp.float32)
                   / jnp.maximum(out["binned_entries"], 1).astype(
                       jnp.float32)}
        for name, (value, lam) in parts.items():
            metrics[name] = value
            total = total + value * C(lam, step)
        metrics["loss"] = total
        return total, metrics

    # -- inference ---------------------------------------------------------
    def make_model_fn(self, params, c2w, fxfycxcy, h: int, w: int,
                      training: bool = False, skip_cond_render: int = 0):
        """model_fn for the diffusion loop: renders the SAME views that are
        fed in (sampling contract of p_mean_variance,
        gaussian_diffusion.py:349-364).

        skip_cond_render=n drops the first n (condition) views from the
        RENDER camera set — their renders are never consumed inside the
        sampling loop, so skipping them saves n/v of the rasterizer work
        per step (the final step renders all views)."""
        ray_o, ray_d = rays_chw(c2w, fxfycxcy, h, w)
        rc2w = c2w[:, skip_cond_render:]
        rfxy = fxfycxcy[:, skip_cond_render:]
        # inference never differentiates through the render: use the
        # early-exit blend (bit-identical, skips saturated depth chunks)
        # and drop the remat wrapper (pure overhead without a backward)
        rcfg = (self.cfg.raster if training
                else self.cfg.raster._replace(early_exit=True, remat=False))

        def model_fn(images, t):
            g, pix_xyz = self.model.apply(params, images, ray_o, ray_d, t,
                                          training=training)
            out = rasterize.render(g, rc2w, rfxy, h, w,
                                   bg_color=self.cfg.bg_color,
                                   cfg=rcfg)
            return out["render"].astype(jnp.float32), (g, out["alpha"])
        return model_fn

    def sample(self, params, cond_images: jnp.ndarray, c2w: jnp.ndarray,
               fxfycxcy: jnp.ndarray, rng: jax.Array,
               return_trajectory: bool = False) -> Dict[str, Any]:
        """30-step generation.  cond_images [b, n_cond, 3, h, w];
        c2w/fxfycxcy [b, v_total, ...] with the cond views FIRST."""
        b, n_cond, _, h, w = cond_images.shape
        v_total = c2w.shape[1]
        rng_noise, rng_loop = jax.random.split(rng)
        noise = jax.random.normal(
            rng_noise, (b, v_total - n_cond, 3, h, w), jnp.float32)
        loop_fn = self.make_model_fn(params, c2w, fxfycxcy, h, w,
                                     skip_cond_render=n_cond)
        final_fn = self.make_model_fn(params, c2w, fxfycxcy, h, w)
        # clip_denoised=False: every reference sampling call site disables
        # the [-1, 1] clamp (pipline_obj.py:302, diffusion_gs_system.py:176)
        out = p_sample_loop(self.sched_infer, loop_fn,
                            cond_images.astype(jnp.float32), noise, rng_loop,
                            clip_denoised=False,
                            return_trajectory=return_trajectory,
                            final_model_fn=final_fn)
        gaussians, alpha = out.pop("aux")
        out["gaussians"] = gaussians
        out["alpha"] = alpha
        return out
