"""Build systems/optimizers from the reference-shaped YAML config surface.

Maps the reference `system:` block (configs/diffusionGS_rel.yaml et al.) to
TPU-native configs, tolerating reference-only knobs that have a fixed
TPU-side answer (use_flash -> always fused attention; prior_distribution
is always 'gaussian' in shipped configs; grad_checkpoint_every -> remat).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..ops.rasterize import RasterizeConfig
from ..parallel.train_step import OptimizerConfig

# reference shape_model keys -> DGSDenoiser fields (None = consumed/ignored)
_SHAPE_MODEL_MAP = {
    "width": "width",
    "in_channels": "in_channels",
    "patch_size": "patch_size",
    "n_gaussians": "n_gaussians",
    "dim_heads": "dim_heads",
    "num_layers": "num_layers",
    "ray_pe_type": "ray_pe_type",
    "hard_pixelalign": "hard_pixelalign",
    "clip_xyz": "clip_xyz",
    "gaussians_sh_degree": "gaussians_sh_degree",
    "range_setting_near": "range_setting_near",
    "range_setting_far": "range_setting_far",
    "use_checkpoint": "remat",
    # TPU-native extension: named-checkpoint policy keeping attention
    # outputs/residuals across the DiT backward (docs/PERF_NOTES.md)
    "remat_save_attn": "remat_save_attn",
    "remat_save_mlp": "remat_save_mlp",
    # TPU-native extension: W8A8 int8 serving mode (ops/quant.py)
    "quant_int8": "quant_int8",
    # TPU-side constants / unused reference knobs:
    "use_flash": None, "prior_distribution": None, "use_gssplat": None,
    "grad_checkpoint_every": None,
    "use_downsample": None, "num_latents": None, "range_setting_type": None,
    # lifted to the system level (stage-2 bootstrap, see build_system):
    "pretrained_model_name_or_path": "__system__",
}


def shape_model_kwargs(cfg: Dict[str, Any], bf16: bool = True
                       ) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in dict(cfg).items():
        if k not in _SHAPE_MODEL_MAP:
            raise ValueError(f"unknown shape_model key {k!r}")
        tgt = _SHAPE_MODEL_MAP[k]
        if tgt is not None and tgt != "__system__":
            out[tgt] = v
    if bf16:
        out.setdefault("dtype", jnp.bfloat16)
    return out


def build_system(system_type: str, system_cfg: Dict[str, Any],
                 bf16: bool = True, raster: RasterizeConfig = None,
                 tp_mesh=None):
    """system_type: 'diffusion-gs-system' | 'diffusion-gs-scene-system'.

    tp_mesh: dp x tp jax.sharding.Mesh for tensor-parallel training — the
    attention kernel is shard_mapped over the model axis (launch.py builds
    it from trainer.model_parallel)."""
    import open_diffusiongs_tpu as pkg
    from .object_system import ObjectSystemConfig
    from .scene_system import SceneSystemConfig

    cfg = dict(system_cfg)
    loss = dict(cfg.get("loss", {}))
    noise = dict(cfg.get("noise_scheduler", {}))
    sm = shape_model_kwargs(cfg.get("shape_model", {}), bf16=bf16)
    if tp_mesh is not None and tp_mesh.shape.get("model", 1) > 1:
        sm["tp_mesh"] = tp_mesh
    if tp_mesh is not None and tp_mesh.shape.get("seq", 1) > 1:
        sm["sp_mesh"] = tp_mesh       # one (data, pipe, seq, model) mesh
    if tp_mesh is not None and tp_mesh.shape.get("pipe", 1) > 1:
        sm["pp_mesh"] = tp_mesh
    if system_type == "diffusion-gs-scene-system":
        sm.setdefault("ray_pe_type", "plk")
        cfg_cls = SceneSystemConfig
    else:
        cfg_cls = ObjectSystemConfig

    kwargs: Dict[str, Any] = dict(
        num_inference_steps=cfg.get("num_inference_steps", 30),
        num_train_timesteps=noise.get("num_train_timesteps", 1000),
        shape_model=sm,
    )
    # stage-2 bootstrap + partial-load surface (see ObjectSystemConfig)
    pmp = cfg.get("shape_model", {}).get("pretrained_model_name_or_path")
    if pmp:
        kwargs["pretrained_model_name_or_path"] = pmp
    if cfg.get("weights"):
        kwargs["weights"] = cfg["weights"]
    if cfg.get("weights_ignore_modules"):
        kwargs["weights_ignore_modules"] = tuple(cfg["weights_ignore_modules"])
    for lam in ("lambda_diffusion", "lambda_lpips", "lambda_ssim",
                "lambda_pointsdist", "lambda_xyz"):
        if lam in loss:
            v = loss[lam]
            kwargs[lam] = tuple(v) if isinstance(v, list) else v
    if raster is not None:
        kwargs["raster"] = raster
    elif "raster" in cfg:
        kwargs["raster"] = RasterizeConfig(**cfg["raster"])
    for k in ("use_lpips", "lpips_weights", "bg_color"):
        if k in cfg:
            kwargs[k] = cfg[k]
    if system_type == "diffusion-gs-scene-system":
        for k in ("save_intermediate_video", "save_result_for_eval"):
            if k in cfg:
                kwargs[k] = cfg[k]

    system_cls = pkg.find(system_type)
    return system_cls(cfg_cls(**kwargs))


def build_optimizer_config(system_cfg: Dict[str, Any],
                           trainer_cfg: Dict[str, Any]) -> OptimizerConfig:
    opt = dict(system_cfg.get("optimizer", {}))
    args = dict(opt.get("args", {}))
    sched = dict(system_cfg.get("scheduler", {}))
    sargs = dict(sched.get("args", {}))
    # composite specs (SequentialLR/ChainedScheduler, utils/scheduler.py:
    # 55-104) pass through whole for parse_schedule's recursion
    if sched.get("schedulers"):
        scheduler = sched
    else:
        scheduler = sched.get("name", "constant") or "constant"
    return OptimizerConfig(
        name=opt.get("name", "AdamW"),
        lr=float(args.get("lr", 1e-5)),
        betas=tuple(args.get("betas", (0.9, 0.99))),
        eps=float(args.get("eps", 1e-8)),
        weight_decay=float(args.get("weight_decay", 0.01)),
        grad_clip=float(trainer_cfg.get("gradient_clip_val", 0.0) or 0.0),
        scheduler=scheduler,
        t_max=int(sargs.get("T_max", 500_000)),
        eta_min=float(sargs.get("eta_min", 0.0)),
        accumulate_grad_batches=int(
            trainer_cfg.get("accumulate_grad_batches", 1)),
        # per-module param groups (utils/scheduler.py:34-41)
        params=opt.get("params") or None,
    )
