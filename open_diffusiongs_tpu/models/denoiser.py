"""DGS denoiser: posed-image DiT that outputs per-pixel 3D Gaussians.

TPU-native re-design of the reference object denoiser
(`models/denoiser/denoiser.py:168-446`) and scene denoiser
(`models/denoiser/denoiser_scene.py:173-458`) as one flax module — the two
differ only in ray positional encoding and the pixel-aligned depth head:

  object ("relative_plk", denoiser.py:312-332, 384-396):
    posed  = [rgb*2-1, ray_d, nearest_pts]  (nearest_pts = o + (-o.d) d)
    depth  = (2*sigmoid(mean(xyz_raw)) - 1) * 1.8 + o_dot_d
    xyz    = ray_o + depth * ray_d, clipped to [-1, 1] while training

  scene ("plk", denoiser_scene.py:319-330, 406-410):
    posed  = [rgb*2-1, o x d, ray_d]
    depth  = sigmoid(mean(xyz_raw)) * (far - near) + near
    xyz    = ray_o + depth * ray_d (no clip)

Head activations replicate GaussiansUpsampler.to_gs (denoiser.py:103-120):
scaling = (raw - 2.3).clamp(max=-1.2), opacity = raw - 2.0; xyz/rotation raw.
Token layout matches the reference exactly (patch order (hh ww), feature
order (ph pw c), tokens = [2 gaussian tokens ‖ v*n_patch image tokens]) so
published checkpoints can be converted weight-for-weight.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from einops import rearrange

from ..ops.gaussians import Gaussians
from .transformer import INIT, DiTStack, TimestepEmbedder, modulate

Dtype = Any

GS_CH = lambda sh_degree: 3 + (sh_degree + 1) ** 2 * 3 + 3 + 4 + 1  # noqa: E731


class AdaLNHead(nn.Module):
    """Shared shape of GaussiansUpsampler / ImageTokenDecoder
    (denoiser.py:76-164): LN(no bias) -> modulate(shift, scale) -> Dense."""

    width: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(2 * self.width, use_bias=True, kernel_init=INIT,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="adaLN_modulation_1")(nn.silu(t_emb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=True, epsilon=1e-5,
                         name="layernorm")(tokens)
        x = modulate(x, shift, scale)
        return nn.Dense(self.out_features, use_bias=False, kernel_init=INIT,
                        dtype=self.dtype, name="linear")(x)


class DGSDenoiser(nn.Module):
    """Image(+noise) -> per-pixel 3D Gaussians (the x0-predictor)."""

    width: int = 1024
    in_channels: int = 9           # rgb + 6ch ray PE
    patch_size: int = 8
    n_gaussians: int = 2           # free (non-pixel-aligned) Gaussian tokens
    dim_heads: int = 64
    num_layers: int = 24
    ray_pe_type: str = "relative_plk"   # "relative_plk" (object) | "plk" (scene)
    hard_pixelalign: bool = True
    clip_xyz: bool = True
    gaussians_sh_degree: int = 0
    rel_depth_scale: float = 1.8        # object depth half-range (denoiser.py:390)
    range_setting_near: float = 0.0     # scene (denoiser_scene.py:263)
    range_setting_far: float = 500.0
    dtype: Dtype = jnp.float32          # compute dtype (bf16 on TPU)
    remat: bool = True
    # under remat, keep attention outputs/residuals as named checkpoints
    # (DiTStack.remat_save_attn — trades HBM for backward recompute)
    remat_save_attn: bool = False
    remat_save_mlp: bool = False   # also keep fc1 hidden (DiTStack doc)
    attn_impl: str = "auto"   # 'flash' (TPU Pallas) | 'splash' | 'xla'
    # dp x tp jax.sharding.Mesh: shard_map the attention kernel over the
    # model axis (megatron column-parallel q/k/v; see models/transformer.py)
    tp_mesh: Optional[Any] = None
    # Mesh with a seq axis > 1: sequence (context) parallelism — tokens
    # sharded through the DiT stack, ring attention (parallel/ring.py).
    sp_mesh: Optional[Any] = None
    # Mesh with a pipe axis > 1: GPipe pipeline parallelism — the stacked
    # layer axis sharded over `pipe` (parallel/pipeline.py).
    pp_mesh: Optional[Any] = None
    pp_microbatches: Optional[int] = None
    # Serving-mode W8A8 int8 DiT projections (ops/quant.py) — inference
    # only; checkpoints are unchanged (same param tree).
    quant_int8: bool = False
    # Diagnostic/bench knobs: additive offsets on the RAW head outputs of
    # the scaling / opacity channels (before the to_gs activations).  The
    # head linears carry no bias (matching the reference heads), so this is
    # the only way to place a random-weights model's emitted population at
    # the measured trained-checkpoint statistics (docs/CAPACITY.md) — used
    # by bench.py's trained-stats sampler and by capacity diagnostics.
    # Zero = off (the default); the param tree is unchanged either way.
    gs_raw_offset_scaling: float = 0.0
    gs_raw_offset_opacity: float = 0.0

    @nn.compact
    def __call__(self, images: jnp.ndarray, ray_o: jnp.ndarray,
                 ray_d: jnp.ndarray, t: jnp.ndarray,
                 training: bool = False) -> Tuple[Gaussians, jnp.ndarray]:
        """
        images: [b, v, 3, h, w] in [0, 1] (view 0 = clean condition).
        ray_o/ray_d: [b, v, 3, h, w] world-space rays (ray_d unit norm).
        t: [b] diffusion timesteps.

        Returns (Gaussians with N = n_gaussians + v*h*w, per-pixel depth-xyz
        [b, v, 3, h, w] used by the xyz loss).
        """
        b, v, _, h, w = images.shape
        p = self.patch_size
        gs_ch = GS_CH(self.gaussians_sh_degree)
        if training and self.quant_int8:
            # int8 rounding has zero gradient a.e. — training through it
            # would silently learn nothing in the quantized projections
            raise ValueError("quant_int8 is a serving-mode knob; disable "
                             "it for training (shape_model.quant_int8)")

        if self.ray_pe_type == "relative_plk":
            o_dot_d = jnp.sum(-ray_o * ray_d, axis=2, keepdims=True)
            nearest_pts = ray_o + o_dot_d * ray_d
            posed = jnp.concatenate(
                [images[:, :, :3] * 2.0 - 1.0, ray_d, nearest_pts], axis=2)
        elif self.ray_pe_type == "plk":
            o_cross_d = jnp.cross(ray_o, ray_d, axis=2)
            posed = jnp.concatenate(
                [images[:, :, :3] * 2.0 - 1.0, o_cross_d, ray_d], axis=2)
        else:
            raise ValueError(f"unknown ray_pe_type {self.ray_pe_type}")

        # Patchify exactly like the reference Rearrange (denoiser.py:210-222).
        tokens = rearrange(posed.astype(self.dtype),
                           "b v c (hh ph) (ww pw) -> b (v hh ww) (ph pw c)",
                           ph=p, pw=p)
        img_tokens = nn.Dense(self.width, use_bias=False, kernel_init=INIT,
                              dtype=self.dtype,
                              name="image_tokenizer")(tokens)

        t_emb = TimestepEmbedder(self.width, dtype=self.dtype,
                                 name="t_embedder")(t)

        g_pos = self.param(
            "gaussians_pos_embedding",
            nn.initializers.truncated_normal(stddev=0.02),
            (self.n_gaussians, self.width))
        g_tokens = jnp.broadcast_to(g_pos[None], (b,) + g_pos.shape)
        x = jnp.concatenate([g_tokens.astype(self.dtype), img_tokens], axis=1)
        x = nn.LayerNorm(use_bias=False, use_scale=True, epsilon=1e-5,
                         name="transformer_input_layernorm")(x)

        x = DiTStack(self.width, self.width // self.dim_heads,
                     self.num_layers, dtype=self.dtype, remat=self.remat,
                     remat_save_attn=self.remat_save_attn,
                     remat_save_mlp=self.remat_save_mlp,
                     attn_impl=self.attn_impl, tp_mesh=self.tp_mesh,
                     sp_mesh=self.sp_mesh, pp_mesh=self.pp_mesh,
                     pp_microbatches=self.pp_microbatches,
                     quant_int8=self.quant_int8,
                     name="transformer")(x, t_emb)

        g_out = x[:, :self.n_gaussians]
        img_out = x[:, self.n_gaussians:]

        free_gs = AdaLNHead(self.width, gs_ch, dtype=self.dtype,
                            name="upsampler")(g_out, t_emb)
        pix_gs = AdaLNHead(self.width, p * p * gs_ch, dtype=self.dtype,
                           name="image_token_decoder")(img_out, t_emb)
        pix_gs = pix_gs.reshape(b, -1, gs_ch)      # [b, v*h*w, gs] (v hh ww ph pw)

        all_gs = jnp.concatenate([free_gs, pix_gs], axis=1).astype(jnp.float32)
        n_pix = pix_gs.shape[1]

        # to_gs split + activations (denoiser.py:103-120)
        sh_dim = (self.gaussians_sh_degree + 1) ** 2 * 3
        xyz, feats, scaling, rotation, opacity = jnp.split(
            all_gs, [3, 3 + sh_dim, 6 + sh_dim, 10 + sh_dim], axis=2)
        feats = feats.reshape(b, feats.shape[1], -1, 3)
        scaling = jnp.minimum(scaling + self.gs_raw_offset_scaling - 2.3,
                              -1.2)
        opacity = opacity + self.gs_raw_offset_opacity - 2.0

        # Hard pixel alignment (denoiser.py:382-405 / denoiser_scene.py:404-419)
        pix_xyz = rearrange(xyz[:, -n_pix:],
                            "b (v hh ww ph pw) c -> b v c (hh ph) (ww pw)",
                            v=v, hh=h // p, ww=w // p, ph=p, pw=p)
        if self.hard_pixelalign:
            raw_depth = jnp.mean(pix_xyz, axis=2, keepdims=True)
            if self.ray_pe_type == "relative_plk":
                depth = ((2.0 * nn.sigmoid(raw_depth) - 1.0)
                         * self.rel_depth_scale + o_dot_d)
                pix_pts = ray_o + depth * ray_d
                if self.clip_xyz and training:
                    pix_pts = jnp.clip(pix_pts, -1.0, 1.0)
            else:
                depth = (nn.sigmoid(raw_depth)
                         * (self.range_setting_far - self.range_setting_near)
                         + self.range_setting_near)
                pix_pts = ray_o + depth * ray_d
            pix_flat = rearrange(pix_pts,
                                 "b v c (hh ph) (ww pw) -> b (v hh ww ph pw) c",
                                 ph=p, pw=p)
            xyz = jnp.concatenate([xyz[:, :-n_pix], pix_flat], axis=1)
            pix_xyz = pix_pts

        gaussians = Gaussians(xyz=xyz, features=feats, scaling=scaling,
                              rotation=rotation, opacity=opacity)
        return gaussians, pix_xyz
