"""Decompose the training step cost (r3: 356 ms @256^2 b=1).

Times, each as a jitted value_and_grad over its own inputs:
  full      grad of train_loss wrt params            (the real step, no opt)
  dit       grad of a gaussians-only surrogate loss  (DiT fwd+bwd, no render)
  render    grad of render+losses wrt the GAUSSIANS  (raster fwd+bwd + losses)
  losses    grad of compute_losses wrt the RENDER    (loss stack alone)

full ~= dit + render + (optimizer/EMA overhead vs bench_train_step).

Usage: python tools/bench_train_breakdown.py [--res 256] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--views", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import bench as bench_mod
    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops import rasterize
    from open_diffusiongs_tpu.ops.rays import rays_chw
    from open_diffusiongs_tpu.systems import losses as losses_lib

    bench_mod.wait_for_device()
    h = w = args.res
    v = args.views
    system = bench_mod._make_system(h, w, remat=True)
    cfg = system.cfg
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=v)

    c2ws, fxy = _orbit_cameras(v, h=h, w=w)
    rng = np.random.default_rng(0)
    batch = {
        "rgbs_input": jnp.asarray(
            rng.uniform(size=(1, v, 3, h, w)), jnp.float32),
        "c2ws_input": jnp.asarray(c2ws)[None],
        "fxfycxcys_input": jnp.asarray(fxy)[None],
        "depths_input": jnp.full((1, v, 1, h, w), 3.0),
        "masks_input": jnp.ones((1, v, 1, h, w)),
        "rgbs": jnp.asarray(rng.uniform(size=(1, v, 3, h, w)), jnp.float32),
        "c2ws": jnp.asarray(c2ws)[None],
        "fxfycxcys": jnp.asarray(fxy)[None],
        "masks": jnp.ones((1, v, 1, h, w)),
    }
    key = jax.random.PRNGKey(7)

    def timed(name, fn, *a):
        out = fn(*a)
        jax.tree.flatten(out)
        # sync by fetching a scalar (axon relay: block_until_ready lies)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"  {name:28s}: {dt:7.1f} ms")
        return dt

    # ---- full loss grad (no optimizer update) -----------------------------
    @jax.jit
    def full_grad(p, b, k):
        def loss(p_):
            l, _ = system.train_loss(p_, b, k, 0)
            return l
        return jax.grad(loss)(p)

    # ---- DiT-only: surrogate loss on the gaussians ------------------------
    @jax.jit
    def dit_grad(p, b, k):
        images = b["rgbs_input"].astype(jnp.float32)
        ray_o, ray_d = rays_chw(b["c2ws_input"], b["fxfycxcys_input"], h, w)

        def loss(p_):
            g, img_xyz = system.model.apply(
                p_, images, ray_o, ray_d,
                jnp.zeros((1,), jnp.int32), training=False)
            s = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                    for x in jax.tree.leaves(g))
            return s + jnp.sum(img_xyz * img_xyz)
        return jax.grad(loss)(p)

    # ---- render+losses wrt gaussians (raster fwd+bwd + loss stack) --------
    images = batch["rgbs_input"].astype(jnp.float32)
    ray_o, ray_d = rays_chw(batch["c2ws_input"], batch["fxfycxcys_input"],
                            h, w)
    g0, xyz0 = jax.jit(lambda p: system.model.apply(
        p, images, ray_o, ray_d, jnp.zeros((1,), jnp.int32),
        training=False))(params)

    @jax.jit
    def render_grad(g, xyz):
        def loss(g_):
            out = rasterize.render(g_, batch["c2ws"], batch["fxfycxcys"],
                                   h, w, bg_color=cfg.bg_color,
                                   cfg=cfg.raster)
            lo = losses_lib.compute_losses(
                out["render"], batch["rgbs"].astype(jnp.float32), ray_o,
                img_aligned_xyz=xyz, gt_img_aligned_xyz=xyz,
                masks=batch.get("masks_input"),
                lpips_params=system.lpips_params, use_lpips=cfg.use_lpips)
            return lo.l2.mean() + lo.ssim.mean() + lo.pointsdist.mean()
        return jax.grad(loss)(g)

    # ---- loss stack alone wrt render --------------------------------------
    r0 = jax.jit(lambda g: rasterize.render(
        g, batch["c2ws"], batch["fxfycxcys"], h, w,
        bg_color=cfg.bg_color, cfg=cfg.raster)["render"])(g0)

    @jax.jit
    def losses_grad(r):
        def loss(r_):
            lo = losses_lib.compute_losses(
                r_, batch["rgbs"].astype(jnp.float32), ray_o,
                img_aligned_xyz=xyz0, gt_img_aligned_xyz=xyz0,
                masks=batch.get("masks_input"),
                lpips_params=system.lpips_params, use_lpips=cfg.use_lpips)
            return lo.l2.mean() + lo.ssim.mean() + lo.pointsdist.mean()
        return jax.grad(loss)(r)

    print(f"train-step breakdown @{h}x{w}, b=1, {v} input/{v} sup views, "
          f"iters={args.iters}")
    t_full = timed("full loss grad", full_grad, params, batch, key)
    t_dit = timed("DiT fwd+bwd (no render)", dit_grad, params, batch, key)
    t_ren = timed("render fwd+bwd + losses", render_grad, g0, xyz0)
    t_los = timed("loss stack alone", losses_grad, r0)
    print(f"  {'unattributed (full - dit - render)':28s}: "
          f"{t_full - t_dit - t_ren:7.1f} ms")
    print(f"  render net of losses: {t_ren - t_los:.1f} ms")


if __name__ == "__main__":
    main()
