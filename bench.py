"""Benchmark: end-to-end single-image -> 3D asset wall-clock on one chip.

Runs the flagship object model (24-layer/1024-wide DiT, 30 denoising steps,
1 condition view + 3 generation views) through the fully jitted sample loop
(denoiser + tile rasterizer every step) at BOTH 256^2 and 512^2, plus one
training step (b=1, 256^2), and reports a single JSON line.

Baselines (BASELINE.md):
  * 256^2: the paper claims ~6 s single-image -> 3D on one GPU
    (README.md:39; A100-class).  vs_baseline = ours / 6.0.
  * 512^2: the open-source 512 model claims 24 s (README.md:74).
    vs_baseline_512 = ours / 24.0.

Env knobs: BENCH_RES=256 (primary), BENCH_SKIP_512=1, BENCH_SKIP_TRAIN=1
for faster smoke runs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from open_diffusiongs_tpu.utils.cache import (  # noqa: E402
    enable_persistent_cache)

# env-var JAX_COMPILATION_CACHE_DIR is read too early on this stack (the
# TPU plugin imports jax at interpreter start) — set the config directly.
enable_persistent_cache()

BASELINE_256_S = 6.0    # README.md:39 (paper claim, 1 GPU)
BASELINE_512_S = 24.0   # README.md:74 (open-source 512 model)


def _trained_stat_offsets(res):
    """Raw-head offsets that place the random-weights model's emitted
    population at the measured trained-checkpoint statistics
    (docs/CAPACITY.md; tools/bench_raster.py::synth_gaussians "trained"):
    screen-space size ~1.5 px at the orbit camera (depth ~3, fov 40deg)
    and opacity ~ sigmoid(1.0).  The head raw outputs are ~N(0, 0.1) at
    init, so an additive offset IS the population mean."""
    f = 0.5 * res / np.tan(np.radians(40.0) / 2)
    return float(np.log(1.5 * 3.0 / f) + 2.3), 3.0


def _make_system(h, w, steps=30, remat=False, scene=False, quant=False,
                 trained_stats=False, split=None):
    from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
    from open_diffusiongs_tpu.systems.object_system import ObjectSystemConfig
    from open_diffusiongs_tpu.systems.scene_system import (
        SceneSystem, SceneSystemConfig)
    from open_diffusiongs_tpu.systems.object_system import ObjectSystem
    model = dict(width=1024, num_layers=24, patch_size=8,
                 dim_heads=64, dtype=jnp.bfloat16, remat=remat,
                 quant_int8=quant)
    raster_kw = {}
    if trained_stats:
        # The reference's 24 s claim (README.md:74) is a TRAINED-model
        # measurement; random init weights give the rasterizer its worst
        # case (~100-tile footprints).  Place the emitted population at
        # trained statistics and ride the shipped eval-config rasterizer
        # (split_slots=2, configs/diffusionGS_scene_eval*.yaml).
        ds, do = _trained_stat_offsets(h)
        model.update(gs_raw_offset_scaling=ds, gs_raw_offset_opacity=do)
    # split=None -> the shipped per-resolution policy (PERF_NOTES r5):
    # split_slots=2 at 256^2 (measured end-to-end win: train 10v 459.2 vs
    # 465.9 ms, sampler 2.463 vs 2.504 s, tools/diag_split_train.py) and
    # single-stream at 512^2, where the adaptive split-binning lax.cond
    # costs ~+15 ms/view inside the jitted 30-step sampler for BOTH
    # populations (init 18.10 vs 19.52 s, trained 18.36 vs 19.81 s —
    # tools/diag_512_split.py), the opposite sign of the bare-render
    # microbench.  split=True/False forces the cond on/off for A/Bs.
    if split is None:
        split = h <= 256
    if split:
        raster_kw["split_slots"] = 2
    if remat and os.environ.get("BENCH_SAVE_ATTN", "1") != "0":
        # attention-residual remat policy: OOM'd on v5e-16GB in round 2,
        # fits since the analytic Pallas blend backward freed the HBM —
        # 379.3 -> 355.3 ms/step b=1, 760.7 -> 726.3 b=2 (PERF_NOTES r3).
        # Matches the training configs; BENCH_SAVE_ATTN=0 opts out.
        model["remat_save_attn"] = True
    if scene:
        # flagship scene denoiser (configs/diffusionGS_scene.yaml:27-36)
        model.update(ray_pe_type="plk", range_setting_near=0.0,
                     range_setting_far=500.0)
        return SceneSystem(SceneSystemConfig(
            num_inference_steps=steps, shape_model=model,
            raster=RasterizeConfig(max_tiles_per_gaussian=16,
                                   max_per_tile=1024, blend_chunk=32,
                                   **raster_kw),
            use_lpips=False))
    return ObjectSystem(ObjectSystemConfig(
        num_inference_steps=steps,
        shape_model=model,
        # K=1024: the lossless-in-practice capacity for 4-view pixel-aligned
        # models (docs/CAPACITY.md) — the bench renders what CUDA renders
        raster=RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=1024,
                               blend_chunk=32, **raster_kw),
        use_lpips=False,
    ))


def bench_sample(h, w, n_views=4, steps=30, scene=False, quant=False,
                 trained_stats=False, split=None):
    """Returns (best_seconds, compile_seconds).

    split=None follows the shipped per-resolution policy (2 at 256^2,
    single-stream at 512^2 — docs/PERF_NOTES.md r5); True/False forces
    the split-stream binning cond on/off for A/Bs
    (tools/diag_512_split.py, tools/diag_split_train.py)."""
    from __graft_entry__ import _orbit_cameras

    kw = {} if split is None else {"split": split}
    system = _make_system(h, w, steps, scene=scene, quant=quant,
                          trained_stats=trained_stats, **kw)
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=n_views)
    c2ws, fxy = _orbit_cameras(n_views, h=h, w=w)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)
    c2w = np.asarray(c2ws)[None]  # host constant: no trace-time device fetch
    fxy = np.asarray(fxy)[None]

    sample = jax.jit(lambda p, c, rng: system.sample(p, c, c2w, fxy, rng))

    def run(key):
        out = sample(params, cond, key)
        # NOTE: under the axon relay block_until_ready can return before the
        # remote computation finishes; fetching a scalar is the reliable sync.
        return float(out["sample"].sum())

    t0 = time.time()
    run(jax.random.PRNGKey(1))
    compile_s = time.time() - t0
    times = []
    for i in range(3):
        t0 = time.time()
        run(jax.random.PRNGKey(2 + i))
        times.append(time.time() - t0)
    return min(times), compile_s


def bench_train_step(h, w, n_views=4, sup_views=4, iters=8, b=1,
                     scene=False, trained_stats=False, split=None):
    """One-chip training throughput (the per-chip unit of the reference's
    4/GPU x 8 GPU object recipe, configs/diffusionGS_rel.yaml:14, and the
    12/GPU scene recipe, diffusionGS_scene_512.yaml:16).
    Returns (ms_per_step, samples_per_sec_chip, mfu_pct)."""
    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.parallel.train_step import (
        OptimizerConfig, init_train_state, make_optimizer, make_train_step)

    # remat=True: training without activation rematerialization OOMs at
    # 24 layers (the reference trains with gradient checkpointing too,
    # configs/diffusionGS_rel.yaml gradient_checkpointing)
    # split mirrors the shipped train configs (see raster.split_slots in
    # configs/diffusionGS_rel.yaml; tools/diag_split_train.py A/Bs it)
    system = _make_system(h, w, remat=True, scene=scene, split=split,
                          trained_stats=trained_stats)
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=n_views)
    tx = make_optimizer(OptimizerConfig(lr=1e-5))
    state = init_train_state(params, tx, ema_decay=0.9999)
    step = make_train_step(system.train_loss, tx, mesh=None,
                           ema_decay=0.9999, donate=True)

    c2ws, fxy = _orbit_cameras(max(n_views, sup_views), h=h, w=w)
    rng = np.random.default_rng(0)
    bc = lambda a, shape: jnp.asarray(  # noqa: E731
        np.broadcast_to(a, shape).copy())
    batch = {
        "rgbs_input": jnp.asarray(
            rng.uniform(size=(b, n_views, 3, h, w)), jnp.float32),
        "c2ws_input": bc(c2ws[:n_views], (b, n_views, 4, 4)),
        "fxfycxcys_input": bc(fxy[:n_views], (b, n_views, 4)),
        "depths_input": jnp.full((b, n_views, 1, h, w), 3.0),
        "masks_input": jnp.ones((b, n_views, 1, h, w)),
        "rgbs": jnp.asarray(
            rng.uniform(size=(b, sup_views, 3, h, w)), jnp.float32),
        "c2ws": bc(c2ws[:sup_views], (b, sup_views, 4, 4)),
        "fxfycxcys": bc(fxy[:sup_views], (b, sup_views, 4)),
        "masks": jnp.ones((b, sup_views, 1, h, w)),
    }
    key = jax.random.PRNGKey(7)
    state, metrics = step(state, batch, key)     # compile
    float(metrics["loss"])                       # sync
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    dt = (time.time() - t0) / iters
    # DiT-only train-step MFU lower bound (rasterizer/head flops excluded):
    # forward = layers * (dense 2*L*18d^2 + attention 4*L^2*d) per batch
    # element, x4 for backward (~2x) + full-remat recompute (~1x)
    d, layers = 1024, 24
    L = 2 + n_views * (h // 8) * (w // 8)
    f_fwd = layers * (2.0 * L * 18 * d * d + 4.0 * L * L * d)
    mfu = 100 * (4.0 * f_fwd * b) / dt / 197e12
    return dt * 1e3, b / dt, mfu


def bench_attention(l=16386, heads=16, dim=64, iters=20):
    """DiT attention layer at the 512^2 token count (VERDICT r1 item 7:
    measured ms/layer and MFU belong in the bench) — the packed-layout
    kernel the DiT actually runs (ops/attention.py).  MFU counts only the
    l_real tokens against the 197 TF/s bf16 peak; d=64 heads cap the MXU
    at ~50% of that."""
    from open_diffusiongs_tpu.ops.attention import (flash_mha_packed,
                                                    plan_packed)

    lp, blocks = plan_packed(l)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(1, lp, heads * dim)),
                           jnp.bfloat16) for _ in range(3))

    @jax.jit
    def run():
        def body(carry, _):
            o = flash_mha_packed(q + carry.astype(q.dtype), k, v,
                                 num_heads=heads, l_real=l, blocks=blocks)
            return 0.0 * jnp.sum(o.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run())
    t0 = time.time()
    assert float(run()) == 0.0
    dt = (time.time() - t0) / iters
    mfu = 100 * (4.0 * l * l * heads * dim) / dt / 197e12
    return dt * 1e3, mfu


def bench_raster_trained(res=512, render_views=3, iters=20):
    """Full render of the trained-statistics population (docs/CAPACITY.md)
    with split-stream binning off vs on — the configuration the eval
    configs ship (`raster.split_slots: 2`).  bench.py's sampling sections
    can't show this win: the random-weights model emits the init
    population, whose ~100-tile rects stream B would clip
    (docs/PERF_NOTES.md trained-statistics section)."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from bench_raster import loop_timed, synth_gaussians

    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops import rasterize

    h = w = res
    g = synth_gaussians(4 * h * w, np.random.default_rng(0),
                        stats="trained", res=res)
    c2ws, fxy = _orbit_cameras(render_views, h=h, w=w)
    c2w, fxy = jnp.asarray(c2ws)[None], jnp.asarray(fxy)[None]
    out = {}
    for name, split in (("single", 0), ("split2", 2)):
        cfg = rasterize.RasterizeConfig(max_per_tile=512,
                                        split_slots=split)
        fn = jax.jit(lambda gg, cw, fx, cfg=cfg: rasterize.render(
            rasterize.Gaussians(*gg), cw, fx, h, w, cfg=cfg))
        gt = tuple(g)
        ms = loop_timed(
            lambda e: fn(tuple([gt[0] + e] + list(gt[1:])), c2w, fxy),
            iters=iters) * 1e3
        out[name] = ms / render_views
    return out


def wait_for_device(max_tries: int = 40, probe_timeout: int = 90,
                    sleep_s: int = 120) -> None:
    """A crashed Mosaic compile can transiently wedge the remote TPU
    backend (every new process hangs on first device use; recovery is
    usually ~20-40 min but >75 min has been observed — see
    .claude/skills/verify/SKILL.md).  Probe in a SUBPROCESS (a hung
    in-process jax call cannot be timed out) and wait it out so a driver
    bench run is not lost to a transient wedge (40 x 2 min ~= 80 min)."""
    import subprocess
    probe = ("import jax, jax.numpy as jnp;"
             "print('OK', float(jax.device_put(jnp.ones((4,))).sum()))")
    for i in range(max_tries):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=probe_timeout)
            if "OK" in r.stdout:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"[bench] device probe {i + 1}/{max_tries} failed; "
              f"waiting {sleep_s}s", file=sys.stderr, flush=True)
        time.sleep(sleep_s)
    # Fail fast with a diagnostic: proceeding would hang forever on the
    # first in-process device call, losing the run with no output at all.
    print("[bench] device unreachable after all probes; aborting",
          file=sys.stderr, flush=True)
    raise SystemExit(3)


def main():
    wait_for_device()
    h = w = int(os.environ.get("BENCH_RES", "256"))
    steps, n_views = 30, 4

    best, compile_s = bench_sample(h, w, n_views, steps)
    out = {
        "metric": f"image_to_3d_seconds_{h}",
        "value": round(best, 3),
        "unit": "s/asset",
        "vs_baseline": round(best / BASELINE_256_S, 3),
        "compile_s": round(compile_s, 1),
        "denoise_steps": steps,
        "views": n_views,
        "device": str(jax.devices()[0]),
    }
    # Cumulative emission: each section appends its keys and re-prints the
    # whole dict, so if a harness timeout kills the run mid-way the last
    # COMPLETE line still carries the primary metric (the driver parses
    # the final JSON line of stdout).
    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_512"):
        try:
            best512, compile512 = bench_sample(512, 512, n_views, steps)
            out["image_to_3d_seconds_512"] = round(best512, 3)
            # reference open-source claim: 24 s at 512 (README.md:74)
            out["vs_baseline_512"] = round(best512 / BASELINE_512_S, 3)
            out["compile_512_s"] = round(compile512, 1)
            # 3 rendered views/step x 30 steps x (4 * 512^2) Gaussians
            out["mgaussians_per_s_512"] = round(
                steps * 3 * (n_views * 512 * 512) / best512 / 1e6, 1)
        except Exception as ex:  # noqa: BLE001 — keep the primary metric
            out["error_512"] = str(ex)[:200]

        try:
            # Same pipeline with the emitted population at TRAINED
            # statistics (what any real checkpoint produces — the 24 s
            # reference claim is a trained-model number) and the shipped
            # 512 rasterizer config (single-stream, PERF_NOTES r5).  The
            # plain 512 number keeps the conservative init-stats setup.
            b512t, c512t = bench_sample(512, 512, n_views, steps,
                                        trained_stats=True)
            out["image_to_3d_seconds_512_trainedstats"] = round(b512t, 3)
            out["vs_baseline_512_trainedstats"] = round(
                b512t / BASELINE_512_S, 3)
            out["compile_512_trainedstats_s"] = round(c512t, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_512_trained"] = str(ex)[:200]

    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_SCENE"):
        try:
            # scene model family (plk ray PE + depth-range head): 1 input
            # view -> 3 novel views, the RE10K eval shape
            best_sc, compile_sc = bench_sample(h, w, n_views, steps,
                                               scene=True)
            out["scene_image_to_3d_seconds_256"] = round(best_sc, 3)
            out["scene_compile_s"] = round(compile_sc, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_scene"] = str(ex)[:200]

    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_ATTN"):
        try:
            ms, mfu = bench_attention()
            out["attn_ms_per_layer_512"] = round(ms, 2)
            out["attn_mfu_pct_512"] = round(mfu, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_attn"] = str(ex)[:200]

    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_TRAIN"):
        try:
            ms, sps, mfu = bench_train_step(h, w)
            out["train_step_ms_b1"] = round(ms, 1)
            out["train_samples_per_sec_chip"] = round(sps, 3)
            out["train_mfu_pct_dit_only"] = round(mfu, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_train"] = str(ex)[:200]

        try:  # steady-state trained-regime step (population at trained
            # stats — what a real run converges to; docs/CAPACITY.md)
            mst, _, _ = bench_train_step(h, w, trained_stats=True, iters=4)
            out["train_step_ms_b1_trainedstats"] = round(mst, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_train_trained"] = str(ex)[:160]
        print(json.dumps(out), flush=True)

        # capacity: does b=2 fit one v5e-16GB chip? (reference object recipe
        # is 4/GPU on A100-80GB; optax MultiSteps accumulation covers the
        # effective batch when it does not — parallel/train_step.py)
        try:
            ms2, sps2, _ = bench_train_step(h, w, b=2, iters=4)
            out["train_step_ms_b2"] = round(ms2, 1)
            out["train_b2_samples_per_sec_chip"] = round(sps2, 3)
        except Exception as ex:  # noqa: BLE001
            out["train_b2_oom"] = "RESOURCE_EXHAUSTED" in str(ex) or None
            out["error_train_b2"] = str(ex)[:160]
        print(json.dumps(out), flush=True)

        try:  # scene-family train step (1 cond + 3 gen views, RE10K shape)
            ms_sc, _, _ = bench_train_step(h, w, scene=True, iters=4)
            out["scene_train_step_ms_b1"] = round(ms_sc, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_scene_train"] = str(ex)[:160]

        try:  # the REAL object recipe renders 10 supervision views
            # (4 gen + 6 sel, configs/diffusionGS_rel.yaml:13-14) — this is
            # the number an at-scale run's steps_per_sec must be judged
            # against, not the 4-view variant above
            ms10, sps10, _ = bench_train_step(h, w, sup_views=10, iters=4)
            out["train_step_ms_b1_10v"] = round(ms10, 1)
            out["train_10v_samples_per_sec_chip"] = round(sps10, 3)
        except Exception as ex:  # noqa: BLE001
            out["error_train_10v"] = str(ex)[:160]

    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_SCENE512"):
        try:  # scene model at 512^2 (configs/diffusionGS_scene_512.yaml)
            best_s5, compile_s5 = bench_sample(512, 512, n_views, steps,
                                               scene=True)
            out["scene_image_to_3d_seconds_512"] = round(best_s5, 3)
            out["scene_compile_512_s"] = round(compile_s5, 1)
        except Exception as ex:  # noqa: BLE001
            out["error_scene512"] = str(ex)[:160]

    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_RASTER"):
        try:  # trained-stats render: the split-stream binning win
            tr = bench_raster_trained()
            out["raster_trained_ms_view_single"] = round(tr["single"], 1)
            out["raster_trained_ms_view_split2"] = round(tr["split2"], 1)
        except Exception as ex:  # noqa: BLE001
            out["error_raster"] = str(ex)[:160]

    print(json.dumps(out), flush=True)

    if h == 256 and not os.environ.get("BENCH_SKIP_INT8"):
        # Opt-in W8A8 serving mode (ops/quant.py): int8 MXU ops halve the
        # deep dense matmuls (q/k/v/proj/fc1/fc2).  Reported alongside a
        # fidelity number: PSNR of the int8 sampler's renders against the
        # f32 sampler's on the same seed at 256^2 (random-weights model —
        # a distribution proxy, not a claim about trained checkpoints;
        # docs/PERF_NOTES.md int8 section).
        try:
            best8, compile8 = bench_sample(512, 512, n_views, steps,
                                           quant=True)
            out["image_to_3d_seconds_512_int8"] = round(best8, 3)
            out["compile_512_int8_s"] = round(compile8, 1)
            out["int8_psnr_vs_f32_256"] = round(
                _int8_fidelity_psnr(h, w, n_views, steps), 1)
        except Exception as ex:  # noqa: BLE001
            out["error_int8"] = str(ex)[:200]

        try:  # best serving config: trained stats + int8 dense matmuls
            b8t, _ = bench_sample(512, 512, n_views, steps, quant=True,
                                  trained_stats=True)
            out["image_to_3d_seconds_512_serving"] = round(b8t, 3)
        except Exception as ex:  # noqa: BLE001
            out["error_int8_trained"] = str(ex)[:200]

    print(json.dumps(out))


def _int8_fidelity_psnr(h, w, n_views, steps):
    """PSNR between the f32 and int8 samplers' generated views (same
    params, same noise seed)."""
    from __graft_entry__ import _orbit_cameras
    sys_f = _make_system(h, w, steps)
    sys_q = _make_system(h, w, steps, quant=True)
    params = sys_f.init_params(jax.random.PRNGKey(0), h, w, v=n_views)
    c2ws, fxy = _orbit_cameras(n_views, h=h, w=w)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)
    c2w, fxy = np.asarray(c2ws)[None], np.asarray(fxy)[None]
    key = jax.random.PRNGKey(11)
    a = np.asarray(jax.jit(lambda p, c, r: sys_f.sample(p, c, c2w, fxy, r)
                           )(params, cond, key)["sample"], np.float64)
    b = np.asarray(jax.jit(lambda p, c, r: sys_q.sample(p, c, c2w, fxy, r)
                           )(params, cond, key)["sample"], np.float64)
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


if __name__ == "__main__":
    main()
