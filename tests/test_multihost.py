"""Multi-HOST (multi-process) execution tests (VERDICT r3 #5).

The reference scales with torchrun's one-process-per-GPU plumbing
(launch.py:176-187, utils/misc.py:136-168 all_gather_batch); the TPU-native
equivalent is one process per host over `jax.distributed`.  Everything
multi-DEVICE is covered by the single-process 8-device CPU mesh in
conftest; these tests spawn REAL separate processes (2 procs x 4 CPU
devices, Gloo collectives) so the process-count>1 branches actually
execute:

  * parallel/mesh.py::shard_batch -> jax.make_array_from_process_local_data
  * parallel/mesh.py::local_batch_slice / eval_shard_indices
  * parallel/mesh.py::allreduce_metric_sums (process_allgather)
  * a pjit train step over a mesh spanning both processes
  * an orbax checkpoint save + sharding-agnostic restore across processes
  * launch.py's JAX_COORDINATOR initialization branch driving a real
    2-process training run end-to-end
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(script: str, tmp_path, n: int = 2, extra_env=None,
                   args=(), timeout: int = 600):
    """Run `script` in n processes wired into one jax.distributed cluster
    (4 virtual CPU devices each).  Returns per-process stdout."""
    path = tmp_path / "worker.py"
    path.write_text(script)
    port = _free_port()
    procs = []
    for pid in range(n):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["MH_COORD"] = f"127.0.0.1:{port}"
        env["MH_NPROC"] = str(n)
        env["MH_PID"] = str(pid)
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_tests"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, str(path), *map(str, args)], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    return outs


WORKER = """
import json, os, sys
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=os.environ["MH_COORD"],
                           num_processes=int(os.environ["MH_NPROC"]),
                           process_id=int(os.environ["MH_PID"]))
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from open_diffusiongs_tpu.parallel.mesh import (allreduce_metric_sums,
                                                eval_shard_indices,
                                                local_batch_slice,
                                                make_mesh, shard_batch)
from open_diffusiongs_tpu.parallel.train_step import (OptimizerConfig,
                                                      init_train_state,
                                                      make_optimizer,
                                                      make_train_step)
from open_diffusiongs_tpu.utils.checkpoint import CheckpointManager

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

mesh = make_mesh()
assert mesh.shape["data"] == 8

# --- shard_batch: global batch assembled from process-local slices --------
global_batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
sl = local_batch_slice(8)
assert sl == slice(pid * 4, (pid + 1) * 4), sl
dev_batch = shard_batch(mesh, {"x": global_batch[sl]})
gmean = jax.jit(lambda b: b["x"].mean(),
                out_shardings=NamedSharding(mesh, P()))(dev_batch)
np.testing.assert_allclose(float(gmean), global_batch.mean(), rtol=1e-6)

# --- pjit train step spanning both processes ------------------------------
def loss_fn(params, batch, rng, step):
    pred = batch["x"] @ params["w"]
    loss = jnp.mean(pred ** 2)
    return loss, {"loss": loss}

params = {"w": jnp.ones((3, 2))}
tx = make_optimizer(OptimizerConfig(name="SGD", lr=0.1, grad_clip=0.0,
                                    scheduler="constant"))
state = init_train_state(params, tx, ema_decay=0.9999)
step_fn = make_train_step(loss_fn, tx, mesh=mesh, ema_decay=0.9999,
                          donate=False)
state2, metrics = step_fn(state, dev_batch, jax.random.PRNGKey(0))
loss0 = float(metrics["loss"])

# the same step computed with pure numpy on the GLOBAL batch
w = np.ones((3, 2), np.float32)
pred = global_batch @ w
grad = 2.0 * global_batch.T @ pred / pred.size
w_ref = w - 0.1 * grad
got_w = np.asarray(jax.device_get(state2.params["w"]))
np.testing.assert_allclose(got_w, w_ref, rtol=1e-5)

# --- metric allreduce + eval sharding --------------------------------------
sums = allreduce_metric_sums([pid + 1.0, 2.0 * pid])
np.testing.assert_allclose(sums, [3.0, 2.0])
mine = eval_shard_indices(10)
everyone = allreduce_metric_sums(
    np.bincount(mine, minlength=10).astype(np.float64))
np.testing.assert_allclose(everyone, np.ones(10))  # disjoint + covering

# --- orbax checkpoint: save from a multiprocess mesh, restore -------------
ckpt_dir = sys.argv[1]
mngr = CheckpointManager(ckpt_dir, every_n_train_steps=1)
assert mngr.maybe_save(state2, step=1)
mngr.wait()
like = init_train_state(params, tx, ema_decay=0.9999)
restored = mngr.restore(like)
np.testing.assert_allclose(np.asarray(jax.device_get(restored.params["w"])),
                           got_w, rtol=1e-6)
assert int(restored.step) == 1
mngr.close()

print(json.dumps({"pid": pid, "loss": loss0, "ok": True}), flush=True)
"""


def test_two_process_mesh_primitives_and_checkpoint(tmp_path):
    outs = _spawn_workers(WORKER, tmp_path, n=2,
                          args=[tmp_path / "ckpts"])
    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    assert all(r["ok"] for r in results)
    # both processes computed the SAME global loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)


TINY_CFG = """
exp_root_dir: "{out}"
name: "mh"
tag: "t"
use_timestamp: false
seed: 0
data_type: "Objaverse-datamodule"
data:
  local_dir: "{root}"
  image_dir: "{img}/"
  gen_idxs: [30, 33, 36, 39]
  sel_views: 2
  gen_views: 4
  training_res: [16, 16]
  batch_size: 1
  num_workers: 1
  norm_camera: true
  norm_radius: 3.
system_type: "diffusion-gs-system"
system:
  num_inference_steps: 2
  use_lpips: false
  shape_model_type: "diffusion-gs-model"
  shape_model:
    width: 64
    in_channels: 9
    patch_size: 8
    n_gaussians: 2
    dim_heads: 32
    num_layers: 2
  noise_scheduler:
    num_train_timesteps: 50
  raster:
    max_tiles_per_gaussian: 16
    max_per_tile: 1056
    blend_chunk: 32
  loss:
    lambda_diffusion: 1.0
    lambda_lpips: 0.0
    lambda_ssim: 0.0
    lambda_pointsdist: 0.1
    lambda_xyz: 0.0
  optimizer:
    name: AdamW
    args: {{lr: 1.e-4}}
trainer:
  log_every_n_steps: 1
  gradient_clip_val: 0.5
  precision: fp32
checkpoint:
  every_n_train_steps: 2
"""


def test_launch_two_process_train(tmp_path, rng):
    """launch.py's JAX_COORDINATOR branch: a real 2-process training run —
    per-process data loading (PrefetchLoader process_slice), the global
    pjit step, and main-process-only logging."""
    from synthetic_fixtures import make_gobjaverse_tree

    root, img_dir = make_gobjaverse_tree(tmp_path, rng, n_views=40, res=32)
    out = tmp_path / "outputs"
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_CFG.format(out=out, root=root, img=img_dir))

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_tests"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
        procs.append(subprocess.Popen(
            [sys.executable, "launch.py", "--config", str(cfg_path),
             "--train", "--max_steps", "2", "--platform", "cpu"],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
        assert p.returncode == 0, f"proc {pid} failed:\n{o[-4000:]}"
    # only the main process logs / writes artifacts
    assert "training done at step 2" in outs[0]
    assert "training done at step 2" not in outs[1]
    trial = out / "mh" / "t"
    assert (trial / "metrics.csv").exists()
    ckpts = os.listdir(trial / "ckpts")
    assert any(c.isdigit() for c in ckpts), ckpts
