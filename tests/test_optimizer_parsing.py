"""Optimizer/scheduler parsing breadth (reference utils/scheduler.py:34-104).

The reference resolves ANY torch.optim.lr_scheduler by name, composes
SequentialLR/ChainedScheduler recursively, and builds per-module param
groups from `optimizer.params`.  parse_schedule/make_optimizer mirror that
surface; these tests pin the schedules against hand-computed torch
semantics and the param groups against optax.multi_transform behavior.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from open_diffusiongs_tpu.parallel.train_step import (OptimizerConfig,
                                                      make_optimizer,
                                                      parse_schedule)
from open_diffusiongs_tpu.systems.builder import build_optimizer_config


def _eval(sched, steps):
    return np.asarray([float(sched(s)) for s in steps])


def test_leaf_schedulers_match_torch_semantics():
    # StepLR: lr * gamma^(step // step_size)
    s = parse_schedule({"name": "StepLR",
                        "args": {"step_size": 10, "gamma": 0.5}}, 1.0)
    np.testing.assert_allclose(_eval(s, [0, 9, 10, 25]),
                               [1.0, 1.0, 0.5, 0.25], rtol=1e-6)
    # MultiStepLR: gamma^(#milestones passed)
    s = parse_schedule({"name": "MultiStepLR",
                        "args": {"milestones": [5, 8], "gamma": 0.1}}, 2.0)
    np.testing.assert_allclose(_eval(s, [0, 5, 8]), [2.0, 0.2, 0.02],
                               rtol=1e-6)
    # ExponentialLR
    s = parse_schedule({"name": "ExponentialLR", "args": {"gamma": 0.9}}, 1.0)
    np.testing.assert_allclose(_eval(s, [0, 1, 2]), [1.0, 0.9, 0.81],
                               rtol=1e-6)
    # LinearLR warmup: factor start->end over total_iters
    s = parse_schedule({"name": "LinearLR",
                        "args": {"start_factor": 0.5, "end_factor": 1.0,
                                 "total_iters": 10}}, 1.0)
    np.testing.assert_allclose(_eval(s, [0, 5, 10, 20]),
                               [0.5, 0.75, 1.0, 1.0], rtol=1e-6)
    # ConstantLR: factor until total_iters, then base
    s = parse_schedule({"name": "ConstantLR",
                        "args": {"factor": 0.1, "total_iters": 4}}, 1.0)
    np.testing.assert_allclose(_eval(s, [0, 3, 4]), [0.1, 0.1, 1.0],
                               rtol=1e-6)
    # CosineAnnealingLR endpoints
    s = parse_schedule({"name": "CosineAnnealingLR",
                        "args": {"T_max": 100, "eta_min": 0.1}}, 1.0)
    got = _eval(s, [0, 50, 100])
    np.testing.assert_allclose(got, [1.0, 0.55, 0.1], rtol=1e-6)


def test_sequential_lr_switches_and_restarts_counter():
    """torch SequentialLR restarts each sub-scheduler's step counter at its
    milestone — a LinearLR warmup then cosine decay must see local steps."""
    spec = {"name": "SequentialLR", "milestones": [10],
            "schedulers": [
                {"name": "LinearLR", "args": {"start_factor": 0.0,
                                              "end_factor": 1.0,
                                              "total_iters": 10}},
                {"name": "CosineAnnealingLR",
                 "args": {"T_max": 100, "eta_min": 0.0}}]}
    s = parse_schedule(spec, 1.0)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(s(5)), 0.5, rtol=1e-6)
    # at the milestone the cosine starts at ITS step 0 -> full lr
    np.testing.assert_allclose(float(s(10)), 1.0, rtol=1e-6)
    # cosine halfway (local step 50 = global 60)
    np.testing.assert_allclose(float(s(60)), 0.5, rtol=1e-6)


def test_chained_scheduler_composes_factors():
    spec = {"name": "ChainedScheduler", "schedulers": [
        {"name": "ConstantLR", "args": {"factor": 0.5, "total_iters": 4}},
        {"name": "ExponentialLR", "args": {"gamma": 0.9}}]}
    s = parse_schedule(spec, 2.0)
    # torch: lr = base * 0.5 * 0.9^step while step<4, then base * 0.9^step
    np.testing.assert_allclose(float(s(0)), 2.0 * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(2)), 2.0 * 0.5 * 0.81, rtol=1e-6)
    np.testing.assert_allclose(float(s(4)), 2.0 * 0.9 ** 4, rtol=1e-6)


def test_schedule_works_under_jit():
    spec = {"name": "SequentialLR", "milestones": [3],
            "schedulers": ["constant", {"name": "ExponentialLR",
                                        "args": {"gamma": 0.5}}]}
    s = parse_schedule(spec, 1.0)
    f = jax.jit(lambda t: s(t))
    np.testing.assert_allclose(float(f(jnp.asarray(2))), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(f(jnp.asarray(4))), 0.5, rtol=1e-6)


def test_param_groups_use_override_lr():
    """Reference parse_optimizer's per-module groups: `params: {head: {lr}}`
    (utils/scheduler.py:34-41).  The head group must step with its own lr,
    everything else with the default."""
    params = {"params": {"head": {"kernel": jnp.ones((4,))},
                         "body": {"kernel": jnp.ones((4,))}}}
    cfg = OptimizerConfig(name="SGD", lr=1.0, grad_clip=0.0,
                          scheduler="constant",
                          params={"params.head": {"lr": 0.1}})
    tx = make_optimizer(cfg)
    grads = jax.tree.map(jnp.ones_like, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(
        np.asarray(updates["params"]["head"]["kernel"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["params"]["body"]["kernel"]), -1.0, rtol=1e-6)


def test_param_groups_longest_prefix_wins():
    params = {"a": {"b": {"w": jnp.ones(2)}, "c": {"w": jnp.ones(2)}}}
    cfg = OptimizerConfig(name="SGD", lr=1.0, grad_clip=0.0,
                          scheduler="constant",
                          params={"a": {"lr": 0.5}, "a.b": {"lr": 0.25}})
    tx = make_optimizer(cfg)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    np.testing.assert_allclose(np.asarray(updates["a"]["b"]["w"]), -0.25,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["a"]["c"]["w"]), -0.5,
                               rtol=1e-6)


def test_builder_passes_through_composite_spec_and_groups():
    system_cfg = {
        "optimizer": {"name": "AdamW",
                      "args": {"lr": 1e-4},
                      "params": {"denoiser.to_gs": {"lr": 1e-5}}},
        "scheduler": {"name": "SequentialLR", "milestones": [100],
                      "schedulers": [
                          {"name": "LinearLR",
                           "args": {"start_factor": 0.1, "end_factor": 1.0,
                                    "total_iters": 100}},
                          {"name": "CosineAnnealingLR",
                           "args": {"T_max": 1000}}]},
    }
    cfg = build_optimizer_config(system_cfg, {"gradient_clip_val": 0.5})
    assert isinstance(cfg.scheduler, dict)
    assert cfg.params == {"denoiser.to_gs": {"lr": 1e-5}}
    tx = make_optimizer(cfg)  # must build without error
    params = {"denoiser": {"to_gs": {"k": jnp.ones(2)},
                           "blocks": {"k": jnp.ones(2)}}}
    state = tx.init(params)
    updates, _ = tx.update(jax.tree.map(jnp.ones_like, params), state,
                           params)
    assert jnp.all(jnp.isfinite(updates["denoiser"]["to_gs"]["k"]))


def test_unknown_scheduler_still_rejected():
    with pytest.raises(ValueError, match="unknown scheduler"):
        parse_schedule({"name": "OneCycleLR"}, 1.0)
