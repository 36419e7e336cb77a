"""pjit train-step factory: optimizer, grad clip, EMA, data-parallel mesh.

The reference trains with Lightning+DDP, AdamW(lr 1e-5, betas (0.9, 0.99)),
CosineAnnealingLR(T_max 500k, eta_min 1e-6), gradient_clip_val 0.5, EMA
decay 0.9999 (configs/diffusionGS_rel.yaml:58-83, launch.py:228).  Here the
whole step — loss, backward, clip, update, EMA — is ONE jitted function
with the batch sharded on the `data` mesh axis; XLA inserts the gradient
all-reduce (the NCCL allreduce equivalent) automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.schedules import cosine_annealing_lr
from .mesh import DATA_AXIS


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any          # None when EMA disabled


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    name: str = "AdamW"
    lr: float = 1e-5
    betas: tuple = (0.9, 0.99)
    eps: float = 1e-8
    weight_decay: float = 0.01
    grad_clip: float = 0.5
    # either a plain name ("CosineAnnealingLR" / "constant") using
    # t_max/eta_min below, or a full recursive spec dict
    # {"name": ..., "args": {...}, "schedulers": [...], "milestones": [...]}
    # mirroring the reference's parse_scheduler (utils/scheduler.py:55-104)
    scheduler: Any = "CosineAnnealingLR"
    t_max: int = 500_000
    eta_min: float = 1e-6
    accumulate_grad_batches: int = 1
    # per-module param groups (utils/scheduler.py:34-41): maps a param-tree
    # path prefix (e.g. "denoiser.to_gs" — dots or slashes) to overrides
    # like {"lr": ...}; params not matching any prefix use the top-level
    # settings.  Longest prefix wins.
    params: Any = None


def parse_schedule(spec: Any, base_lr: float, t_max: int = 500_000,
                   eta_min: float = 0.0):
    """Recursive torch-lr_scheduler-surface parser -> optax schedule fn.

    Mirrors the reference's parse_scheduler/parse_scheduler_to_instance
    (utils/scheduler.py:55-104): SequentialLR switches sub-schedules at
    `milestones` (each sub-schedule sees a step counter restarted at its
    milestone, like torch); ChainedScheduler composes all sub-schedules'
    multiplicative factors every step.  Leaf names cover every scheduler a
    shipped or plausible config uses.
    """
    if spec is None or spec in ("", "constant"):
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    if isinstance(spec, str):
        spec = {"name": spec}
    name = spec.get("name", "constant")
    args = dict(spec.get("args", {}))

    if name in ("SequentialLR", "Sequential"):
        subs = [parse_schedule(s, base_lr, t_max, eta_min)
                for s in spec["schedulers"]]
        bounds = [float(m) for m in spec["milestones"]]
        assert len(bounds) == len(subs) - 1, \
            "SequentialLR needs len(schedulers)-1 milestones"

        def seq(step):
            step = jnp.asarray(step, jnp.float32)
            idx = jnp.sum(jnp.asarray(
                [step >= b for b in bounds], jnp.int32)) if bounds else 0
            starts = jnp.asarray([0.0] + bounds, jnp.float32)
            local = step - starts[idx]
            vals = jnp.stack([s(local) for s in subs])
            return vals[idx]
        return seq

    if name == "ChainedScheduler":
        subs = [parse_schedule(s, base_lr, t_max, eta_min)
                for s in spec["schedulers"]]

        def chained(step):
            factor = jnp.asarray(1.0, jnp.float32)
            for s in subs:
                factor = factor * (s(step) / base_lr)
            return base_lr * factor
        return chained

    if name == "CosineAnnealingLR":
        return cosine_annealing_lr(
            base_lr, int(args.get("T_max", t_max)),
            float(args.get("eta_min", eta_min)))
    if name == "LinearLR":
        sf = float(args.get("start_factor", 1.0 / 3.0))
        ef = float(args.get("end_factor", 1.0))
        total = float(args.get("total_iters", 5))
        return lambda step: base_lr * (
            sf + (ef - sf) * jnp.clip(
                jnp.asarray(step, jnp.float32) / total, 0.0, 1.0))
    if name == "ConstantLR":
        f = float(args.get("factor", 1.0 / 3.0))
        total = float(args.get("total_iters", 5))
        return lambda step: base_lr * jnp.where(
            jnp.asarray(step, jnp.float32) < total, f, 1.0)
    if name == "ExponentialLR":
        g = float(args["gamma"])
        return lambda step: base_lr * jnp.power(
            g, jnp.asarray(step, jnp.float32))
    if name == "StepLR":
        size = float(args["step_size"])
        g = float(args.get("gamma", 0.1))
        return lambda step: base_lr * jnp.power(
            g, jnp.floor(jnp.asarray(step, jnp.float32) / size))
    if name == "MultiStepLR":
        ms = [float(m) for m in args["milestones"]]
        g = float(args.get("gamma", 0.1))
        return lambda step: base_lr * jnp.power(g, jnp.sum(jnp.asarray(
            [jnp.asarray(step, jnp.float32) >= m for m in ms], jnp.float32)))
    raise ValueError(f"unknown scheduler {name!r}")


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def _base_transform(cfg: OptimizerConfig, lr) -> optax.GradientTransformation:
    if cfg.name in ("AdamW", "FusedAdam"):
        return optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                           weight_decay=cfg.weight_decay)
    if cfg.name in ("Adam", "Adan"):
        # Adan (the reference vendors apex's) ~ Adam surface here
        return optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
    if cfg.name == "SGD":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer {cfg.name}")


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """Name-based optimizer/scheduler parsing (utils/scheduler.py:34-104).

    With `cfg.params` set, mirrors the reference's per-module param groups
    (parse_optimizer, utils/scheduler.py:34-41) via optax.multi_transform:
    each group gets its own lr/overrides, unmatched params use the default.
    """
    lr = parse_schedule(cfg.scheduler, cfg.lr, cfg.t_max, cfg.eta_min)

    if cfg.params:
        groups = dict(cfg.params)
        transforms = {"__default__": _base_transform(cfg, lr)}
        prefixes = {}
        for gname, overrides in groups.items():
            overrides = dict(overrides or {})
            gcfg = dataclasses.replace(
                cfg, params=None,
                lr=float(overrides.pop("lr", cfg.lr)),
                betas=tuple(overrides.pop("betas", cfg.betas)),
                eps=float(overrides.pop("eps", cfg.eps)),
                weight_decay=float(
                    overrides.pop("weight_decay", cfg.weight_decay)))
            glr = parse_schedule(gcfg.scheduler, gcfg.lr, gcfg.t_max,
                                 gcfg.eta_min)
            transforms[gname] = _base_transform(gcfg, glr)
            prefixes[gname] = gname.replace(".", "/")

        def label_fn(tree):
            def label(path, _):
                p = _path_str(path)
                best, best_len = "__default__", -1
                for gname, pref in prefixes.items():
                    if ((p == pref or p.startswith(pref + "/")
                         or ("/" + pref + "/") in ("/" + p + "/"))
                            and len(pref) > best_len):
                        best, best_len = gname, len(pref)
                return best
            return jax.tree_util.tree_map_with_path(label, tree)

        opt = optax.multi_transform(transforms, label_fn)
    else:
        opt = _base_transform(cfg, lr)

    chain = []
    if cfg.grad_clip and cfg.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(opt)
    tx = optax.chain(*chain)
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx


def init_train_state(params, tx: optax.GradientTransformation,
                     ema_decay: Optional[float] = 0.9999) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
    )


def make_train_step(loss_fn: Callable, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    ema_decay: Optional[float] = 0.9999,
                    donate: bool = True,
                    state_shardings=None):
    """loss_fn(params, batch, rng, step) -> (loss, metrics).

    Returns a jitted `train_step(state, batch, rng) -> (state, metrics)`.
    With a mesh, the batch is sharded on `data` and the state is replicated
    unless `state_shardings` (a TrainState-shaped pytree of NamedShardings,
    e.g. from mesh.tensor_parallel_state_sharding) says otherwise.
    """

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng, state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if state.ema_params is not None and ema_decay:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params)
        else:
            new_ema = state.ema_params
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt, ema_params=new_ema)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )
