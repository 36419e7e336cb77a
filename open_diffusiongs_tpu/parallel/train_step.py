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
    scheduler: str = "CosineAnnealingLR"
    t_max: int = 500_000
    eta_min: float = 1e-6
    accumulate_grad_batches: int = 1


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    """Name-based optimizer/scheduler parsing (utils/scheduler.py:34-104)."""
    if cfg.scheduler == "CosineAnnealingLR":
        lr = cosine_annealing_lr(cfg.lr, cfg.t_max, cfg.eta_min)
    elif cfg.scheduler in (None, "", "constant"):
        lr = cfg.lr
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler}")

    if cfg.name in ("AdamW", "FusedAdam"):
        opt = optax.adamw(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
                          weight_decay=cfg.weight_decay)
    elif cfg.name == "Adam":
        opt = optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
    elif cfg.name == "SGD":
        opt = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.name}")

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
