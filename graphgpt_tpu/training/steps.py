"""Jitted train/eval steps with mesh sharding.

Replaces the reference's batch_training / ft_batch_training host loops
(src/utils/training_utils.py:7-205): the whole step — forward, backward,
clip, optimizer update, EMA — is one jitted function with donated state.
Data-parallel gradient reduction is inserted by pjit from the shardings
(the NCCL allreduce of DDP/ZeRO has no explicit call site here).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, OptimizerConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def init_train_state(
    params, tx: optax.GradientTransformation, use_ema: bool = False
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
    )


def make_train_step(
    forward_fn: Callable[..., Dict[str, Any]],
    model_cfg: ModelConfig,
    tx: optax.GradientTransformation,
    opt_cfg: Optional[OptimizerConfig] = None,
    schedule=None,
    donate: bool = True,
):
    """Build the jitted train step.

    forward_fn(params, cfg, batch, rng, train) -> dict with "loss".
    EMA follows the reference's ModelEmaV3-in-fp32 semantics
    (src/utils/patch_utils.py:10-42) as a pure lerp on the param tree.
    """
    ema_decay = opt_cfg.ema_decay if (opt_cfg and opt_cfg.use_ema) else None

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out = forward_fn(params, model_cfg, batch, rng=rng, train=True)
            return out["loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                state.ema_params,
                new_params,
            )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        for key in ("gen_loss", "dis_loss", "task_loss", "pretrain_loss"):
            if key in out:
                metrics[key] = out[key]
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(forward_fn, model_cfg: ModelConfig, use_ema: bool = False):
    def eval_fn(state: TrainState, batch):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        out = forward_fn(params, model_cfg, batch, rng=None, train=False)
        keep = {}
        for key in (
            "loss",
            "gen_loss",
            "task_loss",
            "task_logits",
            "task_hidden_states",
            "hidden_states",
        ):
            if key in out:
                keep[key] = out[key]
        return keep

    return jax.jit(eval_fn)


def cross_host_mean(metrics: Dict[str, jnp.ndarray]) -> Dict[str, float]:
    """Host-side metric reduction (reference dist.reduce of losses,
    log_eval_dump_utils.py:516-518). Under jit shardings, loss is already
    globally reduced; this just converts to python floats."""
    return {k: float(v) for k, v in metrics.items() if jnp.ndim(v) == 0}
