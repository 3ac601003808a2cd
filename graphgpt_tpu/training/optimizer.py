"""Optimizer + LR schedules (optax).

Covers the reference's optimizer surface: AdamW with betas (0.9, 0.95),
eps 1e-6, weight decay, global-norm grad clipping 1.0
(configs/training/base.yaml optimizer block; DDP path opt_utils.py:7-37),
and the scheduler registry (src/utils/loss_utils.py:170-367):
WarmupDecayLR ("warmup_decay"), OneCycleLR ("onecycle"),
CosineAnnealing ("cosine"), WarmupLR ("constant" after warmup),
CyclicLR triangular ("cyclic"), CosineAnnealingWarmRestarts
("cosine_wr"), DeepSpeed LRRangeTest ("lr_range_test").
bf16 on TPU needs no loss scaler (the reference's fp16 GradScaler /
DeepSpeed loss scaling has no equivalent here by design).
"""

from __future__ import annotations

from typing import Optional

import optax

from ..config import OptimizerConfig


def make_schedule(
    cfg: OptimizerConfig, total_steps: int, warmup_steps: int
) -> optax.Schedule:
    peak = cfg.lr
    warmup_steps = max(int(warmup_steps), 1)
    total_steps = max(int(total_steps), warmup_steps + 1)
    name = cfg.scheduler
    if name == "warmup_decay":
        # DeepSpeed WarmupDecayLR: linear warmup then linear decay to 0
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, peak, warmup_steps),
                optax.linear_schedule(peak, cfg.min_lr, total_steps - warmup_steps),
            ],
            [warmup_steps],
        )
    if name == "onecycle":
        # torch OneCycleLR (cos annealing) with pct_start = warmup/total
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps,
            peak_value=peak,
            pct_start=warmup_steps / total_steps,
            div_factor=25.0,
            final_div_factor=1e4,
        )
    if name == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=peak,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=cfg.min_lr,
        )
    if name == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup_steps), optax.constant_schedule(peak)],
            [warmup_steps],
        )
    if name == "cyclic":
        # torch CyclicLR, triangular mode: min_lr <-> peak, symmetric
        # up/down legs of cycle_steps each (loss_utils.set_py_scheduler)
        half = max(cfg.cycle_steps or total_steps // 4, 1)
        base = cfg.min_lr

        def _cyclic(step):
            import jax.numpy as jnp

            pos = jnp.mod(step, 2 * half)
            frac = jnp.where(pos < half, pos / half, 2.0 - pos / half)
            return base + (peak - base) * frac

        return _cyclic
    if name == "cosine_wr":
        # torch CosineAnnealingWarmRestarts (T_0 = cycle_steps, T_mult)
        t0 = max(cfg.cycle_steps or total_steps // 4, 1)
        mult = max(cfg.cycle_mult, 1.0)
        cycles, boundaries, t = [], [], t0
        covered = 0
        while covered < total_steps:
            cycles.append(
                optax.cosine_decay_schedule(peak, int(t), alpha=cfg.min_lr / peak if peak else 0.0)
            )
            covered += int(t)
            boundaries.append(covered)
            t = t * mult
        return optax.join_schedules(
            [
                optax.join_schedules(
                    [optax.linear_schedule(0.0, peak, warmup_steps), cycles[0]],
                    [warmup_steps],
                ),
                *cycles[1:],
            ],
            boundaries[:-1],
        )
    if name == "lr_range_test":
        # DeepSpeed LRRangeTest: linear ramp from min_lr up across the run
        return optax.linear_schedule(max(cfg.min_lr, 1e-8), peak, total_steps)
    raise ValueError(f"unknown scheduler {name!r}")


def _newton_schulz(g, steps: int = 5, eps: float = 1e-7):
    """Quintic Newton-Schulz orthogonalisation (Muon; public coefficients)."""
    import jax.numpy as jnp

    a, b, c = 3.4445, -4.7750, 2.0315
    x = g.astype(jnp.float32)
    transpose = x.shape[-2] > x.shape[-1]
    if transpose:
        x = x.swapaxes(-1, -2)
    x = x / (jnp.linalg.norm(x, axis=(-2, -1), keepdims=True) + eps)
    for _ in range(steps):
        aa = x @ x.swapaxes(-1, -2)
        bb = b * aa + c * (aa @ aa)
        x = a * x + bb @ x
    if transpose:
        x = x.swapaxes(-1, -2)
    return x


def muon(learning_rate, momentum: float = 0.95, ns_steps: int = 5) -> optax.GradientTransformation:
    """Muon: momentum + Newton-Schulz orthogonalised updates for matrices
    (the optimizer split the reference prepares in get_muon_params,
    src/models/graphgpt/modeling_finetune.py:610-644). Stacked per-layer
    [L, in, out] weights are orthogonalised per leading slice."""
    import jax
    import jax.numpy as jnp

    def init(params):
        return {"mu": jax.tree_util.tree_map(jnp.zeros_like, params), "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params=None):
        mu = jax.tree_util.tree_map(
            lambda m, g: momentum * m + g, state["mu"], grads
        )

        def orth(m):
            if m.ndim < 2:
                return m
            o = _newton_schulz(m, ns_steps)
            scale = jnp.sqrt(jnp.maximum(1.0, m.shape[-2] / m.shape[-1]))
            return (o * scale).astype(m.dtype)

        count = state["count"] + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        updates = jax.tree_util.tree_map(lambda m: -lr * orth(m), mu)
        return updates, {"mu": mu, "count": count}

    return optax.GradientTransformation(init, update)


def make_optimizer(
    cfg: OptimizerConfig,
    total_steps: int,
    warmup_steps: int,
    schedule: Optional[optax.Schedule] = None,
    num_layers: Optional[int] = None,
) -> optax.GradientTransformation:
    sched = schedule or make_schedule(cfg, total_steps, warmup_steps)
    adamw = optax.adamw(
        learning_rate=sched,
        b1=cfg.betas[0],
        b2=cfg.betas[1],
        eps=cfg.eps,
        weight_decay=cfg.weight_decay,
    )
    if cfg.name == "muon":
        # Muon on >=2D decoder-body weights, AdamW on everything else
        import jax

        def label_fn(params):
            def label(path, leaf):
                keys = [getattr(p, "key", str(p)) for p in path]
                in_body = "layers" in keys
                return "muon" if (in_body and leaf.ndim >= 2) else "adamw"

            return jax.tree_util.tree_map_with_path(label, params)

        inner = optax.multi_transform(
            {"muon": muon(sched), "adamw": adamw}, label_fn
        )
    else:
        inner = adamw
    tail = []
    if cfg.layerwise_lr_decay > 0:
        if num_layers is None:
            raise ValueError("layerwise_lr_decay>0 requires num_layers")
        # scale *updates* post-AdamW (pre-scaling grads would be undone by
        # Adam's second-moment normalisation)
        tail.append(layerwise_lr_scales(None, num_layers, cfg.layerwise_lr_decay))
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner, *tail)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def layerwise_lr_scales(
    params, num_layers: int, decay: float = 0.9
) -> "optax.GradientTransformation":
    """Layer-wise LR decay: layer i's update scaled by decay^(L-1-i);
    embeddings get decay^L (reference get_layerwise_param_groups*,
    src/utils/loss_utils.py:270-367). Stacked per-layer weights carry a
    leading L axis, so the scale is applied as a per-slice multiplier."""
    import jax
    import jax.numpy as jnp

    scales = jnp.asarray([decay ** (num_layers - 1 - i) for i in range(num_layers)])

    def init(params):
        return ()

    def update(grads, state, params=None):
        def scale(path, g):
            keys = [getattr(p, "key", str(p)) for p in path]
            if "layers" in keys and g.ndim >= 1 and g.shape[0] == num_layers:
                shape = (num_layers,) + (1,) * (g.ndim - 1)
                return g * scales.reshape(shape).astype(g.dtype)
            if "embed_tokens" in keys:
                return g * (decay**num_layers)
            return g

        return jax.tree_util.tree_map_with_path(scale, grads), state

    return optax.GradientTransformation(init, update)


def compute_total_steps(
    total_tokens: float,
    warmup_tokens: float,
    tokens_per_sample: float,
    global_batch_size: int,
) -> tuple:
    """Token-budget driven step counts (reference update_num_steps,
    src/conf/base_configs.py:54-61)."""
    tokens_per_step = max(tokens_per_sample * global_batch_size, 1.0)
    total = int(total_tokens / tokens_per_step)
    warmup = int(warmup_tokens / tokens_per_step)
    return max(total, 1), max(warmup, 1)
