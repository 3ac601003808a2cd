"""dLLM-style iterative unmasking generation (jitted).

Re-implements the reference's Dream-derived sampler
(src/utils/generation_utils.py:44-237) as a single jitted
`lax.while_loop`: one model forward per diffusion step, confidence-ranked
batched unmasking with static shapes (per-sample top-k realised as a rank
threshold instead of torch.topk + scatter), early exit when nothing is
masked.

Algorithms: "origin" (random transfer), "maskgit_plus" (probability
confidence), "topk_margin" (top1-top2 margin), "entropy" (negative
entropy), each optionally Gumbel-perturbed via alg_temp.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GenerationConfig


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Nucleus filtering (reference top_p_logits, generation_utils.py:22-33)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # keep the first token above the threshold
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    return jnp.where(logits < cutoff, -jnp.inf, logits)


def top_k_filter(logits: jnp.ndarray, top_k: int) -> jnp.ndarray:
    """(reference top_k_logits, generation_utils.py:36-41)."""
    k = min(top_k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_tokens(
    logits: jnp.ndarray,  # [..., V]
    rng: Optional[jax.Array],
    temperature: float = 0.0,
    top_p: Optional[float] = None,
    top_k: Optional[int] = None,
    margin_confidence: bool = False,
    neg_entropy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(confidence, token) per position (reference sample_tokens,
    generation_utils.py:44-81)."""
    logits = logits.astype(jnp.float32)
    if temperature > 0:
        logits = logits / temperature
    if top_p is not None and top_p < 1:
        logits = top_p_filter(logits, top_p)
    if top_k is not None and top_k > 0:
        logits = top_k_filter(logits, top_k)
    probs = jax.nn.softmax(logits, axis=-1)
    if temperature > 0 and rng is not None:
        x0 = jax.random.categorical(rng, logits, axis=-1)
        confidence = jnp.take_along_axis(probs, x0[..., None], axis=-1)[..., 0]
    else:
        x0 = jnp.argmax(probs, axis=-1)
        confidence = jnp.max(probs, axis=-1)
    if margin_confidence:
        top2 = jax.lax.top_k(probs, 2)[0]
        confidence = top2[..., 0] - top2[..., 1]
    if neg_entropy:
        confidence = jnp.sum(probs * jnp.log(probs + 1e-10), axis=-1)
    return confidence, x0.astype(jnp.int32)


def _scatter_rows(indices, values):
    """out[b, indices[b, j]] = values[b, j] (row-wise scatter)."""
    out = jnp.zeros_like(indices)
    return out.at[
        jnp.arange(indices.shape[0])[:, None], indices
    ].set(values)


def _unmask_body(logits_fn, cfg, mask_token_id, timesteps, extra):
    """One diffusion-unmask step (shared by the jitted batched while_loop
    and the per-example history loop)."""
    alg = cfg.alg
    steps = cfg.steps

    def body(carry):
        x, i, rng = carry
        rng, r_samp, r_alg = jax.random.split(rng, 3)
        mask = x == mask_token_id  # [B, T]
        logits = logits_fn(x, *extra)
        confidence, x0 = sample_tokens(
            logits,
            r_samp,
            temperature=cfg.temperature,
            top_p=cfg.top_p if cfg.top_p > 0 else None,
            top_k=cfg.top_k if cfg.top_k > 0 else None,
            margin_confidence=(alg == "topk_margin"),
            neg_entropy=(alg == "entropy"),
        )
        t, s = timesteps[i], timesteps[i + 1]
        p_transfer = jnp.where(i < steps - 1, 1.0 - s / t, 1.0)
        if alg == "origin":
            transfer = jax.random.uniform(r_alg, x.shape) < p_transfer
            new_x = jnp.where(mask & transfer, x0, x)
        else:
            conf = jnp.where(mask, confidence, -jnp.inf)
            if cfg.alg_temp and cfg.alg_temp > 0:
                g = -jnp.log(
                    -jnp.log(jax.random.uniform(r_alg, conf.shape) + 1e-9) + 1e-9
                )
                conf = conf / cfg.alg_temp + g
            num_masked = jnp.sum(mask, axis=-1)  # [B]
            num_transfer = jnp.floor(num_masked * p_transfer).astype(jnp.int32)
            order = jnp.argsort(-conf, axis=-1)
            ranks = _scatter_rows(
                order, jnp.broadcast_to(jnp.arange(x.shape[-1]), x.shape)
            )
            unmask = mask & (ranks < num_transfer[:, None])
            new_x = jnp.where(unmask, x0, x)
        return new_x, i + 1, rng

    return body


def make_unmask_sampler(
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    cfg: GenerationConfig,
    mask_token_id: int,
):
    """Build a jitted sampler.

    logits_fn(x_flat [B, T], *extra) -> [B, T, V] (caller reshapes to the
    model's stacked [B, seq, next_n] layout inside). `extra` arrays (e.g.
    position/segment ids) are passed per call through the jitted sampler so
    ONE compile serves every batch of the same shape.
    """
    steps = cfg.steps
    eps = cfg.eps
    timesteps = jnp.linspace(1.0, eps, steps + 1)

    def make_body(extra):
        return _unmask_body(logits_fn, cfg, mask_token_id, timesteps, extra)

    def cond(carry):
        x, i, _ = carry
        return (i < steps) & jnp.any(x == mask_token_id)

    @jax.jit
    def sample(x_flat: jnp.ndarray, rng: jax.Array, *extra) -> jnp.ndarray:
        out, _, _ = jax.lax.while_loop(
            cond, make_body(extra), (x_flat, jnp.zeros((), jnp.int32), rng)
        )
        return out

    return sample


def sample_per_example(
    logits_fn: Callable,
    cfg: GenerationConfig,
    mask_token_id: int,
    x_flat: jnp.ndarray,  # [T] or [1, T]
    rng: jax.Array,
    *extra,
    output_history: bool = False,
):
    """Per-sample decoding loop (reference sample_per_example,
    src/utils/generation_utils.py:317-436): ONE example, with the step
    count adapted to its mask count — steps = min(#masked, cfg.steps) —
    and an optional per-step history trace.

    The batched sampler (make_unmask_sampler) subsumes this for eval
    throughput (reference eval_gen_per_batch is the default there too);
    this exists for behaviour parity with the reference's per-example flow
    and for debugging traces. Returns (x, histories) where histories is a
    list of [1, T] snapshots (None unless output_history).
    """
    import dataclasses

    x = x_flat.reshape(1, -1)
    n_masked = int(jnp.sum(x == mask_token_id))
    steps = max(min(n_masked, cfg.steps), 1)
    cfg_i = dataclasses.replace(cfg, steps=steps)
    if not output_history:
        sampler = make_unmask_sampler(logits_fn, cfg_i, mask_token_id)
        return sampler(x, rng, *extra), None
    # history mode: run the same body step by step (eval/debug only)
    timesteps = jnp.linspace(1.0, cfg_i.eps, steps + 1)
    body = _unmask_body(logits_fn, cfg_i, mask_token_id, timesteps, extra)
    carry = (x, jnp.zeros((), jnp.int32), rng)
    histories = []
    for _ in range(steps):
        carry = body(carry)
        histories.append(carry[0])
    return carry[0], histories


def generation_accuracy(
    generated: jnp.ndarray, truth: jnp.ndarray, initial_mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Accuracy over originally-masked positions (reference cal_gen_acc_*,
    generation_utils.py:439-463)."""
    correct = (generated == truth) & initial_mask
    n = jnp.sum(initial_mask)
    return {
        "acc": jnp.sum(correct) / jnp.maximum(n, 1),
        "n_masked": n,
    }


def mask_at_ratio(
    input_ids, mask_token_id: int, ratio_band, rng, pad_token_id: int = 0
):
    """Host/numpy helper: mask a uniform ratio drawn from [lo, hi) — the
    generation-eval band sweep (reference evaluate_generation umr_clip,
    log_eval_dump_utils.py:307-384)."""
    import numpy as np

    lo, hi = ratio_band
    ratio = lo + (hi - lo) * rng.random()
    mask = (rng.random(input_ids.shape) < ratio) & (input_ids != pad_token_id)
    masked = np.where(mask, mask_token_id, input_ids)
    return masked, mask
