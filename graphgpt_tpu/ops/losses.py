"""Static-shape loss kernels.

The reference computes masked losses with boolean-mask gathers producing
dynamic shapes (src/models/graphgpt/modeling_helpers.py:263-342); those are
re-expressed here as where/weighted-sum reductions so everything stays
jittable with fixed shapes, and the big [.., vocab] logits are computed in
rematerialised sequence chunks so they never materialise at full length.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _ce_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE in fp32; labels < 0 treated as class 0 (weighted out).

    The label pick is a compare-select reduction rather than
    take_along_axis: a gather over the [..., V] logits is a slow
    scatter/gather HLO on TPU (measured 1.6 ms per CE chunk), while the
    masked sum fuses into the same VPU pass that already reads the logits."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.maximum(labels, 0)
    classes = jax.lax.broadcasted_iota(
        jnp.int32, logits.shape, logits.ndim - 1
    )
    picked = jnp.sum(
        jnp.where(classes == safe[..., None], logits, 0.0), axis=-1
    )
    return lse - picked


def chunked_stacked_ce(
    hidden: jnp.ndarray,  # [B, P, D]
    labels: jnp.ndarray,  # [B, P, N] int, -100 = ignore
    n_token_proj: Optional[jnp.ndarray],  # [D, N*D] or None when N == 1
    lm_head: jnp.ndarray,  # [D, V]
    *,
    token_wgt: Optional[jnp.ndarray] = None,  # [B, P, N] extra weights
    dlm_normalizer: Optional[float] = None,  # if set: sum(w*ce)/norm (dLM loss)
    focal_gamma: float = 0.0,
    label_smoothing: float = 0.0,
    chunk: int = 0,  # 0 -> env GGT_CE_CHUNK (sweepable), default 128
) -> jnp.ndarray:
    """Masked (optionally dLM-weighted) CE over stacked-feature labels.

    Equivalent to the reference's mask-gather + CE paths
    (modeling_helpers.prepare_for_stacked_feat_labels + _get_ce_loss /
    _get_dlm_ce_loss, modeling_helpers.py:145-198, 362-393) with static
    shapes: logits are formed chunk-by-chunk over the sequence under
    jax.checkpoint, so peak memory is one chunk of [B, c, N, V].
    """
    b, p, d = hidden.shape
    n = labels.shape[-1]
    v = lm_head.shape[-1]
    if chunk <= 0:
        import os

        chunk = int(os.environ.get("GGT_CE_CHUNK", "128"))
    if p % chunk != 0:
        chunk = p  # degenerate: single chunk
    n_chunks = p // chunk
    if token_wgt is None:
        token_wgt = jnp.ones((b, p, n), jnp.float32)
    token_wgt = jnp.broadcast_to(token_wgt, (b, p, n)).astype(jnp.float32)

    @jax.checkpoint
    def chunk_fn(h, lab, w):
        # h [B,c,D] -> logits [B,c,N,V]
        dt = h.dtype
        if n_token_proj is not None:
            h = (h @ n_token_proj.astype(dt)).reshape(b, chunk, n, d)
        else:
            h = h[:, :, None, :]
        logits = h @ lm_head.astype(dt)
        ce = _ce_from_logits(logits, lab)
        if label_smoothing > 0:
            smooth = -jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).mean(-1)
            ce = (1 - label_smoothing) * ce + label_smoothing * smooth
        if focal_gamma > 0:
            pt = jnp.exp(-ce)
            ce = ((1 - pt) ** focal_gamma) * ce
        valid = (lab != -100).astype(jnp.float32)
        w = valid * w
        return jnp.sum(ce * w), jnp.sum(w), jnp.sum(valid)

    # chunks are carved with dynamic_slice along P *inside* the scan — a
    # [n_chunks, B, c, ...] reshape+transpose of `hidden` here would force a
    # seq-major layout on the backbone output, and XLA layout assignment
    # propagates that through the residual stream of the whole decoder scan
    # (measured: the MLP down-projection lowers as a 4x-slower convolution
    # and every layer pays f32 {1,2,0}<->{2,1,0} cotangent copies)
    def scan_fn(carry, i):
        s, wsum, cnt = carry
        h = jax.lax.dynamic_slice_in_dim(hidden, i * chunk, chunk, axis=1)
        lab = jax.lax.dynamic_slice_in_dim(labels, i * chunk, chunk, axis=1)
        w = jax.lax.dynamic_slice_in_dim(token_wgt, i * chunk, chunk, axis=1)
        ds_, dw, dc = chunk_fn(h, lab, w)
        return (s + ds_, wsum + dw, cnt + dc), None

    (loss_sum, wgt_sum, count), _ = jax.lax.scan(
        scan_fn,
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        jnp.arange(n_chunks),
    )
    if dlm_normalizer is not None:
        # dLM loss: sum(w * ce) / (bz * seq * next_n)  (modeling_pretrain.py:230-236)
        return loss_sum / dlm_normalizer
    return loss_sum / (wgt_sum + _EPS)


def masked_mean_ce(
    logits: jnp.ndarray, labels: jnp.ndarray, wgt: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Plain masked-mean CE for small logit tensors."""
    ce = _ce_from_logits(logits, labels)
    valid = (labels != -100).astype(jnp.float32)
    w = valid if wgt is None else valid * wgt
    return jnp.sum(ce * w) / (jnp.sum(w) + _EPS)


# ---------------------------------------------------------------------------
# Fine-tune losses
# ---------------------------------------------------------------------------
def regression_loss(preds, targets, kind: str = "l1", sample_wgt=None):
    preds = preds.astype(jnp.float32).reshape(targets.shape)
    targets = targets.astype(jnp.float32)
    err = preds - targets
    per = jnp.abs(err) if kind == "l1" else err * err
    if sample_wgt is not None:
        w = sample_wgt.reshape(-1, *([1] * (per.ndim - 1))).astype(jnp.float32)
        return jnp.sum(per * w) / (jnp.sum(jnp.broadcast_to(w, per.shape)) + _EPS)
    return jnp.mean(per)


def single_label_ce(logits, labels, sample_wgt=None):
    ce = _ce_from_logits(logits, labels.astype(jnp.int32))
    if sample_wgt is not None:
        w = sample_wgt.astype(jnp.float32)
        return jnp.sum(ce * w) / (jnp.sum(w) + _EPS)
    return jnp.mean(ce)


def multi_label_bce(logits, labels, sample_wgt=None):
    """BCE-with-logits over multiple binary tasks; NaN labels are masked out
    (reference modeling_finetune.py:227-233)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    valid = jnp.isfinite(labels)
    y = jnp.where(valid, labels, 0.0)
    per = jnp.maximum(logits, 0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    w = valid.astype(jnp.float32)
    if sample_wgt is not None:
        w = w * sample_wgt.reshape(-1, 1).astype(jnp.float32)
    return jnp.sum(per * w) / (jnp.sum(w) + _EPS)


def pairwise_auc_loss(logits, labels, num_neg: int = 1):
    """Squared-hinge pairwise AUC surrogate for link prediction
    (reference auc_loss, src/utils/loss_utils.py:25-53): batches interleave
    one positive followed by its negatives; loss = mean((1-(s+ - s-))^2)."""
    scores = logits.astype(jnp.float32).reshape(-1)
    group = num_neg + 1
    n_group = scores.shape[0] // group
    s = scores[: n_group * group].reshape(n_group, group)
    pos, neg = s[:, :1], s[:, 1:]
    return jnp.mean(jnp.square(1.0 - (pos - neg)))


def info_nce(
    left: jnp.ndarray,  # [B/2, D] normalized
    right: jnp.ndarray,  # [B/2, D] normalized
    temperature: float = 0.07,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Symmetric InfoNCE over (optionally) the global batch.

    The reference gathers embeddings across ranks with an autograd-aware
    GatherLayer (src/utils/loss_utils.py:89-137); under pjit the same
    global-batch contrast comes from jax.lax.all_gather inside shard_map,
    which is differentiated natively.
    """
    if axis_name is not None:
        left_g = jax.lax.all_gather(left, axis_name, tiled=True)
        right_g = jax.lax.all_gather(right, axis_name, tiled=True)
    else:
        left_g, right_g = left, right
    logits = (left_g @ right_g.T).astype(jnp.float32) / temperature
    n = logits.shape[0]
    labels = jnp.arange(n)
    l1 = masked_mean_ce(logits, labels)
    l2 = masked_mean_ce(logits.T, labels)
    return 0.5 * (l1 + l2)
