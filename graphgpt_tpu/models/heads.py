"""Pretrain and fine-tune model heads over the shared backbone.

Reference: src/models/graphgpt/modeling_pretrain.py:57-266 (GraphGPTPretrainBase),
modeling_finetune.py:64-423 (GraphGPTTaskModel / DoubleHeads). Losses use the
static-shape kernels in ops/losses.py instead of dynamic mask-gathers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import losses
from .modeling import (
    Params,
    _dropout,
    _normal,
    init_backbone_params,
    model_hidden_states,
)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------
def init_pretrain_params(cfg: ModelConfig, key: jax.Array) -> Params:
    k_backbone, k_lm, k_proj, k_cl = jax.random.split(key, 4)
    params = init_backbone_params(cfg, k_backbone)
    std = cfg.initializer_range
    d = cfg.hidden_size
    if cfg.use_generative:
        params["lm_head"] = (
            params["embed_tokens"].T
            if cfg.tie_word_embeddings
            else _normal(k_lm, (d, cfg.vocab_size), std)
        )
        if cfg.next_n_token > 1:
            params["n_token_proj"] = _normal(k_proj, (d, d * cfg.next_n_token), std)
    if cfg.use_discriminative:
        params["cl_proj"] = _normal(k_cl, (d, d), std)
    return params


def init_task_params(cfg: ModelConfig, key: jax.Array) -> Params:
    k_backbone, k_score, k_lm, k_proj = jax.random.split(key, 4)
    params = init_backbone_params(cfg, k_backbone)
    std = cfg.initializer_range
    d = cfg.hidden_size
    use_bias = cfg.problem_type == "regression"
    if cfg.mlp:
        sizes = [d, *cfg.mlp, cfg.num_labels]
        layers = []
        ks = jax.random.split(k_score, len(sizes))
        for i in range(len(sizes) - 1):
            layer = {"w": _normal(ks[i], (sizes[i], sizes[i + 1]), std)}
            if use_bias:
                layer["b"] = jnp.zeros((sizes[i + 1],), jnp.float32)
            layers.append(layer)
        params["score_mlp"] = layers
    else:
        params["score_w"] = _normal(k_score, (d, cfg.num_labels), std)
        if use_bias:
            params["score_b"] = jnp.zeros((cfg.num_labels,), jnp.float32)
    if cfg.use_aux:  # auxiliary NTP head (DoubleHeadsModel)
        params["lm_head"] = _normal(k_lm, (d, cfg.vocab_size), std)
        if cfg.next_n_token > 1:
            params["n_token_proj"] = _normal(k_proj, (d, d * cfg.next_n_token), std)
    return params


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------
def last_token_pool(hidden: jnp.ndarray, segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Hidden state at the last non-pad position per row (reference
    _get_sequence_len pooling, modeling_helpers.py:78-86)."""
    seq_lengths = jnp.sum((segment_ids > 0).astype(jnp.int32), axis=-1) - 1
    b = hidden.shape[0]
    return hidden[jnp.arange(b), jnp.maximum(seq_lengths, 0)]


def pool_hidden(hidden, segment_ids, method: str):
    if method == "last":
        return last_token_pool(hidden, segment_ids)
    valid = (segment_ids > 0).astype(hidden.dtype)[..., None]
    summed = jnp.sum(hidden * valid, axis=1)
    if method == "sum":
        return summed
    return summed / (jnp.sum(valid, axis=1) + 1e-7)


def smtp_inside_mask(
    input_ids: jnp.ndarray,  # [B, P, F]
    node_idx: jnp.ndarray,  # [B, P] int; row to draw mask from (>=0)
    rng: jax.Array,
    *,
    power: float = 1.0,
    mask_token_id: int = 1,
    replace_rate: float = 0.0,
    vocab_size: int = 2,
):
    """On-device SMTP masking (reference prepare_for_2d_smtp_inputs_labels,
    modeling_helpers.py:399-449): one mask ratio t per sample, Bernoulli per
    (node, feat) drawn at slot node_idx so all visits of a node share the
    same mask, labels = original ids at masked cells else -100."""
    b, p, f = input_ids.shape
    k_t, k_m, k_r, k_tok = jax.random.split(rng, 4)
    t = jax.random.uniform(k_t, (b, 1, 1))
    mask_per_node = jax.random.uniform(k_m, (b, p, f)) > t**power
    bz_idx = jnp.arange(b)[:, None]
    mask_per_token = mask_per_node[bz_idx, node_idx]  # gather rows by node
    mask_per_token = mask_per_token & (input_ids > 0)
    labels = jnp.where(mask_per_token, input_ids, -100)
    masked = jnp.where(mask_per_token, mask_token_id, input_ids)
    if replace_rate > 0:
        replace = (jax.random.uniform(k_r, (b, p, f)) < replace_rate) & mask_per_token
        rnd = jax.random.randint(k_tok, (b, p, f), 1, vocab_size)
        masked = jnp.where(replace, rnd, masked)
    return masked, labels


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------
def pretrain_forward(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    axis_name: Optional[str] = None,
) -> Dict[str, Any]:
    """NTP / SMTP (+ optional contrastive) pretraining forward + loss."""
    input_ids = batch["input_ids"]
    labels = batch.get("labels")
    if rng is not None:
        rng, r_smtp = jax.random.split(rng)
    if cfg.smtp_inside:
        node_idx = batch["node_idx"]
        input_ids, labels = smtp_inside_mask(
            input_ids,
            node_idx,
            r_smtp,
            power=cfg.smtp_power,
            mask_token_id=cfg.mask_token_id,
            vocab_size=cfg.vocab_size,
        )
    hidden = model_hidden_states(
        params,
        cfg,
        input_ids,
        batch["position_ids"],
        batch["segment_ids"],
        raw_embeds=batch.get("embed"),
        embed_is_masked=(
            (labels != -100).any(axis=-1) if (labels is not None and labels.ndim == 3) else None
        ),
        rng=rng,
        train=train,
    )
    out: Dict[str, Any] = {"hidden_states": hidden}
    gen_loss = dis_loss = None
    if cfg.use_generative and labels is not None:
        lab3 = labels if labels.ndim == 3 else labels[..., None]
        b, p, n = lab3.shape
        token_wgt = None
        dlm_norm = None
        if "wgt" in batch:
            token_wgt = jnp.broadcast_to(
                batch["wgt"][:, None, None].astype(jnp.float32), (b, p, n)
            )
            dlm_norm = float(b * p * n) if not cfg.smtp_inside else None
        gen_loss = losses.chunked_stacked_ce(
            hidden,
            lab3,
            params.get("n_token_proj") if cfg.next_n_token > 1 else None,
            params["lm_head"],
            token_wgt=token_wgt,
            dlm_normalizer=dlm_norm,
            focal_gamma=cfg.focal_gamma,
        )
        out["gen_loss"] = gen_loss
    if cfg.use_discriminative:
        pooled = last_token_pool(hidden, batch["segment_ids"])
        proj = pooled.astype(jnp.float32) @ params["cl_proj"].astype(jnp.float32)
        embeds = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-7)
        left, right = embeds[0::2], embeds[1::2]
        ratio = 0.5 if cfg.use_generative else 1.0
        dis_loss = losses.info_nce(left, right, axis_name=axis_name) * ratio
        out["dis_loss"] = dis_loss
    total = jnp.zeros((), jnp.float32)
    if gen_loss is not None:
        total = total + gen_loss
    if dis_loss is not None:
        total = total + dis_loss
    out["loss"] = total
    return out


def pretrain_logits(
    params: Params, cfg: ModelConfig, batch: Dict[str, jnp.ndarray]
) -> jnp.ndarray:
    """Full generative logits [B, P, next_n, V] for the dLLM generation loop
    (the reference reads head1_logits; generation_utils.py:118-125)."""
    hidden = model_hidden_states(
        params,
        cfg,
        batch["input_ids"],
        batch["position_ids"],
        batch["segment_ids"],
        raw_embeds=batch.get("embed"),
    )
    b, p, d = hidden.shape
    n = cfg.next_n_token
    dt = hidden.dtype
    if n > 1:
        h = (hidden @ params["n_token_proj"].astype(dt)).reshape(b, p, n, d)
    else:
        h = hidden[:, :, None, :]
    return (h @ params["lm_head"].astype(dt)).astype(jnp.float32)


def score_apply(params: Params, cfg: ModelConfig, x: jnp.ndarray, rng=None, train=False):
    dt = x.dtype
    if "score_mlp" in params:
        from .modeling import _act

        act = _act(cfg.hidden_act)
        layers = params["score_mlp"]
        for i, layer in enumerate(layers):
            # MLP applies act->dropout->linear per block (modules_utils.MLP:8-34)
            x = act(x)
            x = _dropout(x, cfg.head_dropout, rng, train)
            x = x @ layer["w"].astype(dt)
            if "b" in layer:
                x = x + layer["b"].astype(dt)
        return x
    x = x @ params["score_w"].astype(dt)
    if "score_b" in params:
        x = x + params["score_b"].astype(dt)
    return x


def task_forward(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = False,
    rng_loss: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Fine-tune forward: pooled score head + problem-type loss, plus the
    optional auxiliary NTP head (DoubleHeadsModel, modeling_finetune.py:329-423)."""
    hidden = model_hidden_states(
        params,
        cfg,
        batch["input_ids"],
        batch["position_ids"],
        batch["segment_ids"],
        raw_embeds=batch.get("embed"),
        rng=rng,
        train=train,
    )
    logits_all = score_apply(params, cfg, hidden, rng, train)  # [B, P, C]
    pooled_logits = pool_hidden(logits_all, batch["segment_ids"], cfg.pooling_method)
    pooled_hidden = pool_hidden(hidden, batch["segment_ids"], cfg.pooling_method)
    out: Dict[str, Any] = {
        "task_logits": pooled_logits.astype(jnp.float32),
        "task_hidden_states": pooled_hidden,
        "hidden_states": hidden,
    }
    if cfg.task_type == "nodev2" and "nodev2_labels" in batch:
        # token-level node classification (reference
        # get_logits_for_token_lvl_task, modeling_finetune.py:140-168)
        labels_tok = batch["nodev2_labels"]  # [B, P]
        if cfg.loss_type == "token_ce_intra":
            inv_temp = 20.0
            h_norm = hidden.astype(jnp.float32)
            h_norm = h_norm / (jnp.linalg.norm(h_norm, axis=-1, keepdims=True) + 1e-7)
            cls_idx = batch["cls_idx"].reshape(-1)  # [B]
            offs = cls_idx[:, None] + jnp.arange(cfg.num_labels)[None, :]
            lle = jnp.take_along_axis(h_norm, offs[..., None], axis=1)  # [B, C, D]
            logits_tok = jnp.einsum("bpd,bcd->bpc", h_norm, lle) * inv_temp
        else:  # token_ce
            logits_tok = logits_all.astype(jnp.float32)
        loss = losses.masked_mean_ce(
            logits_tok.reshape(-1, cfg.num_labels), labels_tok.reshape(-1)
        )
        out["task_logits"] = logits_tok
        out["task_loss"] = loss
        out["loss"] = loss
        return out
    task_labels = None
    for key in ("graph_labels", "node_labels", "edge_labels", "task_labels"):
        if key in batch:
            task_labels = batch[key]
            break
    # the collator emits per-sample weights under "wgt" (data/collator.py);
    # direct callers may pass "sample_wgt" (reference forward kwarg name,
    # modeling_finetune.py:229-233) — accept both.
    sample_wgt = batch.get("sample_wgt", batch.get("wgt"))
    if task_labels is not None:
        if cfg.problem_type == "regression":
            kind = "l1" if cfg.loss_type == "l1" else "mse"
            loss = losses.regression_loss(pooled_logits, task_labels, kind)
        elif cfg.problem_type == "single_label_classification":
            if cfg.loss_type == "auc":
                y_pred = pooled_logits[:, 1] - pooled_logits[:, 0]
                loss = _auc_loss_from_labels(
                    y_pred, task_labels.reshape(-1), cfg.num_neg, rng_loss
                )
            else:
                loss = losses.single_label_ce(
                    pooled_logits.reshape(-1, cfg.num_labels),
                    task_labels.reshape(-1),
                    sample_wgt,
                )
        else:  # multi_label_classification
            loss = losses.multi_label_bce(
                pooled_logits.reshape(-1, cfg.num_labels),
                task_labels.reshape(-1, cfg.num_labels),
                sample_wgt,
            )
        out["task_loss"] = loss
        total = loss
        if cfg.use_aux and "labels" in batch and "lm_head" in params:
            lab3 = batch["labels"] if batch["labels"].ndim == 3 else batch["labels"][..., None]
            aux = losses.chunked_stacked_ce(
                hidden,
                lab3,
                params.get("n_token_proj") if cfg.next_n_token > 1 else None,
                params["lm_head"],
            )
            out["pretrain_loss"] = aux
            total = total + aux
        out["loss"] = total
    return out


def _auc_loss_from_labels(y_pred, y_true, num_neg: int, rng: Optional[jax.Array]):
    """Pairwise squared AUC surrogate with label-driven pos/neg split
    (reference auc_loss, src/utils/loss_utils.py:25-53), static-shaped:
    every position is paired against `num_neg` sampled negatives and
    weighted by pos/neg membership."""
    y_pred = y_pred.astype(jnp.float32).reshape(-1)
    y_true = y_true.reshape(-1) > 0.5
    n = y_pred.shape[0]
    # sample negative candidates uniformly; weight invalid picks to 0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    idx = jax.random.randint(rng, (n, num_neg), 0, n)
    neg_scores = y_pred[idx]  # [n, num_neg]
    neg_valid = ~y_true[idx]
    pos_valid = y_true[:, None]
    w = (pos_valid & neg_valid).astype(jnp.float32)
    per = jnp.square(1.0 - (y_pred[:, None] - neg_scores))
    return jnp.sum(per * w) / (jnp.sum(w) + 1e-7)
