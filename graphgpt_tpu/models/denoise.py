"""Denoising regression double-heads fine-tune model (Transformer-M style).

Reference: GraphGPTDenoisingRegressionDoubleHeadsModel
(src/models/graphgpt/modeling_finetune.py:426-903) + AtomTaskHead
(utils_graphgpt.py:271-337) + get_denoise_loss (utils_graphgpt.py:249-268).

Two heads over the shared backbone:
  1. supervised energy regression (pooled score head, or binary-energy
     bi-causal decoding of 16 bits when bi_causal_split > 0),
  2. coordinate-noise denoising via an equivariant attention head whose
     values are mixed by pairwise displacement vectors, trained with
     1 - cosine-similarity against the injected noise.

Training mixes 2D-only / 3D / both input modes per sample via
(r_2d, r_3d, r_both) ratios.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.mol3d import DICT_RANGE
from ..ops import losses
from .heads import init_task_params, pool_hidden
from .modeling import Params, _normal, backbone_apply, embed_inputs
from .rope import apply_rope, rope_cos_sin

MOL_ENERGY_BIN_LEN = 16
MOL_ENERGY_SCALE = 1000.0
_EPS = 1e-7


def init_denoise_params(cfg: ModelConfig, key: jax.Array) -> Params:
    ks = jax.random.split(key, 10)
    params = init_task_params(cfg, ks[0])
    d = cfg.hidden_size
    std = cfg.initializer_range
    h, dh = cfg.num_attention_heads, cfg.head_dim
    params["denoise"] = {
        "q": _normal(ks[1], (d, h * dh), std),
        "k": _normal(ks[2], (d, h * dh), std),
        "v": _normal(ks[3], (d, h * dh), std),
        "force_w": _normal(ks[4], (3, h * dh), std),  # 3 x Linear(embed,1)
        "force_b": jnp.zeros((3,), jnp.float32),
    }
    if cfg.add_pos_type:
        params["embed_pos_type"] = _normal(ks[5], (5, d), std)
    # line-token position embedding (token-line input transform)
    nb = cfg.pos_num_bins
    vocab = nb * 3 + 2 if cfg.pos_agg_method == "sum" else nb + 2
    params["embed_pos_token"] = _normal(ks[6], (vocab, d), std)
    if cfg.smtp_3d:
        params["smtp_proj"] = _normal(ks[7], (d, 3 * d), std)
        params["smtp_head"] = _normal(ks[8], (d, cfg.smtp_vocab), std)
    return params


def atom_task_head(
    dn: Params,
    hidden: jnp.ndarray,  # [B, P, D]
    position_ids: jnp.ndarray,
    delta_pos: jnp.ndarray,  # [B, P, P, 3]
    cfg: ModelConfig,
) -> jnp.ndarray:
    """Equivariant force head (AtomTaskHead, utils_graphgpt.py:271-337)."""
    b, p, d = hidden.shape
    h, dh = cfg.num_attention_heads, cfg.head_dim
    dt = hidden.dtype
    q = (hidden @ dn["q"].astype(dt)).reshape(b, p, h, dh) * (dh**-0.5)
    k = (hidden @ dn["k"].astype(dt)).reshape(b, p, h, dh)
    v = (hidden @ dn["v"].astype(dt)).reshape(b, p, h, dh)
    cos, sin = rope_cos_sin(position_ids, dh, cfg.rope_theta)
    q, k = apply_rope(q, k, cos, sin)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(attn, axis=-1).astype(dt)  # [B, H, P, P]
    # displacement-weighted value mixing: [B,H,P,P,1] * [B,1,P,P,3]
    rot = probs[..., None] * delta_pos[:, None].astype(dt)  # [B,H,P,P,3]
    x = jnp.einsum("bhqkc,bkhd->bqchd", rot, v)  # [B,P,3,H,Dh]
    x = x.reshape(b, p, 3, h * dh)
    force = jnp.einsum("bpcf,cf->bpc", x.astype(jnp.float32), dn["force_w"].astype(jnp.float32))
    return force + dn["force_b"][None, None, :]


def denoise_cosine_loss(pred, noise, noise_mask):
    """1 - cos(pred, noise), averaged over un-masked positions per sample
    (get_denoise_loss, utils_graphgpt.py:249-268)."""
    pred = jnp.where(noise_mask, 0.0, pred.astype(jnp.float32))
    noise = noise.astype(jnp.float32)
    dot = jnp.sum(pred * noise, axis=-1)
    na = jnp.linalg.norm(pred, axis=-1) + 1e-8
    nb = jnp.linalg.norm(noise, axis=-1) + 1e-8
    per = 1.0 - dot / (na * nb)
    valid = ~noise_mask[..., 0]
    per = jnp.where(valid, per, 0.0).sum(axis=-1)
    cnt = jnp.maximum(valid.sum(axis=-1).astype(jnp.float32), 1.0)
    return jnp.mean(per / cnt)


def denoise_forward(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> Dict[str, Any]:
    input_ids = batch["input_ids"]
    pos_type = batch["pos_type"]
    node_idx = batch["node_idx"]
    raw_pos = batch["pos"].astype(jnp.float32)
    b, p, f = input_ids.shape
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_mode, r_noise, r_body, r_sched, r_node = jax.random.split(rng, 5)

    # per-sample 2D/3D mode sampling: a mask_3d_ratio fraction trains 2D-only
    ratio_sum = cfg.r_2d + cfg.r_3d + cfg.r_both
    mask_3d_ratio = cfg.r_2d / max(ratio_sum, _EPS)
    if train:
        pick2d = jax.random.uniform(r_mode, (b, 1, 1)) < mask_3d_ratio
        raw_pos = jnp.where(pick2d, 0.0, raw_pos)

    # noise injection (modeling_helpers._add_pos_noise_and_get_masks)
    bz_idx = jnp.arange(b)[:, None]
    no_pos = (jnp.abs(raw_pos) < _EPS).all(-1).all(-1)  # [B]
    sample_mask = no_pos[:, None]
    pad_mask = pos_type > 0
    noise_mask = ((~pad_mask) | sample_mask)[..., None]  # [B, P, 1]
    gnoise = jax.random.normal(r_noise, raw_pos.shape) * cfg.noise_scale
    gnoise = gnoise[bz_idx, node_idx]
    noise = jnp.where(noise_mask, 0.0, gnoise)
    noisy_pos = raw_pos + (noise if train else 0.0)

    # node-level schedule masking (_mask_pos_in_node_lvl_on_schedule,
    # modeling_helpers.py:481-495): with smtp_3d this creates the 3D-SMTP
    # aux targets; with denoise_schedule_pow != 0 it curricula the denoise
    # task (reference asserts the two are exclusive,
    # modeling_finetune.py:770-771). Masked positions lose their noise,
    # their coordinates, and (below) their pos tokens.
    sched_pow = None
    if cfg.smtp_3d:
        sched_pow = cfg.smtp_3d_power
    elif cfg.denoise_schedule_pow != 0:
        sched_pow = cfg.denoise_schedule_pow
    mask1 = None  # [B, P, 1]
    if sched_pow is not None:
        u = jax.random.uniform(r_sched, (b, 1, 1))
        if sched_pow == -1:
            mr = jnp.cos(u * jnp.pi / 2)
        elif sched_pow == -2:
            mr = 1.0 - (2.0 / jnp.pi) * jnp.arccos(u)
        else:
            mr = u**sched_pow
        m_node = jax.random.uniform(r_node, (b, p, 1)) > mr
        mask1 = m_node[bz_idx, node_idx] & pad_mask[..., None]
        noise = jnp.where(mask1, 0.0, noise)
        noisy_pos = jnp.where(mask1, 0.0, noisy_pos)
        noise_mask = noise_mask | mask1

    delta_pos = noisy_pos[:, :, None, :] - noisy_pos[:, None, :, :]  # [B,P,P,3]
    dist = jnp.linalg.norm(delta_pos, axis=-1, keepdims=True)
    delta_pos = delta_pos / (dist + 1.0)

    # embeddings: stacked attrs + pos type + line pos tokens
    embeds = embed_inputs(params, cfg, input_ids, rng=None, train=False)
    if cfg.add_pos_type:
        embeds = embeds + params["embed_pos_type"].astype(dt)[jnp.clip(pos_type, 0)]
    nb = cfg.pos_num_bins
    range_min = jnp.asarray(DICT_RANGE[cfg.pos_range][0])
    range_max = jnp.asarray(DICT_RANGE[cfg.pos_range][1])
    span = range_max - range_min
    bins = jnp.clip(
        ((noisy_pos - range_min) * ((nb - 1) / span)).astype(jnp.int32), 0, nb - 1
    )
    shift = jnp.asarray([0, nb, 2 * nb]) if cfg.pos_agg_method == "sum" else jnp.zeros(3, jnp.int32)
    tok = bins + shift[None, None, :] + 2
    tok = jnp.where(sample_mask[..., None], 1, tok)
    if mask1 is not None:  # schedule-masked positions see the [mask] token
        tok = jnp.where(mask1, 1, tok)
    tok = jnp.where(~pad_mask[..., None], 0, tok)
    pos_emb = params["embed_pos_token"].astype(dt)[tok].sum(axis=-2)
    embeds = embeds + pos_emb

    hidden = backbone_apply(
        params, cfg, embeds, batch["position_ids"], batch["segment_ids"], r_body, train
    )
    out: Dict[str, Any] = {"hidden_states": hidden}

    # head 1: supervised energy
    task_labels = batch.get("graph_labels")
    total = jnp.zeros((), jnp.float32)
    if cfg.bi_causal_split > 0:
        # binary-energy decoding: last 16 positions' score logits are bits
        # (modeling_finetune.py:830-870); labels: batch["labels"] holds the
        # bit targets at the suffix rows
        from .heads import score_apply

        logits_all = score_apply(params, cfg, hidden)  # [B, P, 1]
        nbits = MOL_ENERGY_BIN_LEN
        bit_logits = logits_all[:, -nbits:, 0].astype(jnp.float32)  # [B, 16]
        unit = (2.0 ** jnp.arange(nbits)[::-1]) / MOL_ENERGY_SCALE
        wgt = ((jnp.arange(nbits) + 1) * 2.0 / (nbits + 1))[::-1]
        pred_energy = jnp.sum((bit_logits > 0).astype(jnp.float32) * unit, axis=-1)
        out["task_logits"] = pred_energy[:, None]
        if task_labels is not None:
            y = task_labels.reshape(-1).astype(jnp.float32)
            bits = jnp.floor(
                y[:, None] * MOL_ENERGY_SCALE / (2.0 ** jnp.arange(nbits)[::-1])
            ).astype(jnp.int32) % 2
            per = jnp.maximum(bit_logits, 0) - bit_logits * bits + jnp.log1p(
                jnp.exp(-jnp.abs(bit_logits))
            )
            task_loss = jnp.mean(per * wgt[None, :])
            out["task_loss"] = task_loss
            total = total + task_loss
    else:
        from .heads import score_apply

        logits_all = score_apply(params, cfg, hidden)
        pooled = pool_hidden(logits_all, batch["segment_ids"], cfg.pooling_method)
        out["task_logits"] = pooled.astype(jnp.float32)
        if task_labels is not None:
            kind = "l1" if cfg.loss_type == "l1" else "mse"
            task_loss = losses.regression_loss(pooled, task_labels, kind)
            out["task_loss"] = task_loss
            total = total + task_loss

    # head 2: denoising
    force = atom_task_head(params["denoise"], hidden, batch["position_ids"], delta_pos, cfg)
    dn_loss = denoise_cosine_loss(force, noise, noise_mask) * cfg.denoise_wgt
    out["pretrain_loss"] = dn_loss
    total = total + dn_loss

    # head 3: 3D-SMTP auxiliary CE on the schedule-masked positions
    # (modeling_finetune.py:860-881: line tokens of the CLEAN coordinates,
    # per-feat gather through smtp_proj, scaled by smtp_wgt)
    if cfg.smtp_3d and mask1 is not None:
        lab = (
            jnp.clip(
                ((raw_pos - range_min) * ((cfg.smtp_vocab - 1) / span)).astype(
                    jnp.int32
                ),
                0,
                cfg.smtp_vocab - 1,
            )
            + 2
        )  # [B, P, 3]
        if cfg.smtp_denoise:
            valid = pad_mask[..., None] & ~sample_mask[..., None]
        else:
            valid = mask1 & ~sample_mask[..., None]
        smtp_labels = jnp.where(valid, lab, -100)
        smtp_loss = (
            losses.chunked_stacked_ce(
                hidden, smtp_labels, params["smtp_proj"], params["smtp_head"]
            )
            * cfg.smtp_wgt
        )
        out["smtp_loss"] = smtp_loss
        total = total + smtp_loss
    out["loss"] = total
    return out
