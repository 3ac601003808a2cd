"""3D-position pretraining model (GraphGPTPosPred).

Reference: src/models/graphgpt/modeling_pretrain.py:269-690 and the pos-SMTP
helpers in modeling_helpers.py:570-1000. Jointly trains:

  - 2D-SMTP over attribute tokens for samples whose coordinates are absent
    (or a sampled fraction; apply_sample_lvl_mask_pos semantics),
  - 3D-SMTP over discretised coordinates — "line" tokens (3 tokens per
    position, shifted per axis under sum aggregation) or "cube" tokens
    (bins^3 joint vocabulary, weight-tied embed/head),
with Gaussian coordinate noise, per-sample polynomial/cosine mask-ratio
schedules, and pos-type embeddings (0-4 for pad/(0,0,0)/(0,0,z)/(0,y,z)/xyz).

All randomness is drawn on-device from a threaded PRNG key.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.mol3d import DICT_RANGE
from ..ops import losses
from .modeling import Params, _normal, backbone_apply, embed_inputs, init_backbone_params

_EPS = 1e-7


def _line_vocab(cfg: ModelConfig) -> int:
    if cfg.pos_agg_method == "sum":
        return cfg.pos_num_bins * 3 + 2
    return cfg.pos_num_bins + 2


def init_pos_pred_params(cfg: ModelConfig, key: jax.Array) -> Params:
    ks = jax.random.split(key, 8)
    params = init_backbone_params(cfg, ks[0])
    d = cfg.hidden_size
    std = cfg.initializer_range
    params["embed_pos_type"] = _normal(ks[1], (5, d), std)
    params["lm_head"] = _normal(ks[2], (d, cfg.vocab_size), std)
    if cfg.next_n_token > 1:
        params["n_token_proj"] = _normal(ks[3], (d, d * cfg.next_n_token), std)
    if cfg.pos_problem_type == "pos-smtp-line":
        params["embed_pos_token"] = _normal(ks[4], (_line_vocab(cfg), d), std)
        params["pos_bins_proj"] = _normal(ks[5], (d, 3 * d), std)
        params["pos_bins_head"] = _normal(ks[6], (d, _line_vocab(cfg) - 2), std)
        if cfg.pos_agg_method == "gated":
            bound = 1.0 / (d**0.5)
            params["pos_token_agg_w"] = jax.random.uniform(
                ks[7], (3, d), jnp.float32, -bound, bound
            )
    elif cfg.pos_problem_type == "pos-smtp-cube":
        # weight-tied embed/head over bins^3 + 2
        vocab = cfg.pos_num_bins**3 + 2
        params["embed_pos_token"] = _normal(ks[4], (vocab, d), std)
    else:  # pos-smtp-mix: both geometries (modeling_pretrain.py:413-471)
        nl = cfg.pos_num_bins_line
        line_vocab = nl * 3 + 2 if cfg.pos_agg_method == "sum" else nl + 2
        params["embed_line_token"] = _normal(ks[4], (line_vocab, d), std)
        params["line_token_proj"] = _normal(ks[5], (d, 3 * d), std)
        params["line_token_head"] = _normal(ks[6], (d, line_vocab), std)
        cube_vocab = cfg.pos_num_bins_cube**3 + 2
        params["embed_cube_token"] = _normal(ks[7], (cube_vocab, d), std)
        params["cube_token_proj"] = _normal(
            jax.random.fold_in(key, 99), (d, d), std
        )
    return params


# ---------------------------------------------------------------------------
# Device-side helpers
# ---------------------------------------------------------------------------
def _discrete_pos(pos, num_bins, range_min, range_max):
    span = range_max - range_min
    bins = (pos - range_min) * ((num_bins - 1) / span)
    return jnp.clip(bins.astype(jnp.int32), 0, num_bins - 1)


def _make_discrete_pos(batch):
    """Pick the discretiser: when the batch carries percentile boundaries
    for a bin count (`pos_boundaries_{num_bins}`, from the dataset's
    dict_bounds — reference pipeline.py:159-162 propagation), use the
    reference's non-uniform bucketize (discrete_pos_v2,
    mol_utils.py:167-179); otherwise uniform DICT_range binning."""

    def f(pos, num_bins, range_min, range_max):
        key = f"pos_boundaries_{num_bins}"
        if key in batch:
            bounds = batch[key].astype(jnp.float32)
            pc = jnp.clip(pos, -99.0, 99.0)
            return (
                jnp.searchsorted(bounds, pc, side="left").astype(jnp.int32) - 1
            )
        return _discrete_pos(pos, num_bins, range_min, range_max)

    return f


def _schedule_ratio(u, power: float):
    """Per-sample mask-ratio transform (modeling_helpers.py:925-936)."""
    if power == -2:
        return jnp.arccos(u * 2 - 1) / jnp.pi
    if power == -1:
        return 0.5 * jnp.cos(jnp.pi * u) + 0.5
    return u**power


def pos_pred_forward(
    params: Params,
    cfg: ModelConfig,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> Dict[str, Any]:
    input_ids = batch["input_ids"]  # [B, P, F]
    pos_type = batch["pos_type"]  # [B, P]
    node_idx = batch["node_idx"]  # [B, P]
    raw_pos = batch["pos"].astype(jnp.float32)  # [B, P, 3]
    b, p, f = input_ids.shape
    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_sep, r_2d, r_noise, r_mask, r_coord, r_body = jax.random.split(rng, 6)

    smtp_2d_rate = cfg.smtp_2d_rate if train else 0.0
    if cfg.sep_2d3d_inputs and train:
        # zero out coordinates of a sampled fraction -> those samples train
        # the 2D objective only (apply_sample_lvl_mask_pos,
        # utils_graphgpt.py:209-222)
        pick = jax.random.uniform(r_sep, (b, 1, 1)) < smtp_2d_rate
        raw_pos = jnp.where(pick, 0.0, raw_pos)

    no_pos = (jnp.abs(raw_pos) < _EPS).all(axis=-1).all(axis=-1)  # [B]
    bz_idx = jnp.arange(b)[:, None]
    if "labels" in batch and cfg.task_type == "pretrain-mlm-coord":
        # host-side MLM masking already applied by the tokenizer
        # (pretrain-mlm-coord, reference tokenizer_utils.py:428-451):
        # input_ids arrive masked and labels carry the 2D targets
        labels_2d = batch["labels"]
        masked_ids = input_ids
    else:
        # 2D SMTP in-model: mask attr tokens of samples whose pos is all zero
        t2 = jax.random.uniform(r_2d, (b, 1, 1))
        mask_per_node = jax.random.uniform(r_2d, (b, p, f)) > t2
        mask_per_node = mask_per_node & no_pos[:, None, None]
        mask_tok = mask_per_node[bz_idx, node_idx] & (input_ids > 0)
        labels_2d = jnp.where(mask_tok, input_ids, -100)
        masked_ids = jnp.where(mask_tok, cfg.mask_token_id, input_ids)

    # pad/sample masks for 3D (modeling_helpers._add_pos_noise_and_get_masks)
    sample_mask = no_pos[:, None]  # [B, 1]
    pad_mask = pos_type > 0  # [B, P]
    noise_mask = (~pad_mask) | sample_mask  # [B, P]
    gnoise = jax.random.normal(r_noise, raw_pos.shape) * cfg.smtp_3d_noise_scale
    gnoise = gnoise[bz_idx, node_idx]  # same noise for all visits of a node
    noise = jnp.where(noise_mask[..., None], 0.0, gnoise)
    noisy_pos = raw_pos + (noise if train else 0.0)

    # 3D SMTP mask (per node, gathered per token)
    u = jax.random.uniform(r_mask, (b, 1, 1))
    mr = _schedule_ratio(u, cfg.smtp_3d_power)
    m_node = jax.random.uniform(r_coord, (b, p, 3)) > mr
    if not cfg.coord_lvl_mask:
        m_node = jnp.broadcast_to(m_node[:, :, 0:1], m_node.shape)
    mask3 = m_node[bz_idx, node_idx] & pad_mask[:, :, None]  # [B, P, 3]

    range_min = jnp.asarray(DICT_RANGE[cfg.pos_range][0])
    range_max = jnp.asarray(DICT_RANGE[cfg.pos_range][1])
    disc = _make_discrete_pos(batch)

    # embeddings: stacked attrs + pos type + pos tokens
    embeds = embed_inputs(params, cfg, masked_ids, rng=None, train=False)
    embeds = embeds + params["embed_pos_type"].astype(dt)[jnp.clip(pos_type, 0)]
    if cfg.pos_problem_type == "pos-smtp-line":
        nb = cfg.pos_num_bins
        shift = (
            jnp.asarray([0, nb, nb * 2]) if cfg.pos_agg_method == "sum" else jnp.zeros(3, jnp.int32)
        )
        in_tok = disc(jnp.where(mask3, 0.0, noisy_pos), nb, range_min, range_max)
        in_tok = in_tok + shift[None, None, :] + 2
        in_tok = jnp.where(sample_mask[..., None], 1, in_tok)  # [mask] whole sample
        in_tok = jnp.where(mask3, 1, in_tok)  # [mask] masked coords
        in_tok = jnp.where(~pad_mask[..., None], 0, in_tok)  # [pad]
        tok_emb = params["embed_pos_token"].astype(dt)[in_tok]  # [B,P,3,D]
        if cfg.pos_agg_method == "gated":
            pos_embeds = jnp.einsum("bpcd,cd->bpd", tok_emb, params["pos_token_agg_w"].astype(dt))
        else:
            pos_embeds = tok_emb.sum(axis=-2)
        # labels: clean-pos bins (+shift), only at masked+valid coords
        lab = disc(raw_pos, nb, range_min, range_max) + shift[None, None, :]
        valid_lab = mask3 & ~sample_mask[..., None] & pad_mask[..., None]
        labels_3d = jnp.where(valid_lab, lab, -100)
    elif cfg.pos_problem_type == "pos-smtp-cube":
        nb = cfg.pos_num_bins
        mult = jnp.asarray([nb * nb, nb, 1])
        bins = disc(noisy_pos, nb, range_min, range_max)
        tok = (bins * mult[None, None, :]).sum(-1) + 2  # [B, P]
        m_any = mask3.any(-1)
        tok = jnp.where(sample_mask | m_any, 1, tok)
        tok = jnp.where(~pad_mask, 0, tok)
        pos_embeds = params["embed_pos_token"].astype(dt)[tok]
        # +2 offset matches the tied embed/head vocabulary ([pad]=0, [mask]=1)
        lab = (disc(raw_pos, nb, range_min, range_max) * mult[None, None, :]).sum(-1) + 2
        valid_lab = m_any & ~sample_mask & pad_mask
        labels_3d = jnp.where(valid_lab, lab, -100)[..., None]
    else:  # pos-smtp-mix: line + cube token embeddings, two 3D losses
        nl = cfg.pos_num_bins_line
        shift = (
            jnp.asarray([0, nl, nl * 2]) if cfg.pos_agg_method == "sum" else jnp.zeros(3, jnp.int32)
        )
        lt = disc(jnp.where(mask3, 0.0, noisy_pos), nl, range_min, range_max)
        lt = lt + shift[None, None, :] + 2
        lt = jnp.where(sample_mask[..., None] | mask3, 1, lt)
        lt = jnp.where(~pad_mask[..., None], 0, lt)
        line_emb = params["embed_line_token"].astype(dt)[lt].sum(axis=-2)
        nc = cfg.pos_num_bins_cube
        mult = jnp.asarray([nc * nc, nc, 1])
        m_any = mask3.any(-1)
        ct = (disc(noisy_pos, nc, range_min, range_max) * mult[None, None, :]).sum(-1) + 2
        ct = jnp.where(sample_mask | m_any, 1, ct)
        ct = jnp.where(~pad_mask, 0, ct)
        cube_emb = params["embed_cube_token"].astype(dt)[ct]
        pos_embeds = line_emb + cube_emb
        lab_line = disc(raw_pos, nl, range_min, range_max) + shift[None, None, :] + 2
        valid_l = mask3 & ~sample_mask[..., None] & pad_mask[..., None]
        labels_3d = jnp.where(valid_l, lab_line, -100)  # line labels (head1)
        lab_cube = (disc(raw_pos, nc, range_min, range_max) * mult[None, None, :]).sum(-1) + 2
        valid_c = m_any & ~sample_mask & pad_mask
        labels_cube = jnp.where(valid_c, lab_cube, -100)[..., None]

    embeds = embeds + pos_embeds
    hidden = backbone_apply(
        params, cfg, embeds, batch["position_ids"], batch["segment_ids"], r_body, train
    )

    # loss aggregation (reference loss_agg, modeling_pretrain.py:606,634):
    # "token-lvl" (default) = global token mean; "sample-lvl" weights each
    # valid token by 1/its-sample's-valid-count so every sample counts
    # equally (the reference's normalized per-feat wgt,
    # modeling_helpers.py:_prepare_for_stacked_feat_labels_per_feat_lvl)
    def _agg_wgt(lab):
        if cfg.loss_agg == "token-lvl":
            return None
        valid = (lab != -100).astype(jnp.float32)
        cnt = valid.sum(axis=(1, 2), keepdims=True)
        return valid / (cnt + 1e-9)

    # 2D auxiliary CE
    aux_loss = losses.chunked_stacked_ce(
        hidden,
        labels_2d,
        params.get("n_token_proj") if cfg.next_n_token > 1 else None,
        params["lm_head"],
        token_wgt=_agg_wgt(labels_2d),
        focal_gamma=cfg.focal_gamma,
    )
    # 3D CE
    if cfg.pos_problem_type == "pos-smtp-line":
        loss_3d = losses.chunked_stacked_ce(
            hidden,
            labels_3d,
            params["pos_bins_proj"],
            params["pos_bins_head"],
            token_wgt=_agg_wgt(labels_3d),
        )
    elif cfg.pos_problem_type == "pos-smtp-cube":
        head = params["embed_pos_token"].T  # weight-tied (modeling_pretrain.py:406)
        loss_3d = losses.chunked_stacked_ce(
            hidden, labels_3d, None, head, token_wgt=_agg_wgt(labels_3d)
        )
    else:  # mix: line loss is head1, cube loss joins the aux head
        loss_3d = losses.chunked_stacked_ce(
            hidden, labels_3d, params["line_token_proj"], params["line_token_head"],
            token_wgt=_agg_wgt(labels_3d),
        )
        cube_hidden = hidden @ params["cube_token_proj"].astype(hidden.dtype)
        cube_loss = losses.chunked_stacked_ce(
            cube_hidden, labels_cube, None, params["embed_cube_token"].T,
            token_wgt=_agg_wgt(labels_cube),
        )
        aux_loss = aux_loss + cube_loss
    loss = loss_3d + aux_loss
    return {
        "loss": loss,
        "gen_loss": loss_3d,
        "pretrain_loss": aux_loss,
        "hidden_states": hidden,
    }
