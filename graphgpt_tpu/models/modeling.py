"""Llama-semantics transformer backbone, pure-functional JAX.

Re-designs the reference's HF-Llama backbone + GraphGPT customizations
(src/models/graphgpt/utils_graphgpt.py:83-193, modeling_common.py:105-142)
TPU-first:

  - params are a plain pytree; per-layer weights are stacked on a leading
    axis and the decoder runs under `jax.lax.scan` (O(1) compile time in
    depth, pjit-friendly);
  - bf16 activations / fp32 norms+softmax; params stay fp32 master copies;
  - attention mask structure comes from `segment_ids` inside the attention
    kernel — no host-side 4D masks;
  - DropPath (stochastic depth, linearly increasing per layer,
    utils_graphgpt.py:184-191), LayerScale (utils_graphgpt.py:93-105), and
    the stacked-feature embedding aggregation (sum | gated einsum,
    modeling_common.py:105-142) are all first-class.

Matches reference numerics: RMSNorm eps 1e-6, RoPE theta 1e4, gate/up/down
MLP with exact gelu by default, head_dim 64.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..config import ModelConfig
from ..ops.attention import attention
from .rope import apply_rope, reset_position_ids, rope_cos_sin

Params = Dict[str, Any]


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------
def _normal(key, shape, std):
    return (jax.random.normal(key, shape) * std).astype(jnp.float32)


def init_backbone_params(cfg: ModelConfig, key: jax.Array) -> Params:
    cfg = cfg
    d = cfg.hidden_size
    l = cfg.num_hidden_layers
    h, hkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    i = cfg.intermediate_size
    std = cfg.initializer_range
    keys = jax.random.split(key, 16)
    params: Params = {
        "embed_tokens": _normal(keys[0], (cfg.vocab_size, d), std),
        "final_norm": jnp.ones((d,), jnp.float32),
        "layers": {
            "attn_norm": jnp.ones((l, d), jnp.float32),
            "q": _normal(keys[1], (l, d, h * dh), std),
            "k": _normal(keys[2], (l, d, hkv * dh), std),
            "v": _normal(keys[3], (l, d, hkv * dh), std),
            "o": _normal(keys[4], (l, h * dh, d), std),
            "mlp_norm": jnp.ones((l, d), jnp.float32),
            "gate": _normal(keys[5], (l, d, i), std),
            "up": _normal(keys[6], (l, d, i), std),
            "down": _normal(keys[7], (l, i, d), std),
        },
    }
    if cfg.layer_scale_init_value > 0:
        params["layers"]["ls1"] = jnp.full((l, d), cfg.layer_scale_init_value, jnp.float32)
        params["layers"]["ls2"] = jnp.full((l, d), cfg.layer_scale_init_value, jnp.float32)
    if cfg.stacked_feat_agg_method == "gated" and cfg.stacked_feat > 1:
        # kaiming-uniform bound 1/sqrt(fan_in) (reference
        # StackedFeatAggregation.reset_parameters, modeling_common.py:117-125)
        bound = 1.0 / (cfg.hidden_size**0.5)
        params["stacked_agg_w"] = jax.random.uniform(
            keys[8], (cfg.stacked_feat, d), jnp.float32, -bound, bound
        )
    if cfg.embed_dim > 0:
        params["embed_layernorm"] = jnp.ones((cfg.embed_dim,), jnp.float32)
        params["embed_proj"] = _normal(keys[9], (cfg.embed_dim, d), std)
        params["emb_mask_token"] = _normal(keys[10], (cfg.embed_dim,), std)
    return params


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------
def _rms_norm_ref(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rms_norm_vjp(x, weight, eps, pallas_bwd=False):
    return _rms_norm_ref(x, weight, eps)


def _rms_norm_vjp_fwd(x, weight, eps, pallas_bwd=False):
    # residuals: the bf16 input + [..., 1] f32 rrms — autodiff instead
    # drags f32 [B*P, D] intermediates through the backward (profiled
    # ~2 ms/layer at the flagship shape; the fused rule is one pass)
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    rrms = jax.lax.rsqrt(var + eps)
    y = (x32 * rrms * weight.astype(jnp.float32)).astype(x.dtype)
    return y, (x, weight, rrms)


def _rms_norm_vjp_bwd(eps, pallas_bwd, res, g):
    x, weight, rrms = res
    if pallas_bwd and x.ndim == 2:
        # fused one-pass kernel (dx + dw accumulated per token tile): the
        # XLA lowering of the formula below still costs ~1.8 ms/layer at
        # the flagship [65536, 768] (~4x the HBM-traffic floor). Runs
        # shard-local under an active mesh (kernel_sharding wraps it in
        # shard_map and psums dw); None = shapes don't divide the mesh,
        # use the XLA formula below.
        from ..parallel.kernel_sharding import rmsnorm_bwd

        res2 = rmsnorm_bwd(x, g, weight, eps)
        if res2 is not None:
            dx, dw = res2
            return dx, dw.astype(weight.dtype)
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    n = x32 * rrms
    dn = g32 * weight.astype(jnp.float32)
    # dx = rrms * (dn - n * mean(dn * n)) — standard RMSNorm adjoint
    dx = rrms * (dn - n * jnp.mean(dn * n, axis=-1, keepdims=True))
    dw = jnp.sum(g32 * n, axis=tuple(range(g.ndim - 1)))
    return dx.astype(x.dtype), dw.astype(weight.dtype)


_rms_norm_vjp.defvjp(_rms_norm_vjp_fwd, _rms_norm_vjp_bwd)


def rms_norm(
    x: jnp.ndarray, weight: jnp.ndarray, eps: float, pallas_bwd: bool = False
) -> jnp.ndarray:
    """HF-Llama-semantics RMSNorm (f32 stats and elementwise, cast back;
    modeling_llama.LlamaRMSNorm): forward math is IDENTICAL between the
    custom-VJP path (default) and the plain autodiff reference
    (GGT_RMSNORM_VJP=0). pallas_bwd additionally runs the adjoint as a
    fused Pallas kernel (TPU meshes; resolved alongside cfg.mlp_kernel)."""
    if os.environ.get("GGT_RMSNORM_VJP", "1") == "0":
        return _rms_norm_ref(x, weight, eps)
    return _rms_norm_vjp(x, weight, eps, pallas_bwd)


# Pallas RMSNorm adjoint: measured SLOWER end-to-end on v5e (102.9k vs
# 104.2k tokens/s — XLA fuses the plain adjoint with its neighbours better
# than the standalone kernel's sequential grid); knob retained for other
# chip generations.
_RMS_PALLAS = os.environ.get("GGT_RMSNORM_PALLAS", "0") == "1"


def _act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new" or name == "gelu_pytorch_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "silu":
        return jax.nn.silu
    raise ValueError(f"unknown hidden_act {name!r}")


def _dropout(x, rate: float, rng, train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def _drop_path(x, rate, rng, train: bool):
    """Per-sample stochastic depth; rate may be a traced scalar."""
    if not train or rng is None:
        return x
    keep_prob = 1.0 - rate
    keep = jax.random.bernoulli(rng, keep_prob, (x.shape[0], 1, 1))
    return jnp.where(keep, x / keep_prob, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Embedding path
# ---------------------------------------------------------------------------
@jax.custom_vjp
def _embed_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table[ids] with a matmul-based backward.

    XLA's scatter-add for the embedding gradient costs ~17 ms/step at
    [64,1024,13] ids on v5e; for the small graph vocabularies here
    (hundreds to tens of thousands of tokens) a chunked one-hot
    contraction dE = onehot(ids)^T @ g runs on the MXU instead."""
    return table[ids]


def _embed_lookup_fwd(table, ids):
    return table[ids], (ids, jnp.zeros(table.shape[:1], table.dtype))


def _embed_lookup_bwd(res, g):
    ids, tproto = res
    vocab, tdt = tproto.shape[0], tproto.dtype
    d = g.shape[-1]
    flat_ids = ids.reshape(-1)
    gf = g.reshape(-1, d)
    n = flat_ids.shape[0]
    chunk = min(n, 65536)
    while n % chunk != 0:
        chunk //= 2
    classes = jnp.arange(vocab, dtype=flat_ids.dtype)

    def body(acc, i):
        sl_ids = jax.lax.dynamic_slice_in_dim(flat_ids, i * chunk, chunk)
        sl_g = jax.lax.dynamic_slice_in_dim(gf, i * chunk, chunk)
        onehot = (sl_ids[:, None] == classes[None, :]).astype(g.dtype)
        acc = acc + jax.lax.dot_general(
            onehot, sl_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    dtab, _ = jax.lax.scan(
        body, jnp.zeros((vocab, d), jnp.float32), jnp.arange(n // chunk)
    )
    return dtab.astype(tdt), None


_embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


@jax.custom_vjp
def _embed_lookup_sum(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """sum_f table[ids[..., f]] with neither side materialising [B,P,F,D].

    The naive table[ids].sum(-2) materialises a [B,P,F,D] tensor forward
    (1.2 GB at the flagship shape) and broadcasts the [B,P,D] cotangent
    back to it; profiled at ~14 ms/step. Here the forward accumulates F
    gathers, and the backward contracts a per-chunk COUNT matrix
    (sum of F one-hots) against the cotangent — F times fewer MXU FLOPs
    than one-hot-per-feature and no broadcast."""
    out = table[ids[..., 0]]
    for f in range(1, ids.shape[-1]):
        out = out + table[ids[..., f]]
    return out


def _embed_lookup_sum_fwd(table, ids):
    return _embed_lookup_sum(table, ids), (
        ids,
        jnp.zeros(table.shape[:1], table.dtype),
    )


def _embed_lookup_sum_bwd(res, g):
    ids, tproto = res
    vocab, tdt = tproto.shape[0], tproto.dtype
    f = ids.shape[-1]
    d = g.shape[-1]
    flat_ids = ids.reshape(-1, f)
    gf = g.reshape(-1, d)
    n = gf.shape[0]
    chunk = min(n, 8192)
    while n % chunk != 0:
        chunk //= 2
    classes = jnp.arange(vocab, dtype=flat_ids.dtype)

    def body(acc, i):
        sl_ids = jax.lax.dynamic_slice_in_dim(flat_ids, i * chunk, chunk)
        sl_g = jax.lax.dynamic_slice_in_dim(gf, i * chunk, chunk)
        # counts <= F are exactly representable in bf16
        counts = (
            (sl_ids[:, :, None] == classes[None, None, :]).astype(g.dtype).sum(1)
        )  # [chunk, vocab]
        acc = acc + jax.lax.dot_general(
            counts, sl_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    dtab, _ = jax.lax.scan(
        body, jnp.zeros((vocab, d), jnp.float32), jnp.arange(n // chunk)
    )
    return dtab.astype(tdt), None


_embed_lookup_sum.defvjp(_embed_lookup_sum_fwd, _embed_lookup_sum_bwd)


def embed_inputs(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,  # [B, P] or [B, P, F]
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    dt = _dtype(cfg)
    table = params["embed_tokens"].astype(dt)
    use_edrop = train and rng is not None and cfg.embed_dropout > 0
    if (
        input_ids.ndim == 3
        and cfg.stacked_feat_agg_method != "gated"
        and not use_edrop
    ):
        # fused gather-sum: no [B,P,F,D] tensor fwd or bwd (gated agg and
        # per-element embed dropout need the un-aggregated tensor)
        emb = _embed_lookup_sum(table, input_ids)
    else:
        emb = _embed_lookup(table, input_ids)  # [B,P,D] or [B,P,F,D]
        emb = _dropout(emb, cfg.embed_dropout, rng, train)
        if input_ids.ndim == 3:
            if cfg.stacked_feat_agg_method == "gated":
                w = params["stacked_agg_w"].astype(dt)
                emb = jnp.einsum("bsfd,fd->bsd", emb, w, preferred_element_type=jnp.float32).astype(dt)
            else:
                emb = jnp.sum(emb, axis=-2)
    if input_ids.ndim == 3 and cfg.stack_method == "long":
        nonzero = (input_ids != 0).sum(axis=-1, keepdims=True) + 1e-7
        ratio = jnp.clip(1.0 / nonzero.astype(dt), a_max=1.0)
        emb = emb * ratio
    return emb


def add_raw_embeds(
    params: Params,
    cfg: ModelConfig,
    inputs_embeds: jnp.ndarray,
    raw_embeds: jnp.ndarray,  # [B, P, embed_dim]
    embed_is_masked: Optional[jnp.ndarray] = None,  # [B, P] bool; True -> use mask token
    rng=None,
    train: bool = False,
) -> jnp.ndarray:
    """Raw float-feature branch: mask-token substitution -> RMSNorm ->
    dropout -> linear proj -> add (reference prepare_inputs_embeds,
    modeling_pretrain.py:119-150)."""
    dt = inputs_embeds.dtype
    x = raw_embeds.astype(dt)
    if embed_is_masked is not None:
        mask_tok = params["emb_mask_token"].astype(dt)
        x = jnp.where(embed_is_masked[..., None], mask_tok[None, None, :], x)
    x = rms_norm(
        x, params["embed_layernorm"], cfg.rms_norm_eps, _RMS_PALLAS and cfg.mlp_kernel == "on"
    )
    x = _dropout(x, cfg.embed_dropout, rng, train)
    x = x @ params["embed_proj"].astype(dt)
    return inputs_embeds + x


# ---------------------------------------------------------------------------
# Decoder stack (scan over layers)
# ---------------------------------------------------------------------------
def backbone_apply(
    params: Params,
    cfg: ModelConfig,
    inputs_embeds: jnp.ndarray,  # [B, P, D]
    position_ids: jnp.ndarray,  # [B, P]
    segment_ids: jnp.ndarray,  # [B, P]
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    dt = _dtype(cfg)
    x = inputs_embeds.astype(dt)
    b, p, d = x.shape
    h, hkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    position_ids = reset_position_ids(position_ids, cfg.rope_range, cfg.max_position_embeddings)
    cos, sin = rope_cos_sin(
        position_ids, dh, cfg.rope_theta, resonance=cfg.rope_resonance,
        dtype=jnp.float32, rope_scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
    )
    n_layers = cfg.num_hidden_layers
    # linearly increasing stochastic-depth rate (utils_graphgpt.py:184-191)
    dp_rates = (
        jnp.linspace(0.0, cfg.path_dropout, n_layers)
        if cfg.path_dropout > 0
        else jnp.zeros(n_layers)
    )
    layer_idx = jnp.arange(n_layers)
    use_ls = "ls1" in params["layers"]

    # static gating: with every stochastic rate at 0 (the usual pretrain
    # setting) no per-layer rng splits, bernoullis, or [B,P,D] `where`
    # passes are traced at all — dp_rates being a traced zeros array would
    # otherwise keep DropPath alive through fwd+recompute+bwd
    use_dp = train and rng is not None and cfg.path_dropout > 0
    use_adrop = train and rng is not None and cfg.attention_dropout > 0
    use_mdrop = train and rng is not None and cfg.mlp_dropout > 0
    needs_rng = use_dp or use_adrop or use_mdrop

    def apply_one(x, lp, dp_rate, idx):
        # x: [B*P, D]. The layer body runs on a flat token axis so every
        # projection is a canonical rank-2 GEMM: with a rank-3
        # [B,P,D] @ [D,*] dot this XLA lowers the projections as
        # convolutions and assigns conv-style batch-in-lanes {1,2,0}
        # layouts to the whole residual stream (measured: the down-proj
        # at 4x ideal time plus 200MB layout copies around every Pallas
        # call). The [B,P,...] views at the attention boundary are pure
        # bitcasts of the {1,0} layout.
        if needs_rng:
            lrng = jax.random.fold_in(rng, idx)
            r_mlp, r_dp1, r_dp2, r_adrop = jax.random.split(lrng, 4)
        else:
            r_mlp = r_dp1 = r_dp2 = r_adrop = None

        def drop_path_tokens(t, r):
            return _drop_path(t.reshape(b, p, d), dp_rate, r, train).reshape(b * p, d)

        # --- attention block
        if (
            os.environ.get("GGT_ATTN_NORM_FUSE", "0") == "1"
            and cfg.mlp_kernel == "on"
        ):
            # pre-norm fused into the q/k/v projections (ops/mlp.py).
            # Round-5 re-measure after the in-kernel rope fold: 114.2k
            # once vs 113.5/113.8k repeats (within run-to-run noise) on
            # the synthetic step — no robust win, and the extra kernel's
            # VMEM footprint risks the round-4 input-overlap regression in
            # the real pipeline. Stays off; knob retained.
            from ..parallel.kernel_sharding import norm_qkv

            q2, k2, v2 = norm_qkv(
                x, lp["attn_norm"], lp["q"], lp["k"], lp["v"], cfg.rms_norm_eps
            )
            q = q2.reshape(b, p, h, dh)
            k = k2.reshape(b, p, hkv, dh)
            v = v2.reshape(b, p, hkv, dh)
        else:
            hpre = rms_norm(
                x, lp["attn_norm"], cfg.rms_norm_eps,
                _RMS_PALLAS and cfg.mlp_kernel == "on",
            )
            q = (hpre @ lp["q"].astype(dt)).reshape(b, p, h, dh)
            k = (hpre @ lp["k"].astype(dt)).reshape(b, p, hkv, dh)
            v = (hpre @ lp["v"].astype(dt)).reshape(b, p, hkv, dh)
        # rope is passed through: the flash kernels rotate q/k in-kernel
        # (fwd + transpose-rotated cotangents) — the XLA/ring paths
        # pre-rotate inside attention() (ops/attention.py)
        attn_out = attention(
            q, k, v, segment_ids, causal=cfg.causal_attention, impl=cfg.attn_impl,
            bi_causal_split=cfg.bi_causal_split, attn_block=cfg.attn_block,
            rope=(cos, sin),
        )
        attn_out = attn_out.reshape(b * p, h * dh) @ lp["o"].astype(dt)
        if use_adrop:
            attn_out = _dropout(attn_out, cfg.attention_dropout, r_adrop, train)
        if use_ls:
            attn_out = attn_out * lp["ls1"].astype(dt)
        if use_dp:
            attn_out = drop_path_tokens(attn_out, r_dp1)
        x = x + attn_out
        # --- MLP block
        if (
            os.environ.get("GGT_MLP_NORM_FUSE", "1") == "1"
            and cfg.mlp_kernel == "on"
            and not (use_mdrop or use_ls or use_dp)
        ):
            # norm+MLP+residual in one kernel: hpre never round-trips HBM
            # and the backward chains both tested adjoints (104.2k -> 106.2k
            # tokens/s on v5e, PERF.md round 4). Falls back to the split
            # path when LayerScale/DropPath/mlp-dropout sit between the MLP
            # and the residual. kernel_sharding runs it shard-local under
            # an active mesh (shard_map over the token axes; Megatron
            # colwise/rowwise + psum for tensor>1).
            from ..parallel.kernel_sharding import norm_mlp as fused_norm_mlp

            return fused_norm_mlp(
                x, lp["mlp_norm"], lp["gate"], lp["up"], lp["down"],
                cfg.rms_norm_eps, cfg.hidden_act,
            )
        hpre = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps, _RMS_PALLAS and cfg.mlp_kernel == "on")
        mlp_kernel = os.environ.get("GGT_MLP_KERNEL", "")
        if not mlp_kernel:
            # "auto" resolves at pipeline setup from the MESH devices (the
            # default backend is the axon TPU even when running a virtual
            # CPU mesh); unresolved auto stays off
            mlp_kernel = "1" if cfg.mlp_kernel == "on" else "0"
        if mlp_kernel == "1" and not use_mdrop:
            # fused Pallas MLP (ops/mlp.py): three back-to-back GEMMs with
            # resident weights instead of XLA's windowed mega-fusion;
            # shard-local under an active mesh via kernel_sharding
            from ..parallel.kernel_sharding import mlp as fused_mlp

            mlp_out = fused_mlp(
                hpre, lp["gate"], lp["up"], lp["down"], cfg.hidden_act
            )
            if use_ls:
                mlp_out = mlp_out * lp["ls2"].astype(dt)
            if use_dp:
                mlp_out = drop_path_tokens(mlp_out, r_dp2)
            return x + mlp_out
        gate = _act(cfg.hidden_act)(hpre @ lp["gate"].astype(dt))
        up = hpre @ lp["up"].astype(dt)
        # GGT_MLP_BARRIER sweep knob (PERF.md): XLA fuses up-GEMM ->
        # act*gate -> down-GEMM -> residual into ONE serial convolution
        # (profiled 3.4x the down-GEMM roofline). 1 = barrier after the
        # multiply; 2 = barrier between the GEMMs and the elementwise (the
        # down conv keeps an elementwise-only prologue). Both measured
        # SLOWER end-to-end on v5e — the knob remains for other chips.
        barrier = os.environ.get("GGT_MLP_BARRIER", "0")
        if barrier == "2":
            gate, up = jax.lax.optimization_barrier((gate, up))
        gated = checkpoint_name(gate * up, "mlp_gated")
        if barrier == "1":
            gated = jax.lax.optimization_barrier(gated)
        mlp_out = gated @ lp["down"].astype(dt)
        if use_mdrop:
            mlp_out = _dropout(mlp_out, cfg.mlp_dropout, r_mlp, train)
        if use_ls:
            mlp_out = mlp_out * lp["ls2"].astype(dt)
        if use_dp:
            mlp_out = drop_path_tokens(mlp_out, r_dp2)
        x = x + mlp_out
        return x

    # scan-carry layout: keep the carry in its [B, P, D] shape and reshape
    # to the flat token axis inside the body. With a 2D [B*P, D] carry
    # XLA's layout assignment picks tokens-minor {0,1} for the carry AND
    # the scan's saved-xs stack, which lowers the MLP matmuls as
    # batch-in-lanes convolutions (profiled: down-proj at 4x ideal time);
    # the 3D carry bitcasts freely to the canonical {1,0} (measured +7.3%
    # step throughput on v5e, 87.5k -> 93.9k tokens/s). GGT_CARRY3D=0
    # restores the flat carry for A/B sweeps.
    import os as _os

    carry3d = _os.environ.get("GGT_CARRY3D", "1") == "1"

    def layer_fn(carry, scanned):
        lp, dp_rate, idx = scanned
        if carry3d:
            out = apply_one(carry.reshape(b * p, d), lp, dp_rate, idx)
            return out.reshape(b, p, d), None
        return apply_one(carry, lp, dp_rate, idx), None

    if not carry3d:
        x = x.reshape(b * p, d)

    group = {"pairs": 2, "quads": 4}.get(cfg.remat_policy, 1)
    if cfg.remat and group > 1 and n_layers % group == 0:
        # checkpoint at layer-group granularity: divides recompute cost by
        # `group` for (group-1) extra saved activations per segment
        if carry3d:
            x = x.reshape(b * p, d)  # group path keeps the flat carry
            carry3d = False
        grouped = jax.tree_util.tree_map(
            lambda a: a.reshape((n_layers // group, group) + a.shape[1:]),
            params["layers"],
        )

        def group_fn(carry, scanned):
            lpg, dpg, idxg = scanned
            x = carry
            for j in range(group):
                x = apply_one(
                    x,
                    jax.tree_util.tree_map(lambda a: a[j], lpg),
                    dpg[j],
                    idxg[j],
                )
            return x, None

        fn = jax.checkpoint(group_fn)
        x, _ = jax.lax.scan(
            fn,
            x,
            (grouped, dp_rates.reshape(-1, group), layer_idx.reshape(-1, group)),
        )
        return rms_norm(
            x, params["final_norm"], cfg.rms_norm_eps, _RMS_PALLAS and cfg.mlp_kernel == "on"
        ).reshape(b, p, d)
    if cfg.remat:
        if cfg.remat_policy == "dots":
            # save matmul outputs, recompute elementwise: much cheaper
            # backward than full remat at moderate extra memory
            fn = jax.checkpoint(
                layer_fn,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif cfg.remat_policy == "save_attn":
            # saves the flash kernel's named outputs (out, lse) per layer so
            # the backward recompute skips the VPU-bound forward kernel (the
            # gradient attachment consumes them as saved inputs)
            from ..ops.flash_attention import SAVE_ATTN_NAMES

            fn = jax.checkpoint(
                layer_fn,
                policy=jax.checkpoint_policies.save_only_these_names(*SAVE_ATTN_NAMES),
            )
        elif cfg.remat_policy == "save_attn_mlp":
            # save_attn + the gate*up product: backward recompute also skips
            # the two widest (d -> 4d) matmuls, trading one [B,P,4D] bf16
            # tensor per layer for ~half the recompute FLOPs
            from ..ops.flash_attention import SAVE_ATTN_NAMES

            fn = jax.checkpoint(
                layer_fn,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *SAVE_ATTN_NAMES, "mlp_gated"
                ),
            )
        else:
            fn = jax.checkpoint(layer_fn)
    else:
        fn = layer_fn
    x, _ = jax.lax.scan(fn, x, (params["layers"], dp_rates, layer_idx))
    return rms_norm(
        x, params["final_norm"], cfg.rms_norm_eps, _RMS_PALLAS and cfg.mlp_kernel == "on"
    ).reshape(b, p, d)


def model_hidden_states(
    params: Params,
    cfg: ModelConfig,
    input_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    segment_ids: jnp.ndarray,
    raw_embeds: Optional[jnp.ndarray] = None,
    embed_is_masked: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """input embedding (+raw embed branch) -> decoder -> final norm."""
    if rng is not None:
        r_embed, r_body = jax.random.split(rng)
    else:
        r_embed = r_body = None
    x = embed_inputs(params, cfg, input_ids, r_embed, train)
    if raw_embeds is not None and cfg.embed_dim > 0:
        x = add_raw_embeds(params, cfg, x, raw_embeds, embed_is_masked, r_embed, train)
    return backbone_apply(params, cfg, x, position_ids, segment_ids, r_body, train)
