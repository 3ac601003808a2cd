"""Per-layer activation parity harness (BASELINE.md eval-parity anchor).

Dumps every decoder layer's output hidden states for a given batch, and
compares against a reference run (another dump file, or an HF LlamaModel
built from the same weights via utils/convert.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def per_layer_hidden_states(params, cfg, input_ids, position_ids, segment_ids):
    """Returns [L+1, B, P, D]: embedding output then each layer's output.

    Runs layers iteratively (not via the training scan) so activations can
    be captured; numerics are identical to backbone_apply.
    """
    import jax
    import jax.numpy as jnp

    from ..models.modeling import _act, embed_inputs, rms_norm
    from ..models.rope import apply_rope, reset_position_ids, rope_cos_sin
    from ..ops.attention import attention

    dt = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = embed_inputs(params, cfg, jnp.asarray(input_ids)).astype(dt)
    position_ids = reset_position_ids(
        jnp.asarray(position_ids), cfg.rope_range, cfg.max_position_embeddings
    )
    cos, sin = rope_cos_sin(
        position_ids, cfg.head_dim, cfg.rope_theta, resonance=cfg.rope_resonance
    )
    b, p, d = x.shape
    h, hkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    lp = params["layers"]
    outs = [np.asarray(x, np.float32)]
    seg = jnp.asarray(segment_ids)
    for i in range(cfg.num_hidden_layers):
        hpre = rms_norm(x, lp["attn_norm"][i], cfg.rms_norm_eps)
        q = (hpre @ lp["q"][i].astype(dt)).reshape(b, p, h, dh)
        k = (hpre @ lp["k"][i].astype(dt)).reshape(b, p, hkv, dh)
        v = (hpre @ lp["v"][i].astype(dt)).reshape(b, p, hkv, dh)
        q, k = apply_rope(q, k, cos, sin)
        attn = attention(q, k, v, seg, causal=cfg.causal_attention, impl="xla")
        attn = attn.reshape(b, p, h * dh) @ lp["o"][i].astype(dt)
        if "ls1" in lp:
            attn = attn * lp["ls1"][i].astype(dt)
        x = x + attn
        hpre = rms_norm(x, lp["mlp_norm"][i], cfg.rms_norm_eps)
        gate = _act(cfg.hidden_act)(hpre @ lp["gate"][i].astype(dt))
        mlp = (gate * (hpre @ lp["up"][i].astype(dt))) @ lp["down"][i].astype(dt)
        if "ls2" in lp:
            mlp = mlp * lp["ls2"][i].astype(dt)
        x = x + mlp
        outs.append(np.asarray(x, np.float32))
    return np.stack(outs)


def dump_activations(path: str, params, cfg, batch: Dict) -> np.ndarray:
    acts = per_layer_hidden_states(
        params, cfg, batch["input_ids"], batch["position_ids"], batch["segment_ids"]
    )
    np.savez(path, activations=acts)
    return acts


def compare_activation_dumps(
    a: np.ndarray, b: np.ndarray, rtol: float = 2e-4, atol: float = 2e-4
) -> Dict[str, float]:
    """Per-layer max abs error report; raises on mismatch beyond tolerance."""
    assert a.shape == b.shape, (a.shape, b.shape)
    report = {}
    for i in range(a.shape[0]):
        err = float(np.abs(a[i] - b[i]).max())
        report[f"layer_{i}"] = err
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
    return report


def compare_with_hf(params, cfg, input_ids, rtol=2e-4, atol=2e-4) -> Dict[str, float]:
    """Per-layer comparison against an HF LlamaModel carrying our weights
    (requires torch+transformers; causal configs only)."""
    import torch

    from .convert import params_to_flat_state_dict

    from transformers import LlamaConfig, LlamaModel

    sd_np = params_to_flat_state_dict(params, cfg.num_hidden_layers)
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        hidden_act=cfg.hidden_act,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_bias=False,
        mlp_bias=False,
        attn_implementation="eager",
    )
    model = LlamaModel(hf_cfg)
    sd = model.state_dict()
    for name in sd:
        # bare LlamaModel keys lack the "model." prefix of the flat dict
        key = name if name in sd_np else f"model.{name}"
        if key in sd_np:
            sd[name] = torch.tensor(sd_np[key])
    model.load_state_dict(sd)
    model.eval()
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(np.asarray(input_ids)), output_hidden_states=True
        )
    theirs = np.stack([h.numpy() for h in out.hidden_states])  # [L+1, B, P, D]
    b, p = np.asarray(input_ids).shape[:2]
    ours = per_layer_hidden_states(
        params,
        cfg,
        input_ids,
        np.tile(np.arange(p), (b, 1)),
        np.ones((b, p), np.int32),
    )
    # HF's final hidden_states entry carries the final RMSNorm; apply ours
    from ..models.modeling import rms_norm

    import jax.numpy as jnp

    ours[-1] = np.asarray(
        rms_norm(jnp.asarray(ours[-1]), params["final_norm"], cfg.rms_norm_eps),
        np.float32,
    )
    return compare_activation_dumps(ours, theirs, rtol, atol)
