"""Weight conversion between this framework and reference/HF checkpoints.

The reference saves HF-Llama-style state dicts (GraphGPTPretrainBase is a
LlamaForCausalLM subclass). Name mapping (reference param -> ours):

    model.embed_tokens.weight                  embed_tokens
    model.norm.weight                          final_norm
    model.layers.{i}.input_layernorm.weight    layers.attn_norm[i]
    model.layers.{i}.post_attention_layernorm  layers.mlp_norm[i]
    model.layers.{i}.self_attn.{q,k,v,o}_proj  layers.{q,k,v,o}[i]  (transposed)
    model.layers.{i}.mlp.{gate,up,down}_proj   layers.{gate,up,down}[i]  (transposed)
    lm_head.weight                             lm_head (transposed)
    n_token_proj.weight                        n_token_proj (transposed)
    stacked_feat_agg.weight                    stacked_agg_w
    cl_proj.weight / score.weight              cl_proj / score_w (transposed)

Enables the BASELINE parity anchor: load a reference checkpoint and compare
per-layer activations (tests/test_hf_parity.py does the reverse direction).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def params_to_flat_state_dict(params: Dict[str, Any], num_layers: int) -> Dict[str, np.ndarray]:
    """Our pytree -> reference-style flat state dict (numpy)."""
    sd: Dict[str, np.ndarray] = {}
    sd["model.embed_tokens.weight"] = np.asarray(params["embed_tokens"])
    sd["model.norm.weight"] = np.asarray(params["final_norm"])
    lp = params["layers"]
    for i in range(num_layers):
        pre = f"model.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.asarray(lp["attn_norm"][i])
        sd[f"{pre}.post_attention_layernorm.weight"] = np.asarray(lp["mlp_norm"][i])
        for ours, theirs in (
            ("q", "self_attn.q_proj"),
            ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"),
            ("o", "self_attn.o_proj"),
            ("gate", "mlp.gate_proj"),
            ("up", "mlp.up_proj"),
            ("down", "mlp.down_proj"),
        ):
            sd[f"{pre}.{theirs}.weight"] = np.asarray(lp[ours][i]).T
        if "ls1" in lp:
            sd[f"{pre}.lambda_1"] = np.asarray(lp["ls1"][i])
            sd[f"{pre}.lambda_2"] = np.asarray(lp["ls2"][i])
    for ours, theirs in (
        ("lm_head", "lm_head.weight"),
        ("n_token_proj", "n_token_proj.weight"),
        ("cl_proj", "cl_proj.weight"),
        ("score_w", "score.weight"),
        ("embed_proj", "embed_proj.weight"),
    ):
        if ours in params:
            sd[theirs] = np.asarray(params[ours]).T
    if "stacked_agg_w" in params:
        sd["stacked_feat_agg.weight"] = np.asarray(params["stacked_agg_w"])
    if "score_b" in params:
        sd["score.bias"] = np.asarray(params["score_b"])
    if "embed_layernorm" in params:
        sd["embed_layernorm.weight"] = np.asarray(params["embed_layernorm"])
    if "emb_mask_token" in params:
        sd["emb_mask_token"] = np.asarray(params["emb_mask_token"]).reshape(1, 1, -1)
    return sd


def flat_state_dict_to_params(
    sd: Dict[str, np.ndarray], params_template: Dict[str, Any]
) -> Dict[str, Any]:
    """Reference-style flat state dict -> our pytree (uses the template for
    structure; missing keys keep template values, as in warm-start)."""
    import jax.numpy as jnp

    def arr(x):
        return jnp.asarray(np.asarray(x), jnp.float32)

    out = dict(params_template)
    if "model.embed_tokens.weight" in sd:
        out["embed_tokens"] = arr(sd["model.embed_tokens.weight"])
    if "model.norm.weight" in sd:
        out["final_norm"] = arr(sd["model.norm.weight"])
    lp = dict(params_template["layers"])
    num_layers = lp["attn_norm"].shape[0]
    mapping = (
        ("q", "self_attn.q_proj"),
        ("k", "self_attn.k_proj"),
        ("v", "self_attn.v_proj"),
        ("o", "self_attn.o_proj"),
        ("gate", "mlp.gate_proj"),
        ("up", "mlp.up_proj"),
        ("down", "mlp.down_proj"),
    )
    for ours, theirs in mapping:
        rows = []
        ok = True
        for i in range(num_layers):
            key = f"model.layers.{i}.{theirs}.weight"
            if key not in sd:
                ok = False
                break
            rows.append(np.asarray(sd[key]).T)
        if ok:
            lp[ours] = arr(np.stack(rows))
    for ours, theirs in (("attn_norm", "input_layernorm"), ("mlp_norm", "post_attention_layernorm")):
        rows = []
        ok = True
        for i in range(num_layers):
            key = f"model.layers.{i}.{theirs}.weight"
            if key not in sd:
                ok = False
                break
            rows.append(np.asarray(sd[key]))
        if ok:
            lp[ours] = arr(np.stack(rows))
    out["layers"] = lp
    for ours, theirs in (
        ("lm_head", "lm_head.weight"),
        ("n_token_proj", "n_token_proj.weight"),
        ("cl_proj", "cl_proj.weight"),
        ("score_w", "score.weight"),
        ("embed_proj", "embed_proj.weight"),
    ):
        if theirs in sd and ours in out:
            out[ours] = arr(np.asarray(sd[theirs]).T)
    if "stacked_feat_agg.weight" in sd and "stacked_agg_w" in out:
        out["stacked_agg_w"] = arr(sd["stacked_feat_agg.weight"])
    return out


def load_reference_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference torch checkpoint file into a numpy state dict."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "module" in raw:
        raw = raw["module"]
    return {k: v.float().numpy() for k, v in raw.items() if hasattr(v, "numpy")}
