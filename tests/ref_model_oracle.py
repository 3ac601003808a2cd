"""Load the reference MODEL stack from /root/reference as a test oracle.

Extends tests/ref_oracle.py (tokenizer oracle) to the torch model side:
imports the reference's own ``src.models.graphgpt`` modules (which run on
the installed torch + transformers) so tests can drive the REAL
``GraphGPTPretrainBase`` + AdamW + OneCycleLR training loop and compare
loss trajectories against our JAX stack step by step.

The reference modules import absolute ``src.utils.*`` names and relative
``...conf.model``; we pre-register synthetic ``src``/``src.utils``/
``src.conf``/``src.models`` package modules whose __path__ points at the
reference tree but whose __init__ bodies are NOT executed (the real ones
pull in omegaconf / inspection modules we don't need).

Reference anchors: src/models/graphgpt/modeling_pretrain.py:57-266,
src/utils/opt_utils.py:7-37, src/utils/training_utils.py:7-95,
src/utils/loss_utils.py:322-367 (OneCycleLR registration).
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from typing import Optional

import numpy as np

import ref_oracle

REF = "/root/reference/src"


def available() -> bool:
    return ref_oracle.available()


_cache: Optional[types.SimpleNamespace] = None


def _synthetic_pkg(name: str, path: str):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod
    if "." in name:
        parent, _, child = name.rpartition(".")
        setattr(sys.modules[parent], child, mod)
    return mod


def load_model_oracle() -> types.SimpleNamespace:
    global _cache
    if _cache is not None:
        return _cache
    # tokenizer oracle first: installs the torch_geometric / ogb stand-ins
    ref_oracle.load_oracle()

    _synthetic_pkg("src", REF)
    _synthetic_pkg("src.utils", os.path.join(REF, "utils"))
    _synthetic_pkg("src.conf", os.path.join(REF, "conf"))
    _synthetic_pkg("src.models", os.path.join(REF, "models"))

    # real submodules the model stack needs (all torch/numpy/scipy only)
    importlib.import_module("src.utils.control_flow")
    importlib.import_module("src.utils.attn_mask_utils")
    importlib.import_module("src.utils.mol_utils")
    loss_utils = importlib.import_module("src.utils.loss_utils")
    importlib.import_module("src.conf.model")  # dataclasses only
    cfg_mod = importlib.import_module(
        "src.models.graphgpt.configuration_graphgpt"
    )
    pretrain_mod = importlib.import_module(
        "src.models.graphgpt.modeling_pretrain"
    )

    _cache = types.SimpleNamespace(
        GraphGPTConfig=cfg_mod.GraphGPTConfig,
        GraphGPTPretrainBase=pretrain_mod.GraphGPTPretrainBase,
        GraphGPTPosPred=pretrain_mod.GraphGPTPosPred,
        loss_utils=loss_utils,
        modeling_pretrain=pretrain_mod,
    )
    return _cache


# ---------------------------------------------------------------------------
# Weight conversion: our JAX param tree -> reference model state dict
# ---------------------------------------------------------------------------
def load_params_into_reference(model, params, cfg) -> None:
    """Copy our backbone+pretrain params into a reference
    GraphGPTPretrainBase (fp32). Layout notes: our linear weights are
    [in, out] (x @ W); torch nn.Linear stores [out, in]."""
    import torch

    sd = model.state_dict()

    def put(name, arr, transpose=False):
        a = np.asarray(arr, np.float32)
        if transpose:
            a = a.T
        t = torch.tensor(a)
        assert name in sd, f"missing {name} in reference state dict"
        assert sd[name].shape == t.shape, (name, sd[name].shape, t.shape)
        sd[name] = t

    put("model.embed_tokens.weight", params["embed_tokens"])
    put("model.norm.weight", params["final_norm"])
    lp = params["layers"]
    for i in range(cfg.num_hidden_layers):
        put(f"model.layers.{i}.input_layernorm.weight", lp["attn_norm"][i])
        put(f"model.layers.{i}.post_attention_layernorm.weight", lp["mlp_norm"][i])
        put(f"model.layers.{i}.self_attn.q_proj.weight", lp["q"][i], transpose=True)
        put(f"model.layers.{i}.self_attn.k_proj.weight", lp["k"][i], transpose=True)
        put(f"model.layers.{i}.self_attn.v_proj.weight", lp["v"][i], transpose=True)
        put(f"model.layers.{i}.self_attn.o_proj.weight", lp["o"][i], transpose=True)
        put(f"model.layers.{i}.mlp.gate_proj.weight", lp["gate"][i], transpose=True)
        put(f"model.layers.{i}.mlp.up_proj.weight", lp["up"][i], transpose=True)
        put(f"model.layers.{i}.mlp.down_proj.weight", lp["down"][i], transpose=True)
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"], transpose=True)
    if "n_token_proj" in params:
        put("n_token_proj.weight", params["n_token_proj"], transpose=True)
    if "stacked_agg_w" in params:
        put("stacked_feat_agg.weight", params["stacked_agg_w"])
    if "cl_proj" in params:
        put("cl_proj.weight", params["cl_proj"], transpose=True)
    model.load_state_dict(sd, strict=True)
    model.eval()
