"""Backbone activation parity vs HuggingFace transformers LlamaModel.

The reference's model is HF Llama (modeling_common.init_backbone,
src/models/graphgpt/modeling_common.py:160-169). Converting our params into
an HF checkpoint and matching hidden states (fp32, tight tolerance) anchors
RMSNorm/RoPE/attention/MLP semantics to the reference backbone exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from graphgpt_tpu.config import ModelConfig
from graphgpt_tpu.models import heads, modeling


def _cfg():
    return ModelConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=3,
        head_dim=16,
        num_attention_heads=4,
        intermediate_size=128,
        hidden_act="gelu",
        stacked_feat=1,
        next_n_token=1,
        dtype="float32",
        task_type="pretrain",
        causal_attention=True,
    ).finalize()


def _to_hf(params, cfg):
    from transformers import LlamaConfig, LlamaModel

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
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = LlamaModel(hf_cfg)
    sd = model.state_dict()

    def put(name, arr):
        t = torch.tensor(np.asarray(arr, np.float32))
        assert sd[name].shape == t.shape, (name, sd[name].shape, t.shape)
        sd[name] = t

    put("embed_tokens.weight", params["embed_tokens"])
    put("norm.weight", params["final_norm"])
    lp = params["layers"]
    for i in range(cfg.num_hidden_layers):
        put(f"layers.{i}.input_layernorm.weight", lp["attn_norm"][i])
        put(f"layers.{i}.post_attention_layernorm.weight", lp["mlp_norm"][i])
        # ours: x @ W ([in, out]); HF nn.Linear stores [out, in]
        put(f"layers.{i}.self_attn.q_proj.weight", np.asarray(lp["q"][i]).T)
        put(f"layers.{i}.self_attn.k_proj.weight", np.asarray(lp["k"][i]).T)
        put(f"layers.{i}.self_attn.v_proj.weight", np.asarray(lp["v"][i]).T)
        put(f"layers.{i}.self_attn.o_proj.weight", np.asarray(lp["o"][i]).T)
        put(f"layers.{i}.mlp.gate_proj.weight", np.asarray(lp["gate"][i]).T)
        put(f"layers.{i}.mlp.up_proj.weight", np.asarray(lp["up"][i]).T)
        put(f"layers.{i}.mlp.down_proj.weight", np.asarray(lp["down"][i]).T)
    model.load_state_dict(sd)
    model.eval()
    return model


def test_hidden_states_match_hf_causal():
    cfg = _cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    b, p = 2, 24
    ids = rng.integers(1, cfg.vocab_size, size=(b, p)).astype(np.int64)

    ours = modeling.model_hidden_states(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.tile(jnp.arange(p), (b, 1)),
        jnp.ones((b, p), jnp.int32),
    )

    hf = _to_hf(params, cfg)
    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor(ids)).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=2e-4, atol=2e-4
    )


def test_hidden_states_match_hf_bidirectional():
    cfg = _cfg()
    cfg.causal_attention = False
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    b, p = 2, 16
    ids = rng.integers(1, cfg.vocab_size, size=(b, p)).astype(np.int64)
    seg = np.ones((b, p), np.int32)
    seg[:, 12:] = 0  # padding tail

    ours = modeling.model_hidden_states(
        params,
        cfg,
        jnp.asarray(ids),
        jnp.tile(jnp.arange(p), (b, 1)),
        jnp.asarray(seg),
    )

    hf = _to_hf(params, cfg)
    # 4D additive bidirectional mask from padding, like the reference's
    # _update_causal_mask (modeling_helpers.py:38-64)
    valid = torch.tensor(seg)[:, None, None, :].bool().expand(b, 1, p, p)
    mask4d = torch.where(valid, 0.0, torch.finfo(torch.float32).min)
    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor(ids), attention_mask=mask4d).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(ours)[:, :12], theirs.numpy()[:, :12], rtol=2e-4, atol=2e-4
    )


def test_per_layer_parity_harness():
    """utils.parity compares every layer, not just the final states."""
    from graphgpt_tpu.utils import parity

    cfg = _cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    ids = rng.integers(1, cfg.vocab_size, size=(2, 16)).astype(np.int64)
    # compare_with_hf raises internally if any layer deviates beyond
    # rtol/atol; the report carries raw max-abs errors (rtol-scaled values
    # can exceed atol for large activations)
    report = parity.compare_with_hf(params, cfg, ids)
    assert len(report) == cfg.num_hidden_layers + 1
    assert all(v < 5e-3 for v in report.values()), report


def test_iterative_matches_scan_backbone():
    """The parity harness's iterative layer loop reproduces the scan path."""
    from graphgpt_tpu.utils import parity
    from graphgpt_tpu.models import modeling
    import jax.numpy as jnp

    cfg = _cfg()
    cfg.causal_attention = False
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    b, p = 2, 12
    ids = rng.integers(1, cfg.vocab_size, size=(b, p)).astype(np.int64)
    pos = np.tile(np.arange(p), (b, 1))
    seg = np.ones((b, p), np.int32)
    acts = parity.per_layer_hidden_states(params, cfg, ids, pos, seg)
    final_scan = modeling.model_hidden_states(
        params, cfg, jnp.asarray(ids), jnp.asarray(pos), jnp.asarray(seg)
    )
    # scan output has the final norm applied; apply it to the harness output
    normed = modeling.rms_norm(
        jnp.asarray(acts[-1]), params["final_norm"], cfg.rms_norm_eps
    )
    np.testing.assert_allclose(
        np.asarray(normed), np.asarray(final_scan), rtol=2e-4, atol=2e-4
    )
