"""Loss-trajectory parity: our JAX train loop vs the REFERENCE torch loop.

The strongest quality proof available without the OGB datasets: both stacks
start from IDENTICAL weights (converted), consume IDENTICAL fp32 batches,
and run the same optimizer recipe — AdamW(betas, eps, wd) + OneCycleLR
(cos, div_factor 25, final_div_factor 1e4, total_steps+1) + global-norm
grad clip — for N steps. Per-step losses must track within fp32 tolerance,
and step-0 gradients must match allclose. This pins optimizer semantics,
the LR schedule, loss normalisation (dLM 1/(bz*seq*next_n)), and weight
decay placement to the reference's own code, which activation parity alone
cannot.

Reference anchors: src/utils/training_utils.py:7-95 (batch step),
src/utils/opt_utils.py:7-37 (AdamW + OneCycleLR wiring),
src/utils/loss_utils.py:322-367 (OneCycleLR params),
src/models/graphgpt/modeling_pretrain.py:152-266 (loss path).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

import ref_model_oracle as rmo
from graphgpt_tpu.config import ModelConfig, OptimizerConfig
from graphgpt_tpu.models import heads
from graphgpt_tpu.training import optimizer as opt_lib
from graphgpt_tpu.training.steps import init_train_state, make_train_step

pytestmark = pytest.mark.skipif(
    not rmo.available(), reason="reference tree not present"
)

B, P, F, V = 4, 32, 4, 120
N_STEPS = 30
LR, WD, BETAS, EPS, CLIP = 1e-3, 0.1, (0.9, 0.95), 1e-6, 1.0
WARMUP = 5


def _our_cfg():
    return ModelConfig(
        vocab_size=V,
        hidden_size=64,
        num_hidden_layers=2,
        head_dim=16,
        num_attention_heads=4,
        intermediate_size=128,
        hidden_act="gelu",
        stacked_feat=F,
        next_n_token=F,
        stacked_feat_agg_method="gated",
        dtype="float32",
        task_type="pretrain-mlm",
        causal_attention=False,
        max_position_embeddings=P,
    ).finalize()


def _ref_model(params, cfg):
    o = rmo.load_model_oracle()
    rcfg = o.GraphGPTConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim,
        hidden_act=cfg.hidden_act,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        causal_attention=False,
        stacked_feat=cfg.stacked_feat,
        stack_method="short",
        stacked_feat_agg_method="gated",
        next_n_token=cfg.next_n_token,
        use_generative=True,
        use_discriminative=False,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = o.GraphGPTPretrainBase(rcfg)
    model = model.float()
    rmo.load_params_into_reference(model, params, cfg)
    return model


def _batches(n_steps, seed=0):
    """Identical fp32 SMTP batches for both stacks: stacked ids, host-masked
    labels (-100 off-mask), padding tail, dLM sample weights."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        ids = rng.integers(2, V, size=(B, P, F)).astype(np.int64)
        lab = np.where(rng.random((B, P, F)) < 0.35, ids, -100)
        att = np.ones((B, P), np.int64)
        for b in range(B):
            pad = int(rng.integers(0, 6))
            if pad:
                att[b, P - pad :] = 0
                ids[b, P - pad :] = 0
                lab[b, P - pad :] = -100
        wgt = rng.uniform(0.5, 1.5, size=(B,)).astype(np.float32)
        out.append({"input_ids": ids, "labels": lab, "attention_mask": att, "wgt": wgt})
    return out


def _run_reference(params, cfg, batches):
    """The reference DDP batch step (training_utils.py:49-91) without the
    (identity-on-CPU) GradScaler: zero_grad -> forward -> loss ->
    backward -> clip -> AdamW step -> OneCycleLR step."""
    model = _ref_model(params, cfg)
    model.train()
    opt = torch.optim.AdamW(
        model.parameters(), lr=LR, betas=BETAS, eps=EPS, weight_decay=WD
    )
    sched_gen, _ = rmo.load_model_oracle().loss_utils.set_py_scheduler(
        "OneCycleLR",
        {"scheduler": {"params": {}}},
        max_lr=LR,
        min_lr=0,
        total_steps=len(batches) + 1,
        pct_start=WARMUP / len(batches),
        last_step_index=-1,
    )
    sched = sched_gen(opt)
    losses, grad0 = [], None
    for step, data in enumerate(batches):
        opt.zero_grad()
        out = model(
            input_ids=torch.tensor(data["input_ids"]),
            attention_mask=torch.tensor(data["attention_mask"]),
            labels=torch.tensor(data["labels"]),
            sample_wgt=torch.tensor(data["wgt"]),
        )
        loss = out.head1_loss
        loss.backward()
        if step == 0:
            grad0 = {
                "embed_tokens": model.model.embed_tokens.weight.grad.numpy().copy(),
                "lm_head": model.lm_head.weight.grad.numpy().T.copy(),
                "q0": model.model.layers[0].self_attn.q_proj.weight.grad.numpy().T.copy(),
                "down1": model.model.layers[1].mlp.down_proj.weight.grad.numpy().T.copy(),
            }
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses), grad0


def _run_ours(params, cfg, batches):
    ocfg = OptimizerConfig(
        lr=LR,
        weight_decay=WD,
        betas=BETAS,
        eps=EPS,
        max_grad_norm=CLIP,
        scheduler="onecycle",
    )
    # reference runs OneCycleLR with total_steps = N+1 (opt_utils.py:30-33)
    tx = opt_lib.make_optimizer(ocfg, len(batches) + 1, WARMUP)
    state = init_train_state(params, tx)
    step_fn = make_train_step(heads.pretrain_forward, cfg, tx, ocfg, donate=False)

    def to_batch(data):
        att = data["attention_mask"]
        return {
            "input_ids": jnp.asarray(data["input_ids"], jnp.int32),
            "labels": jnp.asarray(data["labels"], jnp.int32),
            "position_ids": jnp.tile(jnp.arange(P, dtype=jnp.int32), (B, 1)),
            "segment_ids": jnp.asarray(att, jnp.int32),
            "wgt": jnp.asarray(data["wgt"]),
        }

    # step-0 gradients for the allclose check
    def loss_fn(p):
        return heads.pretrain_forward(p, cfg, to_batch(batches[0]), train=True)["loss"]

    g = jax.grad(loss_fn)(state.params)
    grad0 = {
        "embed_tokens": np.asarray(g["embed_tokens"]),
        "lm_head": np.asarray(g["lm_head"]),
        "q0": np.asarray(g["layers"]["q"][0]),
        "down1": np.asarray(g["layers"]["down"][1]),
    }
    losses = []
    rng = jax.random.PRNGKey(0)
    for data in batches:
        state, metrics = step_fn(state, to_batch(data), rng)
        losses.append(float(metrics["loss"]))
    return np.asarray(losses), grad0


def test_loss_trajectory_matches_reference():
    cfg = _our_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    batches = _batches(N_STEPS)

    ref_losses, ref_grad0 = _run_reference(params, cfg, batches)
    our_losses, our_grad0 = _run_ours(params, cfg, batches)

    # step-0 gradients allclose (same weights, same batch, fp32)
    for k in ref_grad0:
        np.testing.assert_allclose(
            our_grad0[k], ref_grad0[k], rtol=2e-4, atol=2e-5, err_msg=f"grad {k}"
        )
    # per-step losses track through 30 optimizer updates
    np.testing.assert_allclose(our_losses, ref_losses, rtol=5e-4, atol=5e-4)
    # sanity: the optimizer is actually updating (losses vary step to step;
    # batches are random so the loss need not decrease monotonically)
    assert np.std(our_losses) > 1e-4
