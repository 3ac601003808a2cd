"""Training step, optimizer schedules, and mesh-sharded execution."""

import jax
import jax.numpy as jnp
import numpy as np

from graphgpt_tpu.config import MeshConfig, ModelConfig, OptimizerConfig
from graphgpt_tpu.models import heads
from graphgpt_tpu.parallel import mesh as mesh_lib
from graphgpt_tpu.training import optimizer as opt_lib
from graphgpt_tpu.training.steps import TrainState, init_train_state, make_eval_step, make_train_step


def tiny_cfg(**kw):
    cfg = ModelConfig(
        vocab_size=60,
        hidden_size=32,
        num_hidden_layers=2,
        head_dim=8,
        num_attention_heads=4,
        intermediate_size=64,
        stacked_feat=3,
        next_n_token=3,
        mask_token_id=1,
        dtype="float32",
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg.finalize()


def tiny_batch(cfg, b=8, p=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, cfg.vocab_size, size=(b, p, cfg.stacked_feat)).astype(np.int32)
    labels = np.where(rng.random((b, p, cfg.stacked_feat)) < 0.5, ids, -100).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "position_ids": jnp.tile(jnp.arange(p), (b, 1)),
        "segment_ids": jnp.ones((b, p), jnp.int32),
    }


def test_schedules():
    cfg = OptimizerConfig(lr=1e-3)
    for name in ("warmup_decay", "onecycle", "cosine", "constant"):
        cfg.scheduler = name
        s = opt_lib.make_schedule(cfg, total_steps=100, warmup_steps=10)
        vals = [float(s(i)) for i in (0, 10, 50, 99)]
        assert all(np.isfinite(vals)), name
        assert max(vals) <= 1e-3 + 1e-9, name
    cfg.scheduler = "warmup_decay"
    s = opt_lib.make_schedule(cfg, 100, 10)
    assert abs(float(s(10)) - 1e-3) < 1e-9  # peak at end of warmup
    assert float(s(0)) == 0.0


def test_token_budget_steps():
    total, warmup = opt_lib.compute_total_steps(1e6, 1e5, 100.0, 10)
    assert total == 1000 and warmup == 100


def test_train_step_overfits():
    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(lr=3e-3, use_ema=True, ema_decay=0.9)
    tx = opt_lib.make_optimizer(ocfg, total_steps=100, warmup_steps=5)
    state = init_train_state(params, tx, use_ema=True)
    step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg)
    batch = tiny_batch(cfg)
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(80):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.4, losses[::16]
    assert int(state.step) == 80
    assert np.isfinite(float(metrics["grad_norm"]))
    # EMA params differ from live params but are close
    diff = float(jnp.abs(state.ema_params["embed_tokens"] - state.params["embed_tokens"]).max())
    assert 0 < diff < 1.0


def test_eval_step_uses_ema():
    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(lr=1e-3, use_ema=True)
    tx = opt_lib.make_optimizer(ocfg, 10, 2)
    state = init_train_state(params, tx, use_ema=True)
    batch = tiny_batch(cfg)
    ev = make_eval_step(heads.pretrain_forward, cfg, use_ema=False)
    out = ev(state, batch)
    assert np.isfinite(float(out["loss"]))


def test_sharded_train_step_matches_single():
    """2x2x2 mesh (data x fsdp x tensor) step == unsharded step numerics."""
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(lr=1e-3)
    tx = opt_lib.make_optimizer(ocfg, 100, 5)
    batch = tiny_batch(cfg)
    rng = jax.random.PRNGKey(7)

    # unsharded
    state1 = init_train_state(params, tx)
    step1 = make_train_step(heads.pretrain_forward, cfg, tx, ocfg, donate=False)
    state1, m1 = step1(state1, batch, rng)

    # sharded
    m = mesh_lib.make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    pspecs = mesh_lib.param_pspecs(params)
    shardings = mesh_lib.named_sharding_tree(m, pspecs)
    params_s = jax.device_put(params, shardings)
    state2 = init_train_state(params_s, tx)
    batch_s = mesh_lib.shard_batch(m, {k: np.asarray(v) for k, v in batch.items()})
    step2 = make_train_step(heads.pretrain_forward, cfg, tx, ocfg, donate=False)
    with m:
        state2, m2 = step2(state2, batch_s, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state1.params["final_norm"]),
        np.asarray(state2.params["final_norm"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_grad_accumulation():
    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(lr=1e-3, gradient_accumulation_steps=2)
    tx = opt_lib.make_optimizer(ocfg, 100, 5)
    state = init_train_state(params, tx)
    step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg)
    batch = tiny_batch(cfg)
    p0 = np.asarray(state.params["final_norm"]).copy()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # after 1 microstep params unchanged (accumulating)
    np.testing.assert_array_equal(np.asarray(state.params["final_norm"]), p0)
    # applies happen at microsteps 2 and 4; the first apply uses warmup
    # lr=0, so expect a change only after the second apply
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(0))
    assert not np.array_equal(np.asarray(state.params["final_norm"]), p0)


def test_layerwise_lr_scales():
    from graphgpt_tpu.training.optimizer import layerwise_lr_scales

    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    tx = opt_lib.make_optimizer(OptimizerConfig(lr=1.0), 10, 1)
    lw = __import__("optax").chain(layerwise_lr_scales(params, cfg.num_hidden_layers, 0.5))
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    scaled, _ = lw.update(grads, lw.init(params), params)
    q = np.asarray(scaled["layers"]["q"])
    # layer 0 scaled by 0.5^(L-1)=0.5, last layer by 1.0
    assert abs(q[0, 0, 0] - 0.5) < 1e-6
    assert abs(q[-1, 0, 0] - 1.0) < 1e-6
    assert abs(float(scaled["embed_tokens"][0, 0]) - 0.25) < 1e-6


def test_weighted_samplers():
    from graphgpt_tpu.data.datasets import (
        GraphsMapDataset,
        SyntheticMolDataset,
        shift_distribution_indices,
        size_weighted_indices,
    )
    from graphgpt_tpu.data.graph import GraphBatchStore

    ds = SyntheticMolDataset(100, seed=0)
    store = GraphBatchStore([ds[i] for i in range(100)])
    rng = np.random.default_rng(0)
    idx = np.arange(100)
    w = size_weighted_indices(store, idx, 500, rng)
    assert w.min() >= 0 and w.max() < 100
    sizes = np.diff(store._node_ptr)
    # larger graphs sampled more often
    big_half = idx[sizes > np.median(sizes)]
    frac = np.isin(w, big_half).mean()
    assert frac > 0.5
    s = shift_distribution_indices(store, idx[:80], idx[80:], 200, rng)
    assert len(s) == 200


def test_extra_schedulers():
    """Scheduler registry parity: cyclic / cosine_wr / lr_range_test
    (reference src/utils/loss_utils.py:170-367)."""
    from graphgpt_tpu.config import OptimizerConfig
    from graphgpt_tpu.training.optimizer import make_schedule

    cyc = make_schedule(
        OptimizerConfig(lr=1.0, min_lr=0.1, scheduler="cyclic", cycle_steps=10), 100, 5
    )
    assert abs(float(cyc(0)) - 0.1) < 1e-6
    assert abs(float(cyc(10)) - 1.0) < 1e-6  # top of the triangle
    assert abs(float(cyc(20)) - 0.1) < 1e-6  # back at base

    wr = make_schedule(
        OptimizerConfig(lr=1.0, scheduler="cosine_wr", cycle_steps=20, cycle_mult=2.0),
        100,
        5,
    )
    assert abs(float(wr(5)) - 1.0) < 1e-6  # peak after warmup
    assert float(wr(19)) < float(wr(10)) < float(wr(6))  # decaying in cycle 1
    assert abs(float(wr(20)) - 1.0) < 1e-6  # restart
    assert abs(float(wr(60)) - 1.0) < 1e-6  # second restart (20 + 40)
    assert float(wr(59)) < 0.1  # end of the T_mult-stretched cycle

    rt = make_schedule(OptimizerConfig(lr=1.0, min_lr=0.0, scheduler="lr_range_test"), 100, 5)
    assert float(rt(0)) < 1e-6
    assert abs(float(rt(50)) - 0.5) < 1e-2
    assert abs(float(rt(100)) - 1.0) < 1e-6


def test_task_forward_uses_collator_wgt():
    """Regression (round-1 verdict): the collator emits per-sample weights
    under "wgt" (data/collator.py:103) and task_forward must apply them to
    the loss, matching the reference's sample_wgt forward kwarg
    (modeling_finetune.py:229-233)."""
    cfg = tiny_cfg(
        problem_type="single_label_classification",
        num_labels=2,
        use_generative=False,
    )
    params = heads.init_task_params(cfg, jax.random.PRNGKey(0))
    batch = tiny_batch(cfg, b=4)
    labels = jnp.asarray([0, 1, 0, 1])
    out_plain = heads.task_forward(params, cfg, dict(batch, task_labels=labels))
    out_wgt = heads.task_forward(
        params,
        cfg,
        dict(batch, task_labels=labels, wgt=jnp.asarray([4.0, 0.1, 0.1, 0.1])),
    )
    assert not np.isclose(float(out_plain["loss"]), float(out_wgt["loss"]))
    # explicit sample_wgt still honoured (and wins over wgt)
    out_sw = heads.task_forward(
        params,
        cfg,
        dict(
            batch,
            task_labels=labels,
            sample_wgt=jnp.asarray([4.0, 0.1, 0.1, 0.1]),
            wgt=jnp.ones(4),
        ),
    )
    np.testing.assert_allclose(float(out_sw["loss"]), float(out_wgt["loss"]), rtol=1e-6)


def test_freeze_transform_layers():
    """Regression: freeze=k must freeze embeddings AND the first k decoder
    layers (reference freeze_llama_layers, src/utils/modules_utils.py:44-54)."""
    import optax

    from graphgpt_tpu.training.finetune import make_freeze_transform

    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    # lr_range_test with min_lr>0 => nonzero lr at step 0
    ocfg = OptimizerConfig(lr=1e-2, min_lr=1e-2, scheduler="lr_range_test")
    tx = optax.chain(
        opt_lib.make_optimizer(ocfg, 10, 1),
        make_freeze_transform(1, cfg.num_hidden_layers),
    )
    state = init_train_state(params, tx)
    step = make_train_step(heads.pretrain_forward, cfg, tx, ocfg, donate=False)
    new_state, _ = step(state, tiny_batch(cfg), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(new_state.params["embed_tokens"]), np.asarray(params["embed_tokens"])
    )
    q_new = np.asarray(new_state.params["layers"]["q"])
    q_old = np.asarray(params["layers"]["q"])
    np.testing.assert_array_equal(q_new[0], q_old[0])  # layer 0 frozen
    assert not np.array_equal(q_new[1], q_old[1])  # layer 1 trains


def test_layerwise_lr_knob_engaged():
    """Regression: OptimizerConfig.layerwise_lr_decay>0 must engage
    layer-wise LR scaling inside make_optimizer (reference
    get_layerwise_param_groups*, src/utils/loss_utils.py:270-412)."""
    cfg = tiny_cfg()
    params = heads.init_pretrain_params(cfg, jax.random.PRNGKey(0))
    ocfg = OptimizerConfig(
        lr=1e-2,
        min_lr=1e-2,
        scheduler="lr_range_test",
        weight_decay=0.0,
        layerwise_lr_decay=0.5,
    )
    tx = opt_lib.make_optimizer(ocfg, 10, 1, num_layers=cfg.num_hidden_layers)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    q = np.asarray(updates["layers"]["q"])
    ratio = abs(q[0, 0, 0] / q[-1, 0, 0])
    assert abs(ratio - 0.5) < 1e-3, ratio


def test_finetune_label_key_nodev2():
    """Regression: _label_key must resolve nodev2 (and unknown task types
    fall back to task_labels) instead of raising KeyError."""
    from graphgpt_tpu.config import Config
    from graphgpt_tpu.training.finetune import FinetunePipeline

    fp = FinetunePipeline.__new__(FinetunePipeline)
    fp.cfg = Config()
    fp.cfg.training.task_type = "nodev2"
    assert fp._label_key() == "nodev2_labels"
    fp.cfg.training.task_type = "smtp"
    assert fp._label_key() == "task_labels"
