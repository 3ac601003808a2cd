"""dLLM generation loop, metrics, OGB evaluators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgpt_tpu.config import GenerationConfig
from graphgpt_tpu.generation import dllm
from graphgpt_tpu.utils import metrics, ogb_eval

MASK = 1


def _logits_fn_oracle(truth, vocab):
    """Oracle model: puts all probability on the true token."""

    def fn(x):
        onehot = jax.nn.one_hot(truth, vocab) * 10.0
        return jnp.broadcast_to(onehot, x.shape + (vocab,))

    return fn


@pytest.mark.parametrize("alg", ["origin", "maskgit_plus", "topk_margin", "entropy"])
def test_unmask_recovers_truth_with_oracle(alg):
    rng = np.random.default_rng(0)
    b, t, v = 2, 32, 20
    truth = jnp.asarray(rng.integers(2, v, size=(b, t)), jnp.int32)
    mask = rng.random((b, t)) < 0.6
    x0 = jnp.where(mask, MASK, truth)
    cfg = GenerationConfig(steps=8, alg=alg, temperature=0.0, alg_temp=0.0)
    sampler = dllm.make_unmask_sampler(_logits_fn_oracle(truth, v), cfg, MASK)
    out = sampler(x0, jax.random.PRNGKey(0))
    # oracle should fully unmask to the truth
    assert not bool(jnp.any(out == MASK))
    acc = dllm.generation_accuracy(out, truth, jnp.asarray(mask))
    assert float(acc["acc"]) == 1.0


def test_unmask_progressive():
    """Each step unmasks ~ the scheduled fraction (maskgit)."""
    rng = np.random.default_rng(0)
    b, t, v = 1, 64, 10
    truth = jnp.asarray(rng.integers(2, v, size=(b, t)), jnp.int32)
    x0 = jnp.where(rng.random((b, t)) < 0.9, MASK, truth)
    cfg = GenerationConfig(steps=4, alg="maskgit_plus")
    sampler = dllm.make_unmask_sampler(_logits_fn_oracle(truth, v), cfg, MASK)
    out = sampler(x0, jax.random.PRNGKey(0))
    assert not bool(jnp.any(out == MASK))


def test_binary_auroc_against_known():
    scores = np.asarray([0.1, 0.4, 0.35, 0.8])
    labels = np.asarray([0, 0, 1, 1])
    # sklearn value for this case is 0.75
    assert abs(metrics.binary_auroc(scores, labels) - 0.75) < 1e-9
    # perfect separation
    assert metrics.binary_auroc(np.asarray([0.1, 0.9]), np.asarray([0, 1])) == 1.0


def test_multilabel_auroc_nan_masking():
    scores = np.asarray([[0.9, 0.2], [0.1, 0.8], [0.7, np.nan]])
    labels = np.asarray([[1, 0], [0, np.nan], [1, np.nan]])
    v = metrics.multilabel_auroc(scores[:, :], labels)
    assert np.isfinite(v)


def test_hits_at_k():
    pos = np.asarray([0.9, 0.5, 0.2])
    neg = np.linspace(0, 1, 200)  # k-th highest of 200 negatives
    h = ogb_eval.hits_at_k(pos, neg, k=100)
    # threshold = 100th highest neg = value at index -100 = 0.502...
    thr = np.sort(neg)[-100]
    expected = (pos > thr).mean()
    assert abs(h - expected) < 1e-12


def test_mrr_formula():
    pos = np.asarray([0.9, 0.1])
    neg = np.asarray([[0.5, 0.95, 0.2], [0.5, 0.95, 0.2]])
    # row 0: one neg above -> rank 2; row 1: all above -> rank 4
    got = ogb_eval.mrr(pos, neg)
    assert abs(got - (1 / 2 + 1 / 4) / 2) < 1e-12


def test_reformat_mrr_groups_by_idx():
    # 2 positives with 3 negatives each, interleaved with idx keys
    scores = np.asarray([0.9, 0.1, 0.2, 0.3, 0.8, 0.4, 0.5, 0.6])
    labels = np.asarray([1, 0, 0, 0, 1, 0, 0, 0])
    idx = np.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    d = ogb_eval.reformat_mrr_inputs(scores, labels, idx, num_neg=3)
    assert d["y_pred_pos"].tolist() == [0.9, 0.8]
    assert d["y_pred_neg"].shape == (2, 3)


def test_average_precision():
    # all positives ranked first -> AP = 1
    ap = ogb_eval._average_precision(np.asarray([0.9, 0.8, 0.1]), np.asarray([1, 1, 0]))
    assert ap == 1.0


def test_is_better():
    assert metrics.is_better({"mae": 0.5}, {"mae": 0.6}, "mae")
    assert not metrics.is_better({"mae": 0.7}, {"mae": 0.6}, "mae")
    assert metrics.is_better({"auroc": 0.9}, {"auroc": 0.8}, "auroc")


def test_sample_per_example_adaptive_steps():
    """Per-example loop (reference sample_per_example,
    generation_utils.py:317-436): steps adapt to the example's mask count,
    history traces each step, and the result fully unmasks."""
    from graphgpt_tpu.config import GenerationConfig
    from graphgpt_tpu.generation import dllm

    V, T = 11, 32
    mask_id = 1
    rng = np.random.default_rng(0)
    truth = rng.integers(2, V, size=(T,)).astype(np.int32)
    x = truth.copy()
    mask_pos = rng.random(T) < 0.3
    x[mask_pos] = mask_id

    def logits_fn(x_flat):
        # oracle logits: always vote for the ground truth
        return jax.nn.one_hot(jnp.asarray(truth)[None], V) * 10.0

    cfg = GenerationConfig(steps=64, alg="maskgit_plus", temperature=0.0)
    out, hist = dllm.sample_per_example(
        logits_fn, cfg, mask_id, jnp.asarray(x), jax.random.PRNGKey(0),
        output_history=True,
    )
    n_masked = int(mask_pos.sum())
    assert len(hist) == n_masked  # steps = min(#masked, cfg.steps)
    np.testing.assert_array_equal(np.asarray(out)[0], truth)
    # history is monotone: masked count never increases
    counts = [int(np.sum(np.asarray(h) == mask_id)) for h in hist]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[-1] == 0

    out2, hist2 = dllm.sample_per_example(
        logits_fn, cfg, mask_id, jnp.asarray(x), jax.random.PRNGKey(0)
    )
    assert hist2 is None
    np.testing.assert_array_equal(np.asarray(out2)[0], truth)


def test_is_better_prefixed_keys():
    """Best-epoch tracking resolves the metric FAMILY from prefixed keys
    (valid_mae is lower-better; valid_ema_hits@100 higher-better) — the
    bare-key lookup regressed best-MAE tracking to the first epoch."""
    from graphgpt_tpu.utils import metrics as m

    assert m.is_better({"valid_mae": 0.1}, {"valid_mae": 0.2}, "valid_mae")
    assert not m.is_better({"valid_mae": 0.3}, {"valid_mae": 0.2}, "valid_mae")
    assert m.is_better(
        {"valid_ema_hits@100": 0.8}, {"valid_ema_hits@100": 0.7}, "valid_ema_hits@100"
    )
    assert not m.is_better(
        {"valid_ema_hits@100": 0.6}, {"valid_ema_hits@100": 0.7}, "valid_ema_hits@100"
    )
    assert m.is_better({"valid_loss": 1.0}, {}, "valid_loss")


def test_generation_eval_per_example_mode(tmp_path):
    """generation.batched=false routes the band sweep through
    sample_per_example (reference eval_gen_per_sample); accuracies agree
    in direction with the batched path on a tiny pretrained model."""
    from graphgpt_tpu.config import Config
    from graphgpt_tpu.training.pipeline import PretrainPipeline

    cfg = Config()
    cfg.tokenization.semantics.node.discrete = "node_attr"
    cfg.tokenization.semantics.node.dim = 9
    cfg.tokenization.semantics.edge.discrete = "edge_attr"
    cfg.tokenization.semantics.edge.dim = 3
    cfg.model.hidden_size = 64
    cfg.model.num_hidden_layers = 2
    cfg.model.head_dim = 16
    cfg.model.dtype = "float32"
    cfg.training.task_type = "pretrain-mlm"
    cfg.training.pack_tokens = 1
    cfg.training.batch_size = 8
    cfg.training.max_length = 128
    cfg.training.num_workers = 0
    cfg.training.tot_samples = 200
    cfg.training.schedule.total_num_steps = 4
    cfg.training.schedule.warmup_num_steps = 1
    cfg.training.output_dir = str(tmp_path / "pt")
    cfg.generation.steps = 8
    pipe = PretrainPipeline(cfg).setup()
    pipe.run()
    batched = pipe.evaluate_generation(n_samples=8, n_bands=2)
    pipe.cfg.generation.batched = False
    per_ex = pipe.evaluate_generation(n_samples=8, n_bands=2)
    pipe.loader.close()
    assert set(batched) == set(per_ex)
    for k in per_ex:
        assert 0.0 <= per_ex[k] <= 1.0
