"""Pin our OGB evaluators to official-evaluator semantics.

The `ogb` package cannot be installed here (zero egress), so the oracle is
split the same way the official evaluators are implemented:

  - Hits@K / MRR (ogb.linkproppred.Evaluator `_eval_hits` / `_eval_mrr`):
    pure ranking formulas — pinned to hand-derived fixture values computed
    from the published code (topk-threshold comparison; mid-rank
    0.5*(optimistic+pessimistic)+1 tie handling).
  - AP / AUROC (ogb.graphproppred.Evaluator `_eval_ap` / `_eval_rocauc`):
    the official package defers to sklearn.metrics, which IS installed —
    differential-tested against sklearn directly, including ties and
    NaN-masked multi-task inputs (molpcba).

Reference: src/utils/ogb_utils.py:105-170 wraps these evaluators.
"""

import numpy as np
import pytest

from graphgpt_tpu.utils import ogb_eval


# ---------------------------------------------------------------------------
# Hits@K — official: kth = topk(neg, K)[-1]; hits = mean(pos > kth)
# ---------------------------------------------------------------------------
def test_hits_at_k_fixture():
    neg = np.asarray([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0])
    pos = np.asarray([0.95, 0.75, 0.55, 0.35, 0.15])
    # K=3 -> 3rd highest neg = 0.8; pos > 0.8 -> only 0.95 -> 1/5
    assert ogb_eval.hits_at_k(pos, neg, 3) == pytest.approx(0.2)
    # K=7 -> threshold 0.4 -> {0.95, 0.75, 0.55} -> 3/5
    assert ogb_eval.hits_at_k(pos, neg, 7) == pytest.approx(0.6)
    # strict inequality: pos equal to the threshold does NOT count
    assert ogb_eval.hits_at_k(np.asarray([0.8]), neg, 3) == 0.0
    # fewer negatives than K -> 1.0 by the official convention
    assert ogb_eval.hits_at_k(pos, neg[:2], 3) == 1.0


def test_hits_reformatter():
    scores = np.asarray([0.9, 0.1, 0.8, 0.2])
    labels = np.asarray([1, 0, 1, 0])
    d = ogb_eval.reformat_hits_inputs(scores, labels)
    np.testing.assert_array_equal(d["y_pred_pos"], [0.9, 0.8])
    np.testing.assert_array_equal(d["y_pred_neg"], [0.1, 0.2])


# ---------------------------------------------------------------------------
# MRR — official: rank = 0.5*((neg > pos).sum() + (neg >= pos).sum()) + 1
# ---------------------------------------------------------------------------
def test_mrr_fixture_no_ties():
    # positive 0: beats all 4 negs -> rank 1
    # positive 1: 2 negs above -> rank 3
    pos = np.asarray([0.9, 0.5])
    neg = np.asarray([
        [0.1, 0.2, 0.3, 0.4],
        [0.6, 0.7, 0.1, 0.2],
    ])
    expected = 0.5 * (1.0 / 1.0 + 1.0 / 3.0)
    assert ogb_eval.mrr(pos, neg) == pytest.approx(expected)


def test_mrr_tie_handling_midrank():
    # positive ties with two negatives: optimistic rank 1, pessimistic 3
    # -> official mid-rank (1+3)/2 = 2
    pos = np.asarray([0.5])
    neg = np.asarray([[0.5, 0.5, 0.1, 0.2]])
    assert ogb_eval.mrr(pos, neg) == pytest.approx(1.0 / 2.0)


def test_mrr_reformatter_groups_by_idx():
    # two positives with 3 negatives each, interleaved and shuffled
    idx = np.asarray([1, 0, 1, 0, 1, 1, 0, 0])
    scores = np.asarray([0.5, 0.9, 0.6, 0.1, 0.7, 0.2, 0.2, 0.3])
    labels = np.asarray([1, 1, 0, 0, 0, 0, 0, 0])
    d = ogb_eval.reformat_mrr_inputs(scores, labels, idx, num_neg=3)
    np.testing.assert_array_equal(d["y_pred_pos"], [0.9, 0.5])
    # positive 0 (score .9) with negs {.1,.2,.3} -> rank 1
    # positive 1 (score .5) with negs {.6,.7,.2} -> rank 3
    assert ogb_eval.mrr(d["y_pred_pos"], d["y_pred_neg"]) == pytest.approx(
        0.5 * (1.0 + 1.0 / 3.0)
    )


# ---------------------------------------------------------------------------
# AP (molpcba) — official defers to sklearn.average_precision_score
# ---------------------------------------------------------------------------
def test_ap_matches_sklearn_random():
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(0)
    for trial in range(5):
        scores = rng.normal(size=200)
        labels = (rng.random(200) < 0.3).astype(float)
        ours = ogb_eval._average_precision(scores, labels)
        ref = average_precision_score(labels, scores)
        assert ours == pytest.approx(ref, abs=1e-9), trial


def test_ap_matches_sklearn_with_ties():
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(1)
    scores = rng.integers(0, 5, 300).astype(float)  # heavy ties
    labels = (rng.random(300) < 0.4).astype(float)
    ours = ogb_eval._average_precision(scores, labels)
    ref = average_precision_score(labels, scores)
    assert ours == pytest.approx(ref, abs=1e-9)


def test_molpcba_nan_masking_matches_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(2)
    n, t = 128, 6
    scores = rng.normal(size=(n, t))
    labels = (rng.random((n, t)) < 0.3).astype(float)
    labels[rng.random((n, t)) < 0.2] = np.nan  # molpcba-style missing labels
    labels[:, 3] = 0.0  # single-class task: skipped by the official eval
    res = ogb_eval.evaluate_ogb("ogbg-molpcba", {"y_pred": scores, "y_true": labels})
    aps = []
    for k in range(t):
        valid = ~np.isnan(labels[:, k])
        y = labels[valid, k]
        if valid.sum() == 0 or y.min() == y.max():
            continue
        aps.append(average_precision_score(y, scores[valid, k]))
    assert res["ap"] == pytest.approx(float(np.mean(aps)), abs=1e-9)


# ---------------------------------------------------------------------------
# AUROC (molhiv) — official defers to sklearn.roc_auc_score
# ---------------------------------------------------------------------------
def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score

    from graphgpt_tpu.utils.metrics import binary_auroc

    rng = np.random.default_rng(3)
    for trial in range(5):
        scores = rng.normal(size=150)
        labels = (rng.random(150) < 0.35).astype(float)
        assert binary_auroc(scores, labels) == pytest.approx(
            roc_auc_score(labels, scores), abs=1e-9
        ), trial


def test_auroc_matches_sklearn_with_ties():
    from sklearn.metrics import roc_auc_score

    from graphgpt_tpu.utils.metrics import binary_auroc

    rng = np.random.default_rng(4)
    scores = rng.integers(0, 4, 200).astype(float)
    labels = (rng.random(200) < 0.5).astype(float)
    assert binary_auroc(scores, labels) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-9
    )


# ---------------------------------------------------------------------------
# PCQM4M-v2 MAE
# ---------------------------------------------------------------------------
def test_pcqm_mae():
    res = ogb_eval.evaluate_ogb(
        "pcqm4m-v2", {"y_pred": [1.0, 2.0, 3.0], "y_true": [1.5, 2.0, 2.0]}
    )
    assert res["mae"] == pytest.approx(0.5)
