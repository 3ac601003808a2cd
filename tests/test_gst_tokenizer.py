"""Flat GSTTokenizer: structure tokens, attr masks, labels, positions."""

import numpy as np
import pytest

from graphgpt_tpu.config import TokenizationConfig
from graphgpt_tpu.data import vocab as V
from graphgpt_tpu.data.datasets import MOL_EDGE_CARD, MOL_NODE_CARD, SyntheticMolDataset
from graphgpt_tpu.data.gst_tokenizer import GSTTokenizer, occurrence_mask
from graphgpt_tpu.data.vocab import LABEL_PAD_ID


def make(cyclic=1, scope=512, base=512, task="pretrain", attr_assignment="first"):
    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 9
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 3
    cfg.semantics.attr_assignment = attr_assignment
    cfg.structure.node.node_scope = scope
    cfg.structure.node.scope_base = base
    cfg.structure.node.cyclic = cyclic
    vocab = V.build_vocab(
        cfg, [np.arange(c) for c in MOL_NODE_CARD], [np.arange(c) for c in MOL_EDGE_CARD]
    )
    vm = V.vocab_map_from_list(vocab)
    from graphgpt_tpu.config import MlmScheduleConfig

    return GSTTokenizer(cfg, vm, task_type=task, mlm_cfg=MlmScheduleConfig()), vm


def test_occurrence_mask_first():
    keys = ["a", "b", "a", "c", "b"]
    m = occurrence_mask(keys, "first", np.random.default_rng(0))
    assert m.tolist() == [1, 1, 0, 1, 0]
    m = occurrence_mask(keys, "last", np.random.default_rng(0))
    assert m.tolist() == [0, 0, 1, 1, 1]
    m = occurrence_mask(keys, "all", np.random.default_rng(0))
    assert m.tolist() == [1, 1, 1, 1, 1]


def test_flat_pretrain_sample():
    tok, vm = make()
    ds = SyntheticMolDataset(4, seed=0)
    s = tok(ds[0], np.random.default_rng(0))
    assert s.input_ids.ndim == 1
    assert s.labels.shape == s.input_ids.shape
    # labels are inputs shifted by one, ending in eos
    np.testing.assert_array_equal(s.labels[:-1], s.input_ids[1:])
    assert s.labels[-1] == tok.eos_id
    # v3 cumsum positions: nondecreasing, start 0
    assert s.position_ids[0] == 0
    assert (np.diff(s.position_ids) >= 0).all()


def test_first_assignment_attrs_once_per_node():
    tok, vm = make(attr_assignment="first")
    ds = SyntheticMolDataset(4, seed=1)
    g = ds[0]
    s = tok(g, np.random.default_rng(0))
    # each node contributes exactly 9 node-attr tokens (first occurrence)
    attr_id_set = set()
    for ids in tok.node_lookup._ids:
        attr_id_set.update(np.asarray(ids).tolist())
    n_attr_tokens = sum(1 for t in s.input_ids.tolist() if t in attr_id_set)
    assert n_attr_tokens == g.num_nodes * 9


def test_two_level_node_ids():
    tok, vm = make(scope=512, base=16)
    ds = SyntheticMolDataset(4, seed=2, min_nodes=20, max_nodes=30)
    s = tok(ds[0], np.random.default_rng(0))
    # some structural index >= 16 must emit a high-level "k*16" token
    high_ids = set(tok.high_ids[1:].tolist())
    assert high_ids & set(s.input_ids.tolist())


def test_random_mapping_new_token_labels():
    tok, vm = make(cyclic=2)
    ds = SyntheticMolDataset(4, seed=3)
    s = tok(ds[0], np.random.default_rng(0))
    assert vm["<new>"] in s.labels.tolist()


def test_flat_mlm_task():
    tok, vm = make(task="pretrain-mlm")
    ds = SyntheticMolDataset(4, seed=4)
    s = tok(ds[0], np.random.default_rng(0))
    sel = s.labels != LABEL_PAD_ID
    assert sel.sum() > 0
    assert (s.input_ids[sel] == tok.mask_id).all()


def test_graph_task_appends_eos_gsum():
    tok, vm = make(task="graph")
    ds = SyntheticMolDataset(4, seed=5)
    s = tok(ds[0], np.random.default_rng(0))
    assert s.input_ids[-2] == tok.eos_id
    assert s.input_ids[-1] == tok.gsum_id
    assert s.graph_labels is not None


def test_node_task_appends_target():
    tok, vm = make(task="node")
    ds = SyntheticMolDataset(4, seed=6)
    g = ds[0]
    g.root_n_id = np.asarray([1])
    g.y = np.zeros((g.num_nodes, 1), np.int64)
    g.y[1] = 2
    s = tok(g, np.random.default_rng(0))
    assert s.node_labels.tolist() == [2.0]
    assert s.input_ids[-2] == tok.eos_id
    assert int(s.input_ids[-1]) in set(tok.low_ids.tolist())


def test_structure_and_instruct_streams():
    tok, vm = make()
    tok.cfg.structure.nx_funcs = (
        "degree",
        "triangles",
        "shortest_path",
        "shortest_path_length",
    )
    tok.cfg.semantics.instruct_funcs = ("homo_lumo",)
    ds = SyntheticMolDataset(4, seed=0)
    s = tok(ds[0], np.random.default_rng(0))
    toks = s.input_ids.tolist()
    for t in ("structure_0", "structure_1", "structure_2", "structure_3", "semantics_0"):
        assert vm[t] in toks, t
    assert len(s.labels) == len(s.input_ids)
    # the task marker positions carry label padding (prefix skipped)
    i = toks.index(vm["structure_0"])
    assert s.labels[i] == LABEL_PAD_ID


def test_continuous_node_attrs():
    """ogbn-proteins-style continuous attrs become identifier+digit tokens."""
    cfg = TokenizationConfig()
    cfg.attr_world_identifier = "prot"
    cfg.semantics.node.continuous = "node_cont"
    cfg.semantics.node.dim = 2
    cfg.semantics.node.discrete = None
    cfg.semantics.edge.discrete = None
    cfg.semantics.edge.dim = 0
    from graphgpt_tpu.data import vocab as V

    vocab = V.build_vocab(cfg)
    vm = V.vocab_map_from_list(vocab)
    tok = GSTTokenizer(cfg, vm, task_type="pretrain")
    from graphgpt_tpu.data.graph import Graph

    g = Graph(
        num_nodes=3,
        edge_index=np.asarray([[0, 1, 1, 2], [1, 0, 2, 1]], np.int32),
    )
    g.extra["node_cont"] = np.asarray([[500, 0.38], [120, 7], [9, 0.5]], object)
    s = tok(g, np.random.default_rng(0))
    toks = s.input_ids.tolist()
    assert vm["prot#node#0#1"] in toks  # identifier
    assert vm["<5>"] in toks and vm["<.>"] in toks


def test_flat_cl_task_appends_gsum():
    """pretrain-cl = flat SMTP masking + trailing <gsum> with padded label
    (reference _add_gsum_tokens_for_cl, tokenizer_utils.py:366-387)."""
    tok, vm = make(task="pretrain-cl")
    ds = SyntheticMolDataset(4, seed=7)
    s = tok(ds[0], np.random.default_rng(0))
    assert s.input_ids[-1] == tok.gsum_id
    assert s.labels[-1] == LABEL_PAD_ID
    sel = s.labels != LABEL_PAD_ID
    assert sel.sum() > 0
    assert (s.input_ids[sel] == tok.mask_id).all()


def test_flat_edge_task_appends_src_dst():
    """edge task extends the flat stream with the two seed nodes' idx tokens
    (reference prepare_inputs_for_edge_lvl_task flat path)."""
    tok, vm = make(task="edge")
    ds = SyntheticMolDataset(4, seed=8)
    g = ds[0]
    g.root_n_id = np.asarray([0, 1])
    g.y = np.asarray([1.0])
    s = tok(g, np.random.default_rng(0))
    assert s.edge_labels.tolist() == [1.0]
    low = set(tok.low_ids.tolist())
    # eos separator followed by two structural idx tokens
    tail = s.input_ids[-3:].tolist()
    assert tail[0] == tok.eos_id
    assert set(tail[1:]) <= low
    # the appended pair is exactly the roots' idx tokens (replay the walk
    # with an identically-seeded rng to recover the expected mapping), and
    # the src/dst order is shuffled across seeds
    flips = set()
    for seed in range(8):
        s2 = tok(g, np.random.default_rng(seed))
        _, walk, _, ranks = tok.tokenize_ids(g, np.random.default_rng(seed))
        exp = [
            tok._idx_tokens(ranks[int(np.flatnonzero(walk == r)[0])])[-1]
            for r in (0, 1)
        ]
        got = s2.input_ids[-2:].tolist()
        assert sorted(got) == sorted(exp)
        flips.add(got == exp)
    assert flips == {True, False}  # both orders occur


def test_flat_nodev2_labels_once_per_node():
    tok, vm = make(task="nodev2")
    ds = SyntheticMolDataset(4, seed=9)
    g = ds[0]
    g.y = np.arange(g.num_nodes, dtype=np.int64).reshape(-1, 1) % 3
    s = tok(g, np.random.default_rng(0))
    lab = s.extras["nodev2_labels"]
    raw = s.extras["raw_node_idx"]
    sel = lab != LABEL_PAD_ID
    # every node supervised exactly once, on one of its idx-token positions
    assert sel.sum() == g.num_nodes
    assert sorted(raw[sel].tolist()) == list(range(g.num_nodes))
    low = set(tok.low_ids.tolist()) | set(tok.high_ids.tolist())
    assert set(s.input_ids[sel].tolist()) <= low
    for p, node in zip(np.flatnonzero(sel), raw[sel]):
        assert lab[p] == g.y[node, 0]


def test_flat_nodev2_intra_cls_tokens():
    cfg_tok, vm = make(task="nodev2")
    from graphgpt_tpu.data.gst_tokenizer import GSTTokenizer

    tok = GSTTokenizer(cfg_tok.cfg, vm, task_type="nodev2", num_intra_cls=3)
    ds = SyntheticMolDataset(4, seed=10)
    g = ds[0]
    g.y = np.zeros((g.num_nodes, 1), np.int64)
    s = tok(g, np.random.default_rng(0))
    assert s.extras["cls_idx"].tolist() == [len(s.input_ids) - 3]
    assert set(s.input_ids[-3:].tolist()) == set(tok.intra_cls_token_ids)
    assert len(s.extras["nodev2_labels"]) == len(s.input_ids)


def test_flat_pretrain_euler_gating():
    """Supervision opens after two consecutive padded labels and closes at
    eos (reference tokenizer_utils.py:478-500)."""
    tok, vm = make(task="pretrain-euler")
    # direct unit check of the gate
    E, P = tok.eos_id, LABEL_PAD_ID
    labels = [5, 6, P, P, 7, 8, E, 9, 10]
    out = tok.euler_gate_labels(labels)
    #               idx: 0  1  2  3  4  5  6  7  8
    # flag turns on at i=4 (labels[2]==labels[3]==P), off at i=7 (labels[6]==E)
    assert out == [P, P, P, P, 7, 8, E, P, P]
    # end-to-end: the deployment recipe pads <eos> labels, so the main
    # stream's trailing eos-label plus the instruction prompt's skipped
    # label form the double-<label_pad> marker and only the instruction
    # answer digits are supervised
    tok.cfg.label_tokens_to_pad = (tok.cfg.structure.node.eos_token,)
    tok.cfg.semantics.instruct_funcs = ("homo_lumo",)
    tok2 = GSTTokenizer(tok.cfg, vm, task_type="pretrain-euler")
    ds = SyntheticMolDataset(4, seed=11)
    s = tok2(ds[0], np.random.default_rng(0))
    sup = s.labels != LABEL_PAD_ID
    assert sup.sum() > 0
    # every supervised label is an instruction digit; nothing in the euler
    # prefix is supervised
    digit_ids = set(tok2.digit_ids.values())
    assert set(s.labels[sup].tolist()) <= digit_ids
    # the prefix (everything before the first pad) carries no supervision
    first_pad = int(np.flatnonzero(s.labels == LABEL_PAD_ID)[0])
    assert np.flatnonzero(sup)[0] > first_pad


def _with_a2d(g, rng):
    """Attach OneID a2d pairs + key_type to a synthetic molecule."""
    pairs = np.stack(
        [rng.choice(g.num_nodes, 2, replace=False) for _ in range(2)]
    ).astype(np.int64)
    g.extra["a2d"] = pairs
    g.extra["key_type"] = np.int64(1)
    return g


def test_a2d_instruction_stream_flat():
    """OneID a2d generator (reference _obtain_acc2device,
    instruct_tuning_utils.py:102-118): key_type reserved token + the
    walk-re-indexed structure tokens of each (account, device) pair."""
    tok, vm = make()
    tok.cfg.semantics.instruct_funcs = ("a2d",)
    rng = np.random.default_rng(0)
    ds = SyntheticMolDataset(4, seed=0)
    g = _with_a2d(ds[0], rng)
    s = tok(g, np.random.default_rng(0))
    toks = s.input_ids.tolist()
    i = toks.index(vm["semantics_1"])  # key_type=1 selects reserved token 1
    # 4 node tokens follow the instruction marker
    tail = toks[i + 1 : i + 5]
    assert len(tail) == 4
    low = set(tok.low_ids.tolist())
    assert all(t in low for t in tail)
    # NTP labels: marker skipped, node tokens supervised
    assert s.labels[i] == LABEL_PAD_ID
    assert s.labels[i + 1] == toks[i + 2]


def test_a2d_instruction_rows_stacked():
    """Stacked a2d-stack rows (reference _obtain_stacked_acc2device,
    instruct_tuning_utils.py:121-151): header row of the reserved token,
    then one full stacked row per a2d node after the eos row."""
    from graphgpt_tpu.config import TokenizationConfig
    from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer

    cfg = TokenizationConfig()
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 9
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 3
    cfg.semantics.instruct_funcs = ("a2d",)
    vocab = V.build_vocab(
        cfg, [np.arange(c) for c in MOL_NODE_CARD], [np.arange(c) for c in MOL_EDGE_CARD]
    )
    vm = V.vocab_map_from_list(vocab)
    stok = StackedGSTTokenizer(cfg, vm, task_type="pretrain")
    rng = np.random.default_rng(0)
    ds = SyntheticMolDataset(4, seed=0)
    g = _with_a2d(ds[0], rng)
    s = stok(g, np.random.default_rng(0))
    ids = s.input_ids
    assert ids.ndim == 2
    # find the header row (reserved token in every slot)
    hdr = np.flatnonzero((ids == vm["semantics_1"]).all(axis=1))
    assert len(hdr) == 1
    r = int(hdr[0])
    # eos row directly precedes the instruction block; 4 node rows follow
    assert (ids[r - 1] == stok.eos_id).all()
    assert ids.shape[0] == r + 5
    flat = g.extra["a2d"].reshape(-1)
    expect_attr = stok.node_lookup(g.node_attr[flat])
    np.testing.assert_array_equal(ids[r + 1 :, 1:10], expect_attr)


def test_permute_remaps_a2d():
    ds = SyntheticMolDataset(4, seed=0)
    rng = np.random.default_rng(0)
    g = _with_a2d(ds[0], rng)
    attrs_before = g.node_attr[g.extra["a2d"].reshape(-1)]
    g2 = g.permute_nodes(np.random.default_rng(7))
    attrs_after = g2.node_attr[g2.extra["a2d"].reshape(-1)]
    # relabelled ids still point at the same underlying nodes
    np.testing.assert_array_equal(attrs_before, attrs_after)
