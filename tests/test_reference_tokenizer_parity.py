"""Golden parity of our StackedGST tokenizer against the reference tokenizer.

The reference tokenizer stack (src/data/tokenizer.py + src/utils/nx_utils.py)
is executed directly via tests/ref_oracle.py as a behavioural oracle:

  1. fixed walk  -> bit-identical stacked id rows + NTP labels,
  2. random walks -> identical walk-length support and matching first-token /
     edge-attr-token statistics (the eulerize/Hierholzer distribution),
  3. edge-task target rows match the reference's src/dst row injection.

Both sides consume the reference's shipped pcqm4m-v2 vocab byte-for-byte.
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_oracle

pytestmark = pytest.mark.skipif(
    not ref_oracle.available(), reason="reference sources not mounted"
)

REF_VOCAB = "/root/reference/data/OGB/pcqm4m-v2/vocab"

from graphgpt_tpu.config import TokenizationConfig
from graphgpt_tpu.data import euler
from graphgpt_tpu.data.graph import Graph
from graphgpt_tpu.data.tokenizer import StackedGSTTokenizer
from graphgpt_tpu.data.vocab import load_vocab


def _our_cfg(cyclic: int = 0) -> TokenizationConfig:
    cfg = TokenizationConfig()
    cfg.attr_world_identifier = "molecule"
    cfg.semantics.node.discrete = "node_attr"
    cfg.semantics.node.dim = 9
    cfg.semantics.edge.discrete = "edge_attr"
    cfg.semantics.edge.dim = 3
    cfg.structure.node.node_scope = 64
    cfg.structure.node.scope_base = 64
    cfg.structure.node.cyclic = cyclic
    return cfg


def _mol_graph(n=6, seed=3):
    """Random connected molecule-like graph with both edge directions."""
    rng = np.random.default_rng(seed)
    edges = set()
    for i in range(1, n):  # random spanning tree
        j = int(rng.integers(0, i))
        edges.add((j, i))
    for _ in range(n // 2):  # extra edges
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    und = sorted(edges)
    ei = np.asarray([[u for u, v in und] + [v for u, v in und],
                     [v for u, v in und] + [u for u, v in und]], np.int64)
    x = np.zeros((n, 9), np.int64)
    x[:, 0] = rng.integers(0, 110, n)
    x[:, 1] = rng.integers(0, 4, n)
    ea = np.zeros((ei.shape[1], 3), np.int64)
    half = len(und)
    ea[:half, 0] = rng.integers(0, 4, half)
    ea[half:, 0] = ea[:half, 0]  # same attr in both directions
    return ei, x, ea


def _both_tokenizers(task="pretrain", cyclic=0):
    o = ref_oracle.load_oracle()
    ref_tok = o.tokenizer.StackedGSTTokenizer(
        ref_oracle.pcqm_tokenizer_config(task, cyclic=cyclic),
        stack_method="short",
        add_eos=True,
    )
    our_tok = StackedGSTTokenizer(_our_cfg(cyclic), load_vocab(REF_VOCAB), task_type=task)
    return o, ref_tok, our_tok


def _to_ref_data(o, ei, x, ea):
    import torch

    return o.Data(
        x=torch.tensor(x), edge_index=torch.tensor(ei), edge_attr=torch.tensor(ea)
    )


def _to_our_graph(ei, x, ea, **kw):
    return Graph(
        num_nodes=x.shape[0],
        edge_index=ei.astype(np.int32),
        node_attr=x.astype(np.int64),
        edge_attr=ea.astype(np.int64),
        **kw,
    )


def test_fixed_walk_rows_identical(monkeypatch):
    """Same Euler path => bit-identical stacked rows and NTP labels
    (reference stack_node_edge_graph_attr_to_node, tokenizer.py:1196-1266)."""
    o, ref_tok, our_tok = _both_tokenizers("pretrain")
    for seed in range(5):
        ei, x, ea = _mol_graph(n=5 + seed, seed=seed)
        g_ref = _to_ref_data(o, ei, x, ea)
        g_our = _to_our_graph(ei, x, ea)

        # one genuine reference walk, then frozen on both sides
        random.seed(100 + seed)
        path = o.nx_utils.graph2path_v2(g_ref)
        walk = np.asarray([path[0][0]] + [v for _, v in path], np.int64)

        monkeypatch.setattr(o.tokenizer, "graph2path", lambda g, prioritize=False: path)
        monkeypatch.setattr(euler, "graph_to_walk", lambda g, rng: walk)

        res = ref_tok.tokenize(g_ref)
        ref_in = ref_tok.convert_tokens_to_ids(res.ls_tokens, res.ls_labels)
        ref_ids = np.asarray(ref_in["input_ids"], np.int32)
        ref_labels = np.asarray(ref_in["labels"], np.int32)

        rng = np.random.default_rng(0)
        our_ids, _, _ = our_tok.tokenize(g_our, rng)
        np.testing.assert_array_equal(our_ids, ref_ids)

        sample = our_tok(g_our, np.random.default_rng(0))
        np.testing.assert_array_equal(sample.input_ids, ref_ids)
        np.testing.assert_array_equal(sample.labels, ref_labels)


def test_edge_task_rows_identical(monkeypatch):
    """Edge-task src/dst row injection matches the reference
    (prepare_inputs_for_edge_lvl_task, tokenizer_utils.py:570-633)."""
    import torch

    o, ref_tok, our_tok = _both_tokenizers("edge")
    ei, x, ea = _mol_graph(n=6, seed=11)
    g_ref = _to_ref_data(o, ei, x, ea)
    g_ref.root_n_id = torch.tensor([int(ei[0, 0]), int(ei[1, 0])])
    g_ref.y = torch.tensor([1.0])
    g_our = _to_our_graph(
        ei, x, ea, root_n_id=np.asarray([ei[0, 0], ei[1, 0]]), y=np.asarray([1.0])
    )

    random.seed(7)
    path = o.nx_utils.graph2path_v2(g_ref)
    walk = np.asarray([path[0][0]] + [v for _, v in path], np.int64)
    monkeypatch.setattr(o.tokenizer, "graph2path", lambda g, prioritize=False: path)
    monkeypatch.setattr(euler, "graph_to_walk", lambda g, rng: walk)

    res = ref_tok.tokenize(g_ref)
    in_dict = ref_tok.convert_tokens_to_ids(res.ls_tokens, res.ls_labels)
    random.seed(1234)
    in_dict = ref_tok.prepare_inputs_for_task(in_dict, g_ref, token_res=res)
    ref_ids = np.asarray(in_dict["input_ids"], np.int32)

    # collect both src/dst orders from our side (the shuffle is a coin flip)
    seen = set()
    for s in range(20):
        sample = our_tok(g_our, np.random.default_rng(s))
        seen.add(sample.input_ids.tobytes())
        assert sample.input_ids.shape == ref_ids.shape
    assert ref_ids.tobytes() in seen


def test_walk_distribution_matches():
    """Random-walk statistics match the reference's graph2path_v2
    distribution: identical walk-length support and close length/start-node
    frequencies (nx_utils.py:388-435)."""
    o = ref_oracle.load_oracle()
    ei, x, ea = _mol_graph(n=7, seed=21)
    g_ref = _to_ref_data(o, ei, x, ea)
    g_our = _to_our_graph(ei, x, ea)

    n_trials = 300
    random.seed(5)
    ref_lens, ref_starts = [], []
    for _ in range(n_trials):
        path = o.nx_utils.graph2path_v2(g_ref)
        ref_lens.append(len(path) + 1)
        ref_starts.append(path[0][0])
    rng = np.random.default_rng(5)
    our_lens, our_starts = [], []
    for _ in range(n_trials):
        walk = euler.graph_to_walk(g_our, rng)
        our_lens.append(len(walk))
        our_starts.append(int(walk[0]))

    assert set(our_lens) == set(ref_lens)
    assert abs(np.mean(our_lens) - np.mean(ref_lens)) < 0.5
    # every node can start the walk on both sides
    assert set(our_starts) == set(ref_starts) == set(range(7))


def test_cyclic_reindex_distribution():
    """Cyclic re-indexing (mapping_type=1) matches the reference: ranks are
    (appearance_order + start) % scope with uniform random start
    (get_structure_raw_node2idx_mapping, nx_utils.py:234-260)."""
    o = ref_oracle.load_oracle()
    path = [(0, 1), (1, 2), (2, 0), (0, 3)]
    walk = np.asarray([0, 1, 2, 0, 3])
    scope = 64
    random.seed(9)
    ref_first = set()
    for _ in range(200):
        m = o.nx_utils.get_structure_raw_node2idx_mapping(path, scope, scope, 1)
        toks = [m[n] for n in (0, 1, 2, 3)]
        assert all(len(t) == 1 for t in toks)
        vals = [int(t[0]) for t in toks]
        # consecutive mod-scope ranks in appearance order
        assert [(v - vals[0]) % scope for v in vals] == [0, 1, 2, 3]
        ref_first.add(vals[0])
    rng = np.random.default_rng(9)
    our_first = set()
    for _ in range(200):
        ranks = euler.walk_node_ranks(walk, scope, 1, rng)
        assert [(r - ranks[0]) % scope for r in ranks] == [0, 1, 2, 0, 3]
        our_first.add(int(ranks[0]))
    # both starts cover most of [0, scope)
    assert len(ref_first) > 40 and len(our_first) > 40
