"""Eulerian walk machinery: differential tests against a networkx oracle."""

import networkx as nx
import numpy as np
import pytest

from graphgpt_tpu.data import euler
from graphgpt_tpu.data.datasets import erdos_renyi_graph, random_molecule_graph
from graphgpt_tpu.data.graph import CSR, Graph, connected_components


def _walk_edge_set(walk):
    return {
        (min(a, b), max(a, b)) for a, b in zip(walk[:-1], walk[1:])
    }


def _graph_edge_set(g: Graph):
    return {
        (min(a, b), max(a, b))
        for a, b in zip(g.edge_index[0].tolist(), g.edge_index[1].tolist())
        if a != b
    }


@pytest.mark.parametrize("seed", range(20))
def test_walk_covers_all_edges_connected(seed):
    rng = np.random.default_rng(seed)
    g = random_molecule_graph(rng)
    walk = euler.graph_to_walk(g, rng)
    # every node appears
    assert set(walk.tolist()) == set(range(g.num_nodes))
    # every undirected edge of the simple graph is traversed
    assert _graph_edge_set(g) <= _walk_edge_set(walk.tolist())


@pytest.mark.parametrize("seed", range(10))
def test_walk_steps_are_edges_or_eulerized_dups(seed):
    """Each walk step is a real edge (eulerization only duplicates existing
    edges within a component; jumps occur only at component boundaries)."""
    rng = np.random.default_rng(seed)
    g = random_molecule_graph(rng)  # connected by construction
    walk = euler.graph_to_walk(g, rng)
    edges = _graph_edge_set(g)
    for a, b in zip(walk[:-1], walk[1:]):
        assert (min(a, b), max(a, b)) in edges


@pytest.mark.parametrize("seed", range(10))
def test_disconnected_components_joined_by_jumps(seed):
    rng = np.random.default_rng(seed)
    g = erdos_renyi_graph(rng, 20, 0.08)  # likely disconnected
    walk = euler.graph_to_walk(g, rng)
    assert set(walk.tolist()) == set(range(g.num_nodes))
    edges = _graph_edge_set(g)
    # non-edge steps must be jumps between different components
    csr = CSR(g.num_nodes, g.edge_index)
    labels = connected_components(csr)
    for a, b in zip(walk[:-1], walk[1:]):
        if (min(a, b), max(a, b)) not in edges:
            assert labels[a] != labels[b], "jump edge within one component"
    # all edges covered
    assert edges <= _walk_edge_set(walk.tolist())


def test_single_node_graph():
    g = Graph(num_nodes=1, edge_index=np.zeros((2, 0), np.int32))
    walk = euler.graph_to_walk(g, np.random.default_rng(0))
    assert walk.tolist() == [0]


def test_walk_length_matches_networkx_distribution():
    """Eulerized walk length should match nx.eulerize + euler circuit length
    (same number of duplicated edges) on connected graphs."""
    for seed in range(15):
        rng = np.random.default_rng(seed)
        g = random_molecule_graph(rng, min_nodes=5, max_nodes=20)
        G = nx.Graph()
        G.add_nodes_from(range(g.num_nodes))
        G.add_edges_from(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
        nxG = nx.eulerize(G.copy()) if not nx.is_eulerian(G) else G
        nx_tour_len = nxG.number_of_edges()  # full circuit length
        walk = euler.graph_to_walk(g, rng)
        n_steps = len(walk) - 1
        # the shortened walk covers every unique edge, and with exact
        # min-weight odd-node matching it never duplicates more edges than
        # networkx's eulerize (nx matching can even be non-optimal)
        assert G.number_of_edges() <= n_steps <= nx_tour_len


def test_node_ranks_first_appearance():
    walk = np.asarray([7, 3, 7, 5, 3])
    ranks = euler.walk_node_ranks(walk, scope=512, mapping_type=0, rng=np.random.default_rng(0))
    assert ranks.tolist() == [0, 1, 0, 2, 1]


def test_node_ranks_cyclic_offset():
    walk = np.asarray([4, 2, 9])
    rng = np.random.default_rng(3)
    ranks = euler.walk_node_ranks(walk, scope=10, mapping_type=1, rng=rng)
    start = ranks[0]
    assert ranks.tolist() == [start, (start + 1) % 10, (start + 2) % 10]


def test_node_ranks_random_is_permutation():
    walk = np.arange(8)
    ranks = euler.walk_node_ranks(walk, scope=512, mapping_type=2, rng=np.random.default_rng(0))
    assert len(set(ranks.tolist())) == 8


def test_edge_types():
    # directed edges: 0->1 (out), 2->1 backward only would be in for (1,2)
    g = Graph(
        num_nodes=3,
        edge_index=np.asarray([[0, 2], [1, 1]], np.int32),
    )
    walk = np.asarray([0, 1, 2])
    types = euler.walk_edge_types(g, walk)
    assert types[0] == euler.EDGE_OUT  # 0->1 exists, 1->0 doesn't
    assert types[1] == euler.EDGE_IN  # 1->2 missing, 2->1 exists


def test_rebase_index_tokens():
    assert euler.rebase_index_tokens(5, 256) == ("5",)
    assert euler.rebase_index_tokens(300, 256) == ("1*256", "44")
    assert euler.rebase_index_tokens(7, 0) == ("7",)
