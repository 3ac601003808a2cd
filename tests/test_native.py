"""C++ native kernels vs numpy reference implementations."""

import numpy as np
import pytest

from graphgpt_tpu.native import euler_native

pytestmark = pytest.mark.skipif(
    not euler_native.available(), reason="native toolchain unavailable"
)


def test_native_walk_valid():
    from graphgpt_tpu.data.datasets import SyntheticMolDataset, erdos_renyi_graph

    rng = np.random.default_rng(0)
    ds = SyntheticMolDataset(30, seed=1)
    for i in range(30):
        g = ds[i]
        walk = euler_native.graph_to_walk(g.num_nodes, g.edge_index, rng)
        assert set(walk.tolist()) == set(range(g.num_nodes))
        edges = {
            (min(a, b), max(a, b))
            for a, b in zip(g.edge_index[0].tolist(), g.edge_index[1].tolist())
            if a != b
        }
        wset = {(min(a, b), max(a, b)) for a, b in zip(walk[:-1], walk[1:])}
        assert edges <= wset
        # all steps are real edges (connected graph: no jumps)
        for a, b in zip(walk[:-1], walk[1:]):
            assert (min(a, b), max(a, b)) in edges


def test_native_walk_disconnected():
    from graphgpt_tpu.data.datasets import erdos_renyi_graph

    rng = np.random.default_rng(2)
    g = erdos_renyi_graph(rng, 25, 0.06)
    walk = euler_native.graph_to_walk(g.num_nodes, g.edge_index, rng)
    assert set(walk.tolist()) == set(range(g.num_nodes))


def test_native_single_node():
    rng = np.random.default_rng(0)
    walk = euler_native.graph_to_walk(1, np.zeros((2, 0), np.int64), rng)
    assert walk.tolist() == [0]


def test_native_ego_matches_semantics():
    from graphgpt_tpu.data import sampling
    from graphgpt_tpu.data.datasets import erdos_renyi_graph

    rng = np.random.default_rng(0)
    g = erdos_renyi_graph(rng, 100, 0.08)
    indptr, indices, _ = sampling.build_csr_directed(g.num_nodes, g.edge_index)
    nodes = euler_native.ego_k_hop(indptr, indices, np.asarray([3]), 1, 5, rng)
    assert 3 in nodes
    nbrs = set(indices[indptr[3] : indptr[4]].tolist()) | {3}
    assert set(nodes.tolist()) <= nbrs
    assert len(nodes) <= 6
    # sorted unique
    assert (np.diff(nodes) > 0).all()
