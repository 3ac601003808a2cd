"""Graph partitioning and node-level subgraph datasets.

Replaces the reference's METIS-backed datasets (MetisPartitionSeqMapDataset,
RandomEdgesMapDataset, RandomNodesMapDataset, EnsembleNodesEdgesMapDataset;
src/data/dataset_map.py:33-129, 803-1169) without a METIS binding:

  - `bfs_partition`: edge-balanced multi-seed BFS growth — each part grows
    greedily from a random seed until its edge budget is met (the
    edge-balanced node-weight variant the reference feeds METIS,
    EdgeBalancedClusterData, src/utils/dataset_utils.py:1198-1282);
  - per-epoch re-partitioning with a varying part count (the reference
    draws a new ClusterData each epoch);
  - random-edge / random-node induced-subgraph datasets;
  - a dispatching ensemble over several sub-datasets.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .graph import Graph
from .sampling import build_csr_directed, induced_subgraph


def bfs_partition(
    big: Graph, num_parts: int, rng: np.random.Generator
) -> List[np.ndarray]:
    """Edge-balanced BFS-grown partition: list of node-id arrays."""
    n = big.num_nodes
    indptr, indices, _ = build_csr_directed(n, big.edge_index)
    deg = np.diff(indptr)
    target_edges = max(int(deg.sum() / num_parts), 1)
    assign = np.full(n, -1, np.int64)
    order = rng.permutation(n)
    parts: List[List[int]] = []
    oi = 0
    for pid in range(num_parts):
        # find an unassigned seed
        while oi < n and assign[order[oi]] != -1:
            oi += 1
        if oi >= n:
            break
        seed = int(order[oi])
        frontier = [seed]
        assign[seed] = pid
        members = [seed]
        edge_load = int(deg[seed])
        while frontier and edge_load < target_edges:
            nxt = []
            for node in frontier:
                for nb in indices[indptr[node] : indptr[node + 1]]:
                    nb = int(nb)
                    if assign[nb] == -1:
                        assign[nb] = pid
                        members.append(nb)
                        edge_load += int(deg[nb])
                        nxt.append(nb)
                        if edge_load >= target_edges:
                            break
                if edge_load >= target_edges:
                    break
            frontier = nxt
        parts.append(members)
    # spread leftovers into the smallest parts
    leftovers = np.flatnonzero(assign == -1)
    if len(leftovers) and parts:
        sizes = [len(p) for p in parts]
        for node in leftovers:
            k = int(np.argmin(sizes))
            parts[k].append(int(node))
            sizes[k] += 1
            assign[node] = k
    return [np.asarray(sorted(p), np.int64) for p in parts if p]


def _slice_subgraph(big: Graph, nodes: np.ndarray, idx: int) -> Graph:
    sub_ei, eids = induced_subgraph(big, nodes)
    return Graph(
        num_nodes=len(nodes),
        edge_index=sub_ei,
        node_attr=None if big.node_attr is None else big.node_attr[nodes],
        edge_attr=None if big.edge_attr is None else big.edge_attr[eids],
        y=None
        if big.y is None
        else np.asarray(big.y).reshape(big.num_nodes, -1)[nodes],
        idx=idx,
        extra={"orig_nodes": nodes},
    )


class PartitionDataset:
    """Per-epoch re-partitioned subgraph batches (MetisPartitionSeqMapDataset
    semantics: fresh ClusterData with varying part count each epoch,
    dataset_map.py:33-129)."""

    def __init__(
        self,
        big: Graph,
        num_parts: int,
        part_jitter: float = 0.2,
        seed: int = 0,
    ):
        self.big = big
        self.num_parts = num_parts
        self.part_jitter = part_jitter
        self.seed = seed
        self.reset_samples(0)

    def reset_samples(self, epoch: int, seed: Optional[int] = None):
        rng = np.random.default_rng((self.seed, epoch))
        jitter = int(self.num_parts * self.part_jitter)
        parts = self.num_parts + int(rng.integers(-jitter, jitter + 1)) if jitter else self.num_parts
        self.parts = bfs_partition(self.big, max(parts, 1), rng)

    def __len__(self):
        return len(self.parts)

    def __getitem__(self, i: int) -> Graph:
        return _slice_subgraph(self.big, self.parts[i], i)


class RandomNodesDataset:
    """Random node subsets -> induced subgraphs (RandomNodesMapDataset,
    dataset_map.py:990-1089)."""

    def __init__(self, big: Graph, nodes_per_sample: int, num_samples: int, seed: int = 0):
        self.big = big
        self.nodes_per_sample = nodes_per_sample
        self.num_samples = num_samples
        self.seed = seed
        self.epoch = 0

    def reset_samples(self, epoch: int, seed: Optional[int] = None):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i: int) -> Graph:
        rng = np.random.default_rng((self.seed, self.epoch, i))
        nodes = np.sort(
            rng.choice(self.big.num_nodes, size=min(self.nodes_per_sample, self.big.num_nodes), replace=False)
        )
        return _slice_subgraph(self.big, nodes, i)


class RandomEdgesDataset:
    """Random edge subsets -> node-induced subgraphs (RandomEdgesMapDataset,
    dataset_map.py:803-987)."""

    def __init__(self, big: Graph, edges_per_sample: int, num_samples: int, seed: int = 0):
        self.big = big
        self.edges_per_sample = edges_per_sample
        self.num_samples = num_samples
        self.seed = seed
        self.epoch = 0

    def reset_samples(self, epoch: int, seed: Optional[int] = None):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i: int) -> Graph:
        rng = np.random.default_rng((self.seed, self.epoch, i))
        e = self.big.num_edges
        eids = rng.choice(e, size=min(self.edges_per_sample, e), replace=False)
        nodes = np.unique(self.big.edge_index[:, eids])
        return _slice_subgraph(self.big, nodes.astype(np.int64), i)


class EnsembleDataset:
    """Concatenated dispatch over sub-datasets (EnsembleNodesEdgesMapDataset
    dataset_map.py:1092-1169 / EnsembleGraphsMapDataset:1448-1479)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self._ptr = np.cumsum([0] + [len(d) for d in self.datasets])

    def reset_samples(self, epoch: int, seed: Optional[int] = None):
        for d in self.datasets:
            if hasattr(d, "reset_samples"):
                d.reset_samples(epoch, seed)
        self._ptr = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._ptr[-1])

    def __getitem__(self, i: int) -> Graph:
        k = int(np.searchsorted(self._ptr, i, side="right") - 1)
        g = self.datasets[k][i - int(self._ptr[k])]
        g.extra["idx_of_ds"] = np.asarray(k)
        return g
