"""Streaming / iterable graph datasets.

Replaces the reference's ODPS table readers (src/data/dataset_iterable.py:
192-448, Alibaba-internal) with sharded-npz file streaming: a directory of
shard files, each holding the columnar graph arrays of the npz contract
(readers.NpzGraphStore layout). Workers and hosts slice the shard list; a
mid-epoch resume skips the first `skip_samples` rows of a worker's slice
(the reference's skipped-samples resume, loader_utils.py:504-553).

Also carries the infinite Erdős–Rényi generator
(GraphsIterableDataset, dataset_iterable.py:134-189).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Optional

import numpy as np

from .datasets import erdos_renyi_graph
from .graph import Graph


class ShardedNpzStream:
    """Iterates graphs from `<dir>/*.npz` shards, sliced per (host, worker)."""

    def __init__(
        self,
        directory: str,
        rank: int = 0,
        world: int = 1,
        shuffle_shards: bool = True,
        seed: int = 0,
    ):
        self.files = sorted(glob.glob(os.path.join(directory, "*.npz")))
        if not self.files:
            raise FileNotFoundError(f"no npz shards under {directory}")
        self.rank = rank
        self.world = world
        self.shuffle_shards = shuffle_shards
        self.seed = seed

    def __iter__(self) -> Iterator[Graph]:
        return self.iter_epoch(0)

    def iter_epoch(self, epoch: int, skip_samples: int = 0) -> Iterator[Graph]:
        files = list(self.files)
        if self.shuffle_shards:
            rng = np.random.default_rng((self.seed, epoch))
            rng.shuffle(files)
        files = files[self.rank :: self.world]
        seen = 0
        for fn in files:
            from ..readers import NpzGraphStore

            store = NpzGraphStore(fn)
            for i in range(len(store)):
                if seen < skip_samples:
                    seen += 1
                    continue
                g = store.get(i)
                g.idx = seen
                seen += 1
                yield g


class ErdosRenyiStream:
    """Infinite random-graph stream (reference GraphsIterableDataset)."""

    def __init__(
        self,
        min_nodes: int = 8,
        max_nodes: int = 32,
        p_range=(0.1, 0.4),
        seed: int = 0,
    ):
        self.min_nodes = min_nodes
        self.max_nodes = max_nodes
        self.p_range = p_range
        self.seed = seed

    def __iter__(self) -> Iterator[Graph]:
        i = 0
        while True:
            rng = np.random.default_rng((self.seed, i))
            n = int(rng.integers(self.min_nodes, self.max_nodes + 1))
            p = float(rng.uniform(*self.p_range))
            g = erdos_renyi_graph(rng, n, p)
            g.idx = i
            i += 1
            yield g


def write_npz_shards(
    graphs, out_dir: str, shard_size: int = 1024, start_shard: int = 0
) -> int:
    """Utility: materialise an iterable of Graphs into npz shards."""
    os.makedirs(out_dir, exist_ok=True)
    buf = []
    shard = start_shard
    count = 0

    def flush():
        nonlocal shard, buf
        if not buf:
            return
        node_ptr = np.zeros(len(buf) + 1, np.int64)
        edge_ptr = np.zeros(len(buf) + 1, np.int64)
        for i, g in enumerate(buf):
            node_ptr[i + 1] = node_ptr[i] + g.num_nodes
            edge_ptr[i + 1] = edge_ptr[i] + g.num_edges
        payload = {
            "node_ptr": node_ptr,
            "edge_ptr": edge_ptr,
            # npz contract: edges carry GLOBAL (node_ptr-offset) node ids
            "edge_index": np.concatenate(
                [g.edge_index + np.int64(node_ptr[i]) for i, g in enumerate(buf)],
                axis=1,
            ),
        }
        if buf[0].node_attr is not None:
            payload["node_attr"] = np.concatenate([g.node_attr for g in buf])
        if buf[0].edge_attr is not None:
            payload["edge_attr"] = np.concatenate([g.edge_attr for g in buf])
        if buf[0].y is not None:
            payload["y"] = np.stack([np.asarray(g.y).reshape(-1) for g in buf])
        np.savez(os.path.join(out_dir, f"shard_{shard:05d}.npz"), **payload)
        shard += 1
        buf = []

    for g in graphs:
        buf.append(g)
        count += 1
        if len(buf) >= shard_size:
            flush()
    flush()
    return count
