"""Edge-partitioned distributed input pipeline (north-star design).

Beyond the reference (which rank-strides *samples*; SURVEY.md §2.2): the
big-graph corpus itself is partitioned across hosts —

  1. nodes are partitioned edge-balanced (BFS growth, partition.py);
  2. each host owns the edges whose source it owns, plus a `halo_hops`-deep
     closure of boundary nodes so local ego/Euler sampling up to that depth
     never leaves the shard;
  3. halo node *features* live on their owner; they are fetched with a
     device all-to-all (`jax.lax.all_to_all` under shard_map, riding ICI)
     into per-shard feature tables, overlappable with host tokenization via
     a background prefetch thread.

The 1-host path is the degenerate case (everything local, no exchange).
Runs identically on the virtual CPU mesh for testing.
"""

from __future__ import annotations

import threading
from typing import List, Optional

import numpy as np

from ..data.graph import Graph
from ..data.partition import bfs_partition
from ..data.sampling import build_csr_directed


class ShardGraph:
    """One host's shard: owned + halo nodes, locally re-indexed subgraph."""

    def __init__(
        self,
        shard_id: int,
        global_nodes: np.ndarray,  # local idx -> global id (owned first)
        num_owned: int,
        edge_index_local: np.ndarray,  # [2, E_local] local ids
        owner_of: np.ndarray,  # local idx -> owning shard
    ):
        self.shard_id = shard_id
        self.global_nodes = global_nodes
        self.num_owned = num_owned
        self.edge_index = edge_index_local
        self.owner_of = owner_of
        self.node_attr: Optional[np.ndarray] = None  # filled by exchange
        self.y: Optional[np.ndarray] = None

    @property
    def num_nodes(self) -> int:
        return len(self.global_nodes)

    @property
    def halo_nodes_global(self) -> np.ndarray:
        return self.global_nodes[self.num_owned :]

    def to_graph(self) -> Graph:
        return Graph(
            num_nodes=self.num_nodes,
            edge_index=self.edge_index,
            node_attr=self.node_attr,
            y=self.y,
        )


class EdgePartitionedCorpus:
    """Partition a big graph into per-host shards with halo closure."""

    def __init__(
        self,
        big: Graph,
        num_shards: int,
        halo_hops: int = 1,
        seed: int = 0,
    ):
        self.big = big
        self.num_shards = num_shards
        rng = np.random.default_rng(seed)
        parts = bfs_partition(big, num_shards, rng)
        while len(parts) < num_shards:  # tiny graphs: pad with empty parts
            parts.append(np.zeros(0, np.int64))
        self.owner = np.full(big.num_nodes, -1, np.int64)
        for k, p in enumerate(parts):
            self.owner[p] = k
        indptr, indices, _ = build_csr_directed(big.num_nodes, big.edge_index)

        def _expand(frontier: np.ndarray, in_closure: np.ndarray) -> np.ndarray:
            """All yet-unseen neighbours of `frontier`, vectorised CSR gather
            (no per-node Python loops — this runs at corpus scale)."""
            counts = (indptr[frontier + 1] - indptr[frontier]).astype(np.int64)
            total = int(counts.sum())
            if total == 0:
                return np.zeros(0, np.int64)
            starts = np.repeat(indptr[frontier], counts)
            offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
            nbrs = indices[starts + offs]
            new = np.unique(nbrs[~in_closure[nbrs]])
            in_closure[new] = True
            return new

        self.shards: List[ShardGraph] = []
        for k in range(num_shards):
            owned = np.asarray(parts[k], np.int64)
            in_closure = np.zeros(big.num_nodes, bool)
            in_closure[owned] = True
            frontier = owned
            halo_parts = []
            for _ in range(halo_hops):
                frontier = _expand(frontier, in_closure)
                halo_parts.append(frontier)
            halo = (
                np.sort(np.concatenate(halo_parts))
                if halo_parts
                else np.zeros(0, np.int64)
            )
            global_nodes = np.concatenate([np.sort(owned), halo])
            lookup = np.full(big.num_nodes, -1, np.int64)
            lookup[global_nodes] = np.arange(len(global_nodes))
            # edge partition: an edge belongs to the shard owning its source
            src_owned = self.owner[big.edge_index[0]] == k
            in_closure = lookup[big.edge_index[1]] >= 0
            eids = np.flatnonzero(src_owned & in_closure)
            ei_local = np.stack(
                [lookup[big.edge_index[0][eids]], lookup[big.edge_index[1][eids]]]
            ).astype(np.int32)
            shard = ShardGraph(k, global_nodes, len(owned), ei_local, self.owner[global_nodes])
            # owned features are local immediately
            if big.node_attr is not None:
                shard.node_attr = np.zeros(
                    (len(global_nodes),) + big.node_attr.shape[1:], big.node_attr.dtype
                )
                shard.node_attr[: len(owned)] = big.node_attr[np.sort(owned)]
            if big.y is not None:
                y2 = np.asarray(big.y).reshape(big.num_nodes, -1)
                shard.y = np.zeros((len(global_nodes), y2.shape[1]), y2.dtype)
                shard.y[: len(owned)] = y2[np.sort(owned)]
            self.shards.append(shard)

    # ------------------------------------------------------------------
    def exchange_halo_features_host(self) -> None:
        """Host-side reference exchange (the degenerate / fallback path)."""
        if self.big.node_attr is None:
            return
        for shard in self.shards:
            halo = shard.halo_nodes_global
            shard.node_attr[shard.num_owned :] = self.big.node_attr[halo]

    def exchange_halo_features_device(self, mesh=None, axis: str = "data") -> None:
        """Device all-to-all halo feature exchange over the mesh's `axis`.

        Every shard posts (dest_shard, global_id, feature_row) for each halo
        request it serves; rows ride `jax.lax.all_to_all` on ICI. Padded to
        the max requests per shard pair so shapes stay static.
        """
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        if self.big.node_attr is None:
            return
        s = self.num_shards
        feat_dim = self.big.node_attr.shape[1]
        # request table, fully vectorised: for each dst shard, its (sorted)
        # halo nodes grouped by owning shard via one argsort + bincount
        grouped: List[List[np.ndarray]] = []  # grouped[d][o] = global ids
        for shard in self.shards:
            halo = shard.halo_nodes_global
            owners = self.owner[halo]
            order = np.argsort(owners, kind="stable")
            h_sorted = halo[order]
            counts = np.bincount(owners[order], minlength=s)
            bounds = np.concatenate([[0], np.cumsum(counts)])
            grouped.append([h_sorted[bounds[o] : bounds[o + 1]] for o in range(s)])
        cap = max((len(grouped[d][o]) for d in range(s) for o in range(s)), default=0)
        cap = max(cap, 1)
        # send buffer on owner o: for each dst d, the feature rows dst needs
        send_ids = np.full((s, s, cap), -1, np.int64)
        for d in range(s):
            for o in range(s):
                ids = grouped[d][o]
                send_ids[o, d, : len(ids)] = ids
        send = np.zeros((s, s, cap, feat_dim), self.big.node_attr.dtype)
        valid = send_ids >= 0
        send[valid] = self.big.node_attr[send_ids[valid]]

        if mesh is None:
            import jax

            devices = jax.devices()[:s]
            from jax.sharding import Mesh

            mesh = Mesh(np.asarray(devices), (axis,))

        @jax.jit
        def _exchange(buf):
            def body(b):  # per-shard block [1, s, cap, F]
                x = b[0]  # [s, cap, F]: row d = rows this owner sends to d
                out = jax.lax.all_to_all(x, axis, 0, 0, tiled=True)
                return out[None]  # [1, s, cap, F]: row o = rows from owner o

            return shard_map(
                body, mesh=mesh, in_specs=P(axis), out_specs=P(axis)
            )(buf)

        recv = np.asarray(_exchange(jnp.asarray(send)))  # [s, s, cap, F] dst-major
        # recv[d, o] = rows from owner o for dst d; scatter-back vectorised:
        # halo block of global_nodes is sorted, so local index = num_owned +
        # searchsorted(halo, ids) — one fancy-index assignment per (d, o)
        for d in range(s):
            shard = self.shards[d]
            halo_sorted = shard.halo_nodes_global
            for o in range(s):
                ids = grouped[d][o]
                if len(ids):
                    loc = shard.num_owned + np.searchsorted(halo_sorted, ids)
                    shard.node_attr[loc] = recv[d, o, : len(ids)]

    def prefetch_exchange(self, mesh=None):
        """Overlap the halo exchange with host-side tokenization: returns a
        join() handle while the exchange proceeds in the background."""
        t = threading.Thread(
            target=self.exchange_halo_features_device, kwargs={"mesh": mesh}, daemon=True
        )
        t.start()
        return t


def shard_ego_node_dataset(
    ds,
    num_shards: int,
    shard_id: int,
    halo_hops: int = 1,
    seed: int = 0,
    mesh=None,
):
    """Partition an EgoNodeDataset's big graph across hosts and return this
    host's local dataset (north-star wiring, SURVEY.md §2.2).

    The halo feature exchange is kicked off in the background so it overlaps
    with tokenizer/vocab construction; callers must `handle.join()` before
    drawing samples (shard features are filled in place). Returns
    (local_dataset, corpus, join_handle)."""
    from ..data.sampling import EgoNodeDataset

    corpus = EdgePartitionedCorpus(ds.big, num_shards, halo_hops=halo_hops, seed=seed)
    handle = corpus.prefetch_exchange(mesh=mesh) if num_shards > 1 else None
    if num_shards == 1:
        corpus.exchange_halo_features_host()
    shard = corpus.shards[shard_id]
    owned_global = shard.global_nodes[: shard.num_owned]
    lookup = np.full(ds.big.num_nodes, -1, np.int64)
    lookup[shard.global_nodes] = np.arange(shard.num_nodes)
    local_samples = lookup[np.intersect1d(ds.sample_idx, owned_global)]
    local = EgoNodeDataset(
        shard.to_graph(),
        depth_neighbors=ds.depth_neighbors,
        sample_idx=local_samples,
        replace=ds.replace,
        seed=ds.seed,
        pretrain_mode=ds.pretrain_mode,
        task_mask_func=ds.task_mask_func,
        root_attr_mask=ds.root_attr_mask,
    )
    return local, corpus, handle
