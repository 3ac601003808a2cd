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


class _PropagatingThread(threading.Thread):
    """Thread whose join() re-raises any exception from the target.

    Every background halo-exchange thread rides this: a plain daemon
    thread swallows exceptions, so a failure (e.g. the int32-overflow
    guard) would leave halo rows silently zero — the exact corruption
    class the guards exist to prevent — while the caller's join()
    reports success."""

    def run(self):
        self._exc = None
        try:
            super().run()
        except BaseException as e:  # re-raised at join()
            self._exc = e

    def join(self, timeout=None):
        super().join(timeout)
        if getattr(self, "_exc", None) is not None:
            raise self._exc


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

    def to_local(self, ids: np.ndarray) -> np.ndarray:
        """Global ids -> local indices (-1 when outside the closure).
        global_nodes is [sorted owned, sorted halo], so two searchsorted
        passes cover both blocks without an O(N) lookup table."""
        ids = np.asarray(ids, np.int64)
        owned = self.global_nodes[: self.num_owned]
        halo = self.global_nodes[self.num_owned :]
        out = np.full(ids.shape, -1, np.int64)
        if len(owned):
            pos = np.minimum(np.searchsorted(owned, ids), len(owned) - 1)
            hit = owned[pos] == ids
            out[hit] = pos[hit]
        if len(halo):
            pos = np.minimum(np.searchsorted(halo, ids), len(halo) - 1)
            hit = (halo[pos] == ids) & (out < 0)
            out[hit] = self.num_owned + pos[hit]
        return out

    def to_graph(self) -> Graph:
        return Graph(
            num_nodes=self.num_nodes,
            edge_index=self.edge_index,
            node_attr=self.node_attr,
            y=self.y,
        )


class EdgePartitionedCorpus:
    """Partition a big graph into per-host shards with halo closure.

    Two construction modes:
      - shard_id=None (single-controller / test mode): builds ALL shards on
        this process from the in-memory corpus.
      - shard_id=k (true per-host mode): builds ONLY shard k. Node FEATURES
        are taken from `owned_feature_fn(sorted_owned_global_ids)` when
        given (O(shard) memory — the full node_attr table is never
        materialised on any host), else sliced from big.node_attr. Halo
        features arrive later via `exchange_halo_features_multihost`.
        The topology (edge_index, ~O(E) ints) and the deterministic
        partition assignment are computed identically on every host.
    """

    def __init__(
        self,
        big: Graph,
        num_shards: int,
        halo_hops: int = 1,
        seed: int = 0,
        shard_id: Optional[int] = None,
        owned_feature_fn=None,
    ):
        self.big = big
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.halo_hops = halo_hops
        rng = np.random.default_rng(seed)
        parts = bfs_partition(big, num_shards, rng)
        while len(parts) < num_shards:  # tiny graphs: pad with empty parts
            parts.append(np.zeros(0, np.int64))
        self._parts = parts
        self.owner = np.full(big.num_nodes, -1, np.int64)
        for k, p in enumerate(parts):
            self.owner[p] = k
        self._indptr, self._indices, _ = build_csr_directed(
            big.num_nodes, big.edge_index
        )
        self.shards: List[Optional[ShardGraph]] = [None] * num_shards
        if shard_id is None:
            for k in range(num_shards):
                self.shards[k] = self._build_shard(k, None)
        else:
            self.shards[shard_id] = self._build_shard(shard_id, owned_feature_fn)

    def _expand(self, frontier: np.ndarray, in_closure: np.ndarray) -> np.ndarray:
        """All yet-unseen neighbours of `frontier`, vectorised CSR gather
        (no per-node Python loops — this runs at corpus scale)."""
        indptr, indices = self._indptr, self._indices
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

    def _build_shard(self, k: int, owned_feature_fn) -> ShardGraph:
        big = self.big
        owned = np.asarray(self._parts[k], np.int64)
        in_closure = np.zeros(big.num_nodes, bool)
        in_closure[owned] = True
        frontier = owned
        halo_parts = []
        for _ in range(self.halo_hops):
            frontier = self._expand(frontier, in_closure)
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
        shard = ShardGraph(
            k, global_nodes, len(owned), ei_local, self.owner[global_nodes]
        )
        # owned features are local immediately; halo rows stay zero until
        # the exchange fills them
        sorted_owned = np.sort(owned)
        if owned_feature_fn is not None:
            rows = np.asarray(owned_feature_fn(sorted_owned))
            shard.node_attr = np.zeros(
                (len(global_nodes),) + rows.shape[1:], rows.dtype
            )
            shard.node_attr[: len(owned)] = rows
        elif big.node_attr is not None:
            shard.node_attr = np.zeros(
                (len(global_nodes),) + big.node_attr.shape[1:],
                big.node_attr.dtype,
            )
            shard.node_attr[: len(owned)] = big.node_attr[sorted_owned]
        if big.y is not None:
            y2 = np.asarray(big.y).reshape(big.num_nodes, -1)
            shard.y = np.zeros((len(global_nodes), y2.shape[1]), y2.dtype)
            shard.y[: len(owned)] = y2[sorted_owned]
        return shard

    # ------------------------------------------------------------------
    def exchange_halo_features_host(self) -> None:
        """Host-side reference exchange (the degenerate / fallback path)."""
        if self.big.node_attr is None:
            return
        for shard in self.shards:
            if shard is None:  # per-host mode: only the local shard exists
                continue
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

        # jnp.asarray silently downcasts int64 -> int32 (x64 disabled):
        # wrapped ids would scatter corrupted values into halo rows — the
        # same shard-boundary corruption class the multihost path guards
        if (
            np.issubdtype(send.dtype, np.integer)
            and send.size
            and int(np.abs(send).max()) > np.iinfo(np.int32).max
        ):
            raise ValueError(
                "halo exchange: integer node attributes exceed int32 range "
                "— re-encode attribute ids below 2^31"
            )
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

    def _owner_of(self, ids: np.ndarray) -> np.ndarray:
        """Owning shard per global node id (array lookup here; the
        streaming corpus overrides with the stateless hash)."""
        return self.owner[np.asarray(ids, np.int64)]

    def exchange_halo_features_multihost(self) -> None:
        """True per-host halo exchange (the north-star's defining sentence):
        this process holds ONLY its own shard — owned features in
        shard.node_attr[:num_owned], halo rows zero — and no host ever
        materialises the full corpus node_attr.

          1. each host groups its halo ids by owning shard (the partition
             assignment is deterministic global knowledge);
          2. request id lists are process_allgather'ed (two rounds: counts
             for the global pad cap, then padded ids) — O(total halo) ints;
          3. every owner answers with the requested feature rows via ONE
             device all-to-all over a one-device-per-process mesh (rides
             ICI/DCN, not host RPC);
          4. received rows scatter into the local halo block.

        Requires jax.distributed with process_count == num_shards and
        shard_id == process_index (the per-host construction mode).
        """
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.experimental import multihost_utils
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        s = self.num_shards
        me = self.shard_id
        assert me is not None, "multihost exchange needs per-host construction"
        assert jax.process_count() == s and jax.process_index() == me, (
            f"need one process per shard: process {jax.process_index()}/"
            f"{jax.process_count()} vs shard {me}/{s}"
        )
        shard = self.shards[me]
        if shard.node_attr is None:
            return
        # int32-range check made HOST-UNIFORM before any data collective:
        # each host checks its own owned rows (the only rows it sends),
        # then the verdict rides one tiny allgather so either EVERY host
        # raises or none does — a lone raiser would strand its peers
        # inside the later collectives forever
        own_rows = shard.node_attr[: shard.num_owned]
        local_bad = int(
            np.issubdtype(own_rows.dtype, np.integer)
            and own_rows.size
            and int(np.abs(own_rows).max()) > np.iinfo(np.int32).max
        )
        any_bad = multihost_utils.process_allgather(
            np.asarray([local_bad], np.int64)
        ).max()
        if any_bad:
            raise ValueError(
                "halo exchange: integer node attributes exceed int32 range "
                "— re-encode attribute ids below 2^31"
            )
        feat_dim = shard.node_attr.shape[1]
        # 1. my halo requests grouped by owner (argsort + bincount)
        halo = shard.halo_nodes_global
        owners = self._owner_of(halo)
        order = np.argsort(owners, kind="stable")
        h_sorted = halo[order]
        counts = np.bincount(owners[order], minlength=s).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        my_req = [h_sorted[bounds[o] : bounds[o + 1]] for o in range(s)]
        # 2. global request table: cap from allgathered counts, then ids
        all_counts = multihost_utils.process_allgather(counts)  # [s(dst), s(owner)]
        cap = max(int(np.max(all_counts)), 1)
        req_pad = np.full((s, cap), -1, np.int64)
        for o in range(s):
            req_pad[o, : len(my_req[o])] = my_req[o]
        req_all = multihost_utils.process_allgather(req_pad)  # [s(dst), s(owner), cap]
        # 3. my send buffer: row d = my owned feature rows that dst d asked for
        owned_sorted = shard.global_nodes[: shard.num_owned]
        send = np.zeros((s, cap, feat_dim), shard.node_attr.dtype)
        for d in range(s):
            ids = req_all[d, me]
            ids = ids[ids >= 0]
            if len(ids):
                loc = np.searchsorted(owned_sorted, ids)
                send[d, : len(ids)] = shard.node_attr[loc]
        # one device per process; all_to_all over that axis
        dev_by_proc = {}
        for dev in jax.devices():
            dev_by_proc.setdefault(dev.process_index, dev)
        mesh = Mesh(np.asarray([dev_by_proc[i] for i in range(s)]), ("shard",))
        sharding = NamedSharding(mesh, P("shard"))
        # dtype-preserving wire format: integer attribute tables ride as
        # int32 (a float32 round-trip silently corrupts ids > 2^24 — only
        # halo rows, the worst kind of shard-boundary bug); floats as f32
        if np.issubdtype(send.dtype, np.integer):
            if send.size and int(np.abs(send).max()) > np.iinfo(np.int32).max:
                raise ValueError(
                    "halo exchange: integer node attributes exceed int32 "
                    "range — re-encode attribute ids below 2^31"
                )
            wire = send[None].astype(np.int32)
        else:
            wire = send[None].astype(np.float32)
        buf = jax.make_array_from_process_local_data(sharding, wire)

        def body(b):  # [1, s, cap, F] per device
            return jax.lax.all_to_all(b[0], "shard", 0, 0, tiled=True)[None]

        recv = jax.jit(
            shard_map(body, mesh=mesh, in_specs=P("shard"), out_specs=P("shard"))
        )(buf)
        local = np.asarray(list(recv.addressable_shards)[0].data)[0]  # [s, cap, F]
        # 4. scatter into the halo block (sorted -> searchsorted indices)
        for o in range(s):
            ids = my_req[o]
            if len(ids):
                loc = shard.num_owned + np.searchsorted(halo, ids)
                shard.node_attr[loc] = local[o, : len(ids)].astype(
                    shard.node_attr.dtype
                )

    def prefetch_exchange(self, mesh=None):
        """Overlap the halo exchange with host-side tokenization: returns a
        join() handle while the exchange proceeds in the background."""
        t = _PropagatingThread(
            target=self.exchange_halo_features_device, kwargs={"mesh": mesh}, daemon=True
        )
        t.start()
        return t


def hash_owner(ids, num_shards: int, seed: int = 0) -> np.ndarray:
    """Stateless deterministic node→shard assignment (splitmix64 mixer).

    Replaces the BFS-grow partitioner for the O(shard)-topology path (r4
    verdict Weak #4): every host computes identical ownership from the id
    alone — no global adjacency, no O(N) owner array, no CSR. The tradeoff
    vs BFS growth is locality (hash partitions cut more edges → larger
    halos); the streaming corpus exists for graphs too big to hold, where
    the BFS partitioner's O(E) CSR is not an option in the first place."""
    x = np.asarray(ids, np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return (x % np.uint64(num_shards)).astype(np.int64)


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Boolean membership of `values` in `sorted_arr` via searchsorted —
    the O(shard)-memory replacement for an O(N) bitmap."""
    if len(sorted_arr) == 0:
        return np.zeros(len(values), bool)
    pos = np.searchsorted(sorted_arr, values)
    pos = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos] == values


class StreamingPartitionedCorpus(EdgePartitionedCorpus):
    """O(E/shards + halo) per-host corpus built from an EDGE STREAM (r4
    verdict Weak #4): no process ever materialises the full edge_index, a
    CSR, an O(N) owner array, or the feature table.

      - ownership is the stateless `hash_owner` (identical on all hosts,
        no communication, no global adjacency);
      - `edge_blocks_fn()` returns a fresh iterator of [2, e] int blocks
        (e.g. slices of a memory-mapped npz column) — it is consumed
        `halo_hops + 1` times: one pass per halo hop to grow the closure
        frontier (sorted-array membership, no bitmaps), one final pass to
        collect this shard's edges (source owned here, dst in closure);
      - features/labels come from `owned_feature_fn(sorted_owned_ids)` /
        `label_fn(...)`; halo feature rows arrive later via the inherited
        `exchange_halo_features_multihost` (which needs only the stateless
        `_owner_of` — overridden here — and the local shard).

    The single-host EdgePartitionedCorpus (BFS partitioner, in-memory
    graph) remains the quality-partition path for corpora that fit."""

    def __init__(
        self,
        num_nodes: int,
        edge_blocks_fn,
        num_shards: int,
        shard_id: int,
        halo_hops: int = 1,
        seed: int = 0,
        owned_feature_fn=None,
        label_fn=None,
        node_chunk: int = 1 << 20,
    ):
        # deliberately NOT calling super().__init__: there is no in-memory
        # big graph in this mode
        self.big = None
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.halo_hops = halo_hops
        self._seed = seed
        self.num_nodes = num_nodes
        # owned ids (ascending by construction over ascending chunks)
        owned_parts = []
        for start in range(0, num_nodes, node_chunk):
            ids = np.arange(start, min(start + node_chunk, num_nodes), dtype=np.int64)
            owned_parts.append(ids[hash_owner(ids, num_shards, seed) == shard_id])
        owned = (
            np.concatenate(owned_parts) if owned_parts else np.zeros(0, np.int64)
        )
        # halo closure: one stream pass per hop, sorted-membership only
        closure = owned
        frontier = owned
        halo_parts: List[np.ndarray] = []
        for _ in range(halo_hops):
            cand_parts = []
            for block in edge_blocks_fn():
                block = np.asarray(block)
                m = _in_sorted(block[0], frontier)
                if m.any():
                    cand_parts.append(block[1][m])
            if not cand_parts:
                frontier = np.zeros(0, np.int64)
                continue
            cand = np.unique(np.concatenate(cand_parts)).astype(np.int64)
            new = cand[~_in_sorted(cand, closure)]
            halo_parts.append(new)
            closure = np.sort(np.concatenate([closure, new]))
            frontier = new
        halo = (
            np.sort(np.concatenate(halo_parts))
            if halo_parts
            else np.zeros(0, np.int64)
        )
        # final pass: this shard's edges (src owned here, dst in closure)
        src_parts, dst_parts = [], []
        for block in edge_blocks_fn():
            block = np.asarray(block)
            m = (hash_owner(block[0], num_shards, seed) == shard_id) & _in_sorted(
                block[1], closure
            )
            if m.any():
                src_parts.append(block[0][m].astype(np.int64))
                dst_parts.append(block[1][m].astype(np.int64))
        src = np.concatenate(src_parts) if src_parts else np.zeros(0, np.int64)
        dst = np.concatenate(dst_parts) if dst_parts else np.zeros(0, np.int64)
        global_nodes = np.concatenate([owned, halo])

        def to_local(x):
            pos = np.searchsorted(owned, x)
            pos = np.minimum(pos, max(len(owned) - 1, 0))
            is_owned = (owned[pos] == x) if len(owned) else np.zeros(len(x), bool)
            hpos = np.searchsorted(halo, x) if len(halo) else np.zeros(len(x), np.int64)
            return np.where(is_owned, pos, len(owned) + hpos).astype(np.int32)

        ei_local = np.stack([to_local(src), to_local(dst)])
        shard = ShardGraph(
            shard_id,
            global_nodes,
            len(owned),
            ei_local,
            hash_owner(global_nodes, num_shards, seed),
        )
        if owned_feature_fn is not None:
            rows = np.asarray(owned_feature_fn(owned))
            shard.node_attr = np.zeros(
                (len(global_nodes),) + rows.shape[1:], rows.dtype
            )
            shard.node_attr[: len(owned)] = rows
        if label_fn is not None:
            yrows = np.asarray(label_fn(owned)).reshape(len(owned), -1)
            shard.y = np.zeros((len(global_nodes), yrows.shape[1]), yrows.dtype)
            shard.y[: len(owned)] = yrows
        self.shards = [None] * num_shards
        self.shards[shard_id] = shard

    def _owner_of(self, ids: np.ndarray) -> np.ndarray:
        return hash_owner(ids, self.num_shards, self._seed)


def shard_ego_node_dataset_streaming(
    num_nodes: int,
    edge_blocks_fn,
    sample_idx: np.ndarray,
    depth_neighbors,
    num_shards: int,
    shard_id: int,
    halo_hops: int = 1,
    seed: int = 0,
    owned_feature_fn=None,
    label_fn=None,
    pretrain_mode: bool = True,
    **ego_kwargs,
):
    """O(shard)-memory analogue of shard_ego_node_dataset: the corpus is
    built from an edge stream (never the full graph), halo features ride
    the device all-to-all in the background. Returns
    (local_dataset, corpus, join_handle)."""
    from ..data.sampling import EgoNodeDataset

    corpus = StreamingPartitionedCorpus(
        num_nodes,
        edge_blocks_fn,
        num_shards,
        shard_id,
        halo_hops=halo_hops,
        seed=seed,
        owned_feature_fn=owned_feature_fn,
        label_fn=label_fn,
    )
    import jax

    handle = None
    if num_shards > 1 and jax.process_count() == num_shards:
        handle = _PropagatingThread(
            target=corpus.exchange_halo_features_multihost, daemon=True
        )
        handle.start()
    elif num_shards > 1:
        if jax.process_count() > 1:
            raise ValueError(
                f"streaming partitioned corpus: {jax.process_count()} "
                f"processes but {num_shards} shards — the multihost halo "
                "exchange needs exactly one process per shard"
            )
        # single-process construction (tests / offline prep): no exchange
        # path exists — fill halo rows straight from the feature source
        # instead of leaving them silently zero (which would train
        # boundary-crossing subgraphs on zeroed neighbour features)
        sh = corpus.shards[shard_id]
        halo_ids = sh.global_nodes[sh.num_owned :]
        if sh.node_attr is not None and len(halo_ids):
            sh.node_attr[sh.num_owned :] = np.asarray(
                owned_feature_fn(halo_ids)
            )
    shard = corpus.shards[shard_id]
    owned = shard.global_nodes[: shard.num_owned]
    sample_idx = np.asarray(sample_idx, np.int64)
    mine = sample_idx[_in_sorted(sample_idx, owned)]
    local_samples = np.searchsorted(owned, mine)
    local = EgoNodeDataset(
        shard.to_graph(),
        depth_neighbors=depth_neighbors,
        sample_idx=local_samples,
        seed=seed,
        pretrain_mode=pretrain_mode,
        **ego_kwargs,
    )
    return local, corpus, handle


def shard_ego_node_dataset(
    ds,
    num_shards: int,
    shard_id: int,
    halo_hops: int = 1,
    seed: int = 0,
    mesh=None,
    owned_feature_fn=None,
):
    """Partition an EgoNodeDataset's big graph across hosts and return this
    host's local dataset (north-star wiring, SURVEY.md §2.2).

    Under real multi-process execution (jax.process_count() == num_shards)
    each host builds ONLY its own shard and halo features arrive via the
    device all-to-all in exchange_halo_features_multihost — memory
    O(shard), never O(corpus) for features (pass `owned_feature_fn` to
    avoid holding big.node_attr at all). Single-process (tests, 1-host
    deployments) keeps the all-shards construction with the local exchange.

    The halo feature exchange is kicked off in the background so it overlaps
    with tokenizer/vocab construction; callers must `handle.join()` before
    drawing samples (shard features are filled in place). Returns
    (local_dataset, corpus, join_handle)."""
    import jax

    from ..data.sampling import EgoNodeDataset

    multihost = num_shards > 1 and jax.process_count() == num_shards
    if multihost:
        corpus = EdgePartitionedCorpus(
            ds.big,
            num_shards,
            halo_hops=halo_hops,
            seed=seed,
            shard_id=shard_id,
            owned_feature_fn=owned_feature_fn,
        )
        handle = _PropagatingThread(
            target=corpus.exchange_halo_features_multihost, daemon=True
        )
        handle.start()
    else:
        corpus = EdgePartitionedCorpus(
            ds.big, num_shards, halo_hops=halo_hops, seed=seed
        )
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


def shard_ego_edge_dataset(
    ds,
    num_shards: int,
    shard_id: int,
    halo_hops: int = 1,
    seed: int = 0,
    mesh=None,
    owned_feature_fn=None,
):
    """Partition an EgoEdgeDataset's big graph across hosts and return this
    host's local dataset (r4 verdict Weak #5: the same big-graph memory
    problem ogbl-ppa/citation2 have on the FINETUNE side).

      - positives whose SOURCE node is owned by this shard stay here (both
        endpoints are inside the halo closure for halo_hops >= 1 since
        positives are graph edges); endpoints are remapped to local ids;
      - negatives are drawn SHARD-LOCALLY per epoch with the existing
        global/local strategies over the local (owned + halo) graph —
        `reset_samples` keeps working unchanged on the local dataset;
      - per-positive edge attrs (wikikg2 relations) follow their positive;
        relation candidate tables are global knowledge and pass through;
      - fixed structured eval negatives (ogbl-citation2/wikikg2 MRR) are a
        GLOBAL evaluation structure and are rejected: evaluate those with
        the unpartitioned dataset (the reference has no partitioned
        evaluation either).

    Same construction modes as shard_ego_node_dataset: true per-host under
    jax.process_count() == num_shards (only the local shard is built, halo
    features ride the device all-to-all in the background), all-shards
    otherwise. Returns (local_dataset, corpus, join_handle)."""
    import jax

    from ..data.sampling import EgoEdgeDataset

    assert ds.fixed_neg is None, (
        "fixed eval negatives are a global MRR structure; run partitioned "
        "training with sampled negatives and evaluate on the unpartitioned "
        "dataset"
    )
    multihost = num_shards > 1 and jax.process_count() == num_shards
    if multihost:
        corpus = EdgePartitionedCorpus(
            ds.big,
            num_shards,
            halo_hops=halo_hops,
            seed=seed,
            shard_id=shard_id,
            owned_feature_fn=owned_feature_fn,
        )
        handle = _PropagatingThread(
            target=corpus.exchange_halo_features_multihost, daemon=True
        )
        handle.start()
    else:
        corpus = EdgePartitionedCorpus(
            ds.big, num_shards, halo_hops=halo_hops, seed=seed
        )
        handle = corpus.prefetch_exchange(mesh=mesh) if num_shards > 1 else None
    if num_shards == 1:
        corpus.exchange_halo_features_host()
    shard = corpus.shards[shard_id]
    pos = ds.pos_edges_all
    src_owner = corpus._owner_of(pos[:, 0])
    loc_src = shard.to_local(pos[:, 0])
    loc_dst = shard.to_local(pos[:, 1])
    mine = (src_owner == shard_id) & (loc_src >= 0) & (loc_dst >= 0)
    local_pos = np.stack([loc_src[mine], loc_dst[mine]], axis=1)
    local_attr = (
        None if ds.pos_edge_attr_all is None else ds.pos_edge_attr_all[mine]
    )
    local = EgoEdgeDataset(
        shard.to_graph(),
        depth_neighbors=ds.depth_neighbors,
        pos_edges=local_pos,
        neg_ratio=ds.neg_ratio,
        percent=ds.percent,
        method=ds.method,
        replace=ds.replace,
        seed=ds.seed,
        pretrain_mode=ds.pretrain_mode,
        pos_edge_attr=local_attr,
        neg_edge_attr_candidates=ds.neg_edge_attr_candidates,
        sample_edges=ds.sample_edges,
        # inverse-frequency weights recomputed over the LOCAL positives —
        # an O(shard) approximation of the global counts
        sample_wgt=ds.train_count is not None,
        relation_col=ds.relation_col,
    )
    return local, corpus, handle
