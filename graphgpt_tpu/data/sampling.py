"""Subgraph sampling for big-graph (node/edge-level) training.

CSR-native re-implementation of the reference's torch-sparse-backed
samplers (src/data/dataset_map.py:132-553):

  - ego-k-hop neighbourhood expansion with per-hop fanout
    (torch.ops.torch_sparse.ego_k_hop_sample_adj equivalent),
  - node-induced subgraph extraction (saint_subgraph equivalent),
  - link-prediction datasets with per-epoch positive subsetting
    (percent with cyclic-epoch seeds, dataset_map.py:567-597) and
    global / local (head/tail/edge-replacement) negative sampling
    (dataset_map.py:600-683),
  - target-edge removal during fine-tuning (dataset_map.py:556-564).

A C++ fast path (graphgpt_tpu/native) can replace `ego_k_hop` for
throughput; the numpy version is the semantic reference.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .graph import CSR, Graph


def build_csr_directed(num_nodes: int, edge_index: np.ndarray):
    """CSR over *directed* edges with original edge ids as values
    (mirrors the SparseTensor adj_t the reference builds)."""
    order = np.argsort(edge_index[0], kind="stable")
    indptr = np.zeros(num_nodes + 1, np.int64)
    counts = np.bincount(edge_index[0], minlength=num_nodes)
    np.cumsum(counts, out=indptr[1:])
    return indptr, edge_index[1][order].astype(np.int64), order.astype(np.int64)


def ego_k_hop(
    indptr: np.ndarray,
    indices: np.ndarray,
    seeds: Sequence[int],
    depth: int,
    fanout: int,
    rng: np.random.Generator,
    replace: bool = False,
) -> np.ndarray:
    """Sampled k-hop neighbourhood node set (sorted unique, seeds included)."""
    try:
        from ..native import euler_native

        out = euler_native.ego_k_hop(
            indptr, indices, np.asarray(seeds, np.int64), depth, fanout, rng, replace
        )
        if out is not None:
            return out
    except Exception:
        pass
    visited = set(int(s) for s in seeds)
    frontier = list(visited)
    for _ in range(depth):
        nxt = []
        for node in frontier:
            nbrs = indices[indptr[node] : indptr[node + 1]]
            if len(nbrs) == 0:
                continue
            if fanout >= 0 and len(nbrs) > fanout:
                if replace:
                    nbrs = nbrs[rng.integers(0, len(nbrs), size=fanout)]
                else:
                    nbrs = rng.choice(nbrs, size=fanout, replace=False)
            for nb in nbrs:
                nb = int(nb)
                if nb not in visited:
                    visited.add(nb)
                    nxt.append(nb)
        frontier = nxt
    return np.asarray(sorted(visited), np.int64)


def induced_subgraph(
    big: Graph, nodes: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """(sub_edge_index relabeled, original edge column ids) for the
    node-induced directed subgraph (saint_subgraph equivalent)."""
    lookup = np.full(big.num_nodes, -1, np.int64)
    lookup[nodes] = np.arange(len(nodes))
    src_ok = lookup[big.edge_index[0]] >= 0
    dst_ok = lookup[big.edge_index[1]] >= 0
    mask = src_ok & dst_ok
    eids = np.flatnonzero(mask)
    sub = np.stack([lookup[big.edge_index[0][eids]], lookup[big.edge_index[1][eids]]])
    return sub.astype(np.int32), eids


class EgoNodeDataset:
    """Per-seed-node ego subgraphs for node-level tasks (reference
    ShaDowKHopSeqMapDataset, dataset_map.py:132-268)."""

    def __init__(
        self,
        big: Graph,
        depth_neighbors: Sequence[Tuple[int, int]],
        sample_idx: Optional[np.ndarray] = None,
        replace: bool = False,
        seed: int = 0,
        pretrain_mode: bool = False,
        task_mask_func=None,
        root_attr_mask: Optional[np.ndarray] = None,
    ):
        self.big = big
        self.depth_neighbors = list(depth_neighbors)
        self.sample_idx = (
            np.asarray(sample_idx, np.int64)
            if sample_idx is not None
            else np.arange(big.num_nodes, dtype=np.int64)
        )
        self.replace = replace
        self.seed = seed
        self.epoch = 0
        self.pretrain_mode = pretrain_mode
        # task_mask_func(graph) -> graph: dataset-specific feature masking
        # (reference dataset_map.py:169, e.g. ogbn-proteins species closure)
        self.task_mask_func = task_mask_func
        # x_mask semantics (dataset_map.py:253-258): during fine-tuning the
        # root node's attrs are multiplied by this mask to hide its label
        self.root_attr_mask = root_attr_mask
        self._indptr, self._indices, self._eid_order = build_csr_directed(
            big.num_nodes, big.edge_index
        )

    def __len__(self):
        return len(self.sample_idx)

    def reset_samples(self, epoch: int, seed: int = 0):
        self.epoch = epoch

    def __getitem__(self, i: int) -> Graph:
        seed_node = int(self.sample_idx[i])
        rng = np.random.default_rng((self.seed, self.epoch, seed_node))
        depth, fanout = self.depth_neighbors[rng.integers(len(self.depth_neighbors))]
        nodes = ego_k_hop(
            self._indptr, self._indices, [seed_node], depth, fanout, rng, self.replace
        )
        sub_ei, eids = induced_subgraph(self.big, nodes)
        root = int(np.searchsorted(nodes, seed_node))
        g = Graph(
            num_nodes=len(nodes),
            edge_index=sub_ei,
            node_attr=None if self.big.node_attr is None else self.big.node_attr[nodes].copy(),
            edge_attr=None if self.big.edge_attr is None else self.big.edge_attr[eids],
            y=None if self.big.y is None else np.asarray(self.big.y).reshape(self.big.num_nodes, -1)[nodes],
            root_n_id=np.asarray([root]),
            idx=int(i),
        )
        # node-aligned side arrays (e.g. ogbn-proteins node_species) ride
        # along into the subgraph (reference slices every node-sized tensor,
        # dataset_map.py:252-258)
        for key, arr in self.big.extra.items():
            if hasattr(arr, "shape") and arr.shape[:1] == (self.big.num_nodes,):
                g.extra[key] = arr[nodes]
        if (not self.pretrain_mode) and self.root_attr_mask is not None and g.node_attr is not None:
            g.node_attr[root] = g.node_attr[root] * self.root_attr_mask
        if self.task_mask_func is not None:
            g = self.task_mask_func(g)
        return g


# ---------------------------------------------------------------------------
# Negative sampling (edge level)
# ---------------------------------------------------------------------------
def sample_pos_edges(
    pos_edges: np.ndarray,
    percent: int,
    epoch: int,
    seed: int,
    pos_edge_attr: Optional[np.ndarray] = None,
):
    """Cyclic non-repeating positive subsets: with percent=p, epochs
    [0, 100/p) partition one permutation; the seed advances every cycle
    (reference sample_pos_edges, dataset_map.py:567-597). Target edge
    attrs (e.g. wikikg2 relations) are subset alongside."""
    if percent >= 100:
        return pos_edges, pos_edge_attr
    tot = pos_edges.shape[0]
    period = int(round(100 / percent))
    cyc_seed = seed + percent * epoch // 100
    perm = np.random.default_rng(cyc_seed).permutation(tot)
    cnt = int(round(tot * percent / 100.0))
    cyc_epoch = epoch % period
    sel = perm[cyc_epoch * cnt : (cyc_epoch + 1) * cnt]
    attr = None if pos_edge_attr is None else pos_edge_attr[sel]
    return pos_edges[sel], attr


def sample_neg_edges_global(
    num_nodes: int,
    existing: np.ndarray,  # [2, E] directed edge_index
    count: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Uniform (src, dst) pairs avoiding existing edges and self loops
    (PyG negative_sampling semantics used at dataset_map.py:632-640)."""
    existing_keys = set(
        (existing[0].astype(np.int64) * num_nodes + existing[1]).tolist()
    )
    out = np.empty((count, 2), np.int64)
    filled = 0
    while filled < count:
        n_draw = int((count - filled) * 1.5) + 8
        src = rng.integers(0, num_nodes, n_draw)
        dst = rng.integers(0, num_nodes, n_draw)
        keys = src * num_nodes + dst
        ok = (src != dst) & ~np.isin(
            keys, np.fromiter(existing_keys, np.int64, len(existing_keys))
        ) if len(existing_keys) < 1_000_000 else (src != dst)
        if len(existing_keys) >= 1_000_000:
            # large graphs: collision probability is negligible; match PyG's
            # approximate rejection behaviour
            ok = src != dst
        take = min(int(ok.sum()), count - filled)
        sel = np.flatnonzero(ok)[:take]
        out[filled : filled + take, 0] = src[sel]
        out[filled : filled + take, 1] = dst[sel]
        filled += take
    return out


def sample_neg_edges_local(
    pos_edges: np.ndarray,
    num_nodes: int,
    neg_ratio: int,
    rng: np.random.Generator,
    sample_heads: bool = True,
    sample_tails: bool = True,
    sample_edges: bool = False,
    pos_edge_attr: Optional[np.ndarray] = None,
    neg_edge_attr_candidates: Optional[np.ndarray] = None,
):
    """Head / tail / edge-type replacement negatives with edge-attr
    threading (reference sample_neg_edges_locally, dataset_map.py:626-683):
    head/tail corruption keeps the positive's edge attrs (e.g. the wikikg2
    relation); edge corruption keeps the endpoints and swaps the attrs for
    a random candidate row."""
    cands = []
    attrs = []
    has_attr = pos_edge_attr is not None
    if sample_tails:
        tails = rng.integers(0, num_nodes, pos_edges.shape[0])
        cands.append(np.stack([pos_edges[:, 0], tails], axis=1))
        if has_attr:
            attrs.append(pos_edge_attr)
    if sample_heads:
        heads = rng.integers(0, num_nodes, pos_edges.shape[0])
        cands.append(np.stack([heads, pos_edges[:, 1]], axis=1))
        if has_attr:
            attrs.append(pos_edge_attr)
    if sample_edges and has_attr and neg_edge_attr_candidates is not None:
        cands.append(pos_edges.copy())
        idx = rng.integers(0, len(neg_edge_attr_candidates), pos_edges.shape[0])
        attrs.append(np.asarray(neg_edge_attr_candidates)[idx])
    all_c = np.concatenate(cands, axis=0)
    want = neg_ratio * pos_edges.shape[0]
    sel = rng.permutation(all_c.shape[0])[:want]
    neg_attr = np.concatenate(attrs, axis=0)[sel] if attrs else None
    return all_c[sel], neg_attr


class EgoEdgeDataset:
    """Link-prediction ego subgraphs around edge endpoints (reference
    ShaDowKHopSeqFromEdgesMapDataset, dataset_map.py:271-553)."""

    def __init__(
        self,
        big: Graph,
        depth_neighbors: Sequence[Tuple[int, int]],
        pos_edges: Optional[np.ndarray] = None,  # [N_p, 2]; None -> from edge_index
        neg_edges: Optional[np.ndarray] = None,  # fixed eval negatives
        neg_ratio: int = 1,
        percent: int = 100,
        method: str = "global",  # global|local
        replace: bool = False,
        seed: int = 0,
        pretrain_mode: bool = False,
        pos_edge_attr: Optional[np.ndarray] = None,  # [N_p, De] target edge attrs
        neg_edge_attr: Optional[np.ndarray] = None,  # attrs of fixed eval negatives
        neg_edge_attr_candidates: Optional[np.ndarray] = None,  # [C, De]
        sample_edges: bool = False,  # local method: also corrupt the relation
        sample_wgt: bool = False,  # wikikg2 inverse-freq weights
        relation_col: int = 1,  # edge-attr column holding the relation id
    ):
        self.big = big
        self.depth_neighbors = list(depth_neighbors)
        self.neg_ratio = neg_ratio
        self.percent = percent
        self.method = method
        self.replace = replace
        self.seed = seed
        self.pretrain_mode = pretrain_mode
        self.sample_edges = sample_edges
        self.relation_col = relation_col
        if pos_edges is None:
            ei = big.edge_index
            mask = ei[0] < ei[1]
            pos_edges = ei[:, mask].T.astype(np.int64)
        self.pos_edges_all = np.asarray(pos_edges, np.int64)
        self.pos_edge_attr_all = (
            None if pos_edge_attr is None else np.asarray(pos_edge_attr, np.int64)
        )
        self.fixed_neg = None if neg_edges is None else np.asarray(neg_edges, np.int64)
        # fixed eval negatives pair 1:1 with the FULL positive set; combining
        # them with a percent-subsampled positive stream would mispair the
        # MRR grouping (reference uses percent only on the train split)
        assert self.fixed_neg is None or percent >= 100, (
            "fixed eval negatives require percent=100 (got "
            f"percent={percent}): subsampled positives cannot be paired "
            "with full-set structured negatives"
        )
        self.fixed_neg_attr = (
            None if neg_edge_attr is None else np.asarray(neg_edge_attr, np.int64)
        )
        self.neg_edge_attr_candidates = (
            None
            if neg_edge_attr_candidates is None
            else np.asarray(neg_edge_attr_candidates, np.int64)
        )
        # wikikg2 inverse-frequency sample weights (reference dataset_map.py:
        # 369-388): count(head, rel) and count(tail, -rel-1) over the FULL
        # train triple set, base count 4; per-sample weight computed at each
        # reset as sqrt(1 / (cnt_head + cnt_tail)) (dataset_map.py:451-469).
        self.train_count: Optional[Dict] = None
        if sample_wgt and not pretrain_mode and self.pos_edge_attr_all is not None:
            rel = self.pos_edge_attr_all[:, relation_col]
            h, t = self.pos_edges_all[:, 0], self.pos_edges_all[:, 1]
            hk = np.stack([h, rel], axis=1)
            tk = np.stack([t, -rel - 1], axis=1)
            keys, counts = np.unique(
                np.concatenate([hk, tk], axis=0), axis=0, return_counts=True
            )
            self.train_count = {
                (int(a), int(b)): 4 + int(c) for (a, b), c in zip(keys, counts)
            }
        self.wgt: Optional[np.ndarray] = None
        self._indptr, self._indices, _ = build_csr_directed(
            big.num_nodes, big.edge_index
        )
        self.epoch = 0
        self.reset_samples(0, seed)

    def reset_samples(self, epoch: int, seed: int = 42):
        self.epoch = epoch
        pos, pos_attr = sample_pos_edges(
            self.pos_edges_all, self.percent, epoch, seed, self.pos_edge_attr_all
        )
        rng = np.random.default_rng((seed, epoch, 7))
        neg_group = None  # per-negative: index of its positive (MRR grouping)
        neg_attr = None
        if self.fixed_neg is not None:
            neg = self.fixed_neg
            neg_attr = self.fixed_neg_attr
            if neg.ndim == 3:
                # structured negatives [N_pos, K, 2]: each row belongs to a
                # positive (ogbl-citation2/wikikg2 eval; ogb_utils.py:155-170)
                n_pos, k, _ = neg.shape
                neg_group = np.repeat(np.arange(n_pos), k)
                neg = neg.reshape(-1, 2)
                if neg_attr is None and self.pos_edge_attr_all is not None:
                    # eval negatives inherit their positive's relation
                    # (reference _get_reformatted_data_of_wikikg2,
                    # edge_formatting.py:54-83). Repeat from the FULL
                    # positive-attr set: fixed_neg rows align 1:1 with
                    # pos_edges_all, not with the percent-subset pos_attr.
                    assert n_pos == len(self.pos_edge_attr_all), (
                        f"structured negatives ({n_pos} rows) must align with "
                        f"the full positive set ({len(self.pos_edge_attr_all)})"
                    )
                    neg_attr = np.repeat(self.pos_edge_attr_all, k, axis=0)
        elif self.method == "global":
            neg = sample_neg_edges_global(
                self.big.num_nodes,
                self.big.edge_index,
                self.neg_ratio * pos.shape[0],
                rng,
            )
            if self.neg_edge_attr_candidates is not None:
                idx = rng.integers(0, len(self.neg_edge_attr_candidates), neg.shape[0])
                neg_attr = self.neg_edge_attr_candidates[idx]
        else:
            neg, neg_attr = sample_neg_edges_local(
                pos,
                self.big.num_nodes,
                self.neg_ratio,
                rng,
                sample_edges=self.sample_edges,
                pos_edge_attr=pos_attr,
                neg_edge_attr_candidates=self.neg_edge_attr_candidates,
            )
        y = np.concatenate(
            [np.ones(pos.shape[0], np.int64), np.zeros(neg.shape[0], np.int64)]
        )
        self.edges_with_y = np.concatenate(
            [np.concatenate([pos, neg], axis=0), y[:, None]], axis=1
        )
        # [N_p + N_e, De] target edge attrs (reference all_edge_attr)
        if pos_attr is not None and neg_attr is not None:
            self.all_edge_attr = np.concatenate([pos_attr, neg_attr], axis=0)
            assert self.all_edge_attr.shape[0] == self.edges_with_y.shape[0]
        else:
            self.all_edge_attr = None
        # inverse-freq weights per sample (reference dataset_map.py:451-469)
        if self.train_count is not None and self.all_edge_attr is not None:
            tc = self.train_count
            rel = self.all_edge_attr[:, self.relation_col]
            h, t = self.edges_with_y[:, 0], self.edges_with_y[:, 1]
            sums = np.fromiter(
                (
                    tc.get((int(hh), int(rr)), 4) + tc.get((int(tt), int(-rr - 1)), 4)
                    for hh, tt, rr in zip(h, t, rel)
                ),
                np.float64,
                len(h),
            )
            self.wgt = np.sqrt(1.0 / sums).astype(np.float32)
        # grouping key per sample: positives map to themselves
        if neg_group is not None:
            self.group_idx = np.concatenate([np.arange(pos.shape[0]), neg_group])
        else:
            self.group_idx = None

    def __len__(self):
        return self.edges_with_y.shape[0]

    def __getitem__(self, i: int) -> Graph:
        src, dst, y = (int(x) for x in self.edges_with_y[i])
        rng = np.random.default_rng((self.seed, self.epoch, int(i)))
        depth, fanout = self.depth_neighbors[rng.integers(len(self.depth_neighbors))]
        nodes = ego_k_hop(
            self._indptr, self._indices, [src, dst], depth, fanout, rng, self.replace
        )
        sub_ei, eids = induced_subgraph(self.big, nodes)
        r_src = int(np.searchsorted(nodes, src))
        r_dst = int(np.searchsorted(nodes, dst))
        if not self.pretrain_mode:
            # remove the target edge in both directions (dataset_map.py:556-564)
            keep = ~(
                ((sub_ei[0] == r_src) & (sub_ei[1] == r_dst))
                | ((sub_ei[0] == r_dst) & (sub_ei[1] == r_src))
            )
            sub_ei = sub_ei[:, keep]
            eids = eids[keep]
        g = Graph(
            num_nodes=len(nodes),
            edge_index=sub_ei,
            node_attr=None if self.big.node_attr is None else self.big.node_attr[nodes],
            edge_attr=None if self.big.edge_attr is None else self.big.edge_attr[eids],
            y=np.asarray([y], np.int64),
            root_n_id=np.asarray([r_src, r_dst]),
            idx=int(i),
        )
        if self.group_idx is not None:
            g.extra["eval_group"] = np.asarray([self.group_idx[i]], np.int64)
        if self.all_edge_attr is not None:
            # target edge attrs (e.g. the wikikg2 relation) for the tokenizer
            # to inject into the appended dst row (dataset_map.py:548-550)
            g.tgt_edge_attr = self.all_edge_attr[i]
        if self.wgt is not None:
            g.wgt = float(self.wgt[i])
        return g
