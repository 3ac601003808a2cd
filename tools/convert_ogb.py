#!/usr/bin/env python
"""Convert OGB datasets into the graphgpt_tpu npz contract.

Run this in an environment with `ogb` / `torch_geometric` installed (they
are NOT needed at training time); copy the resulting npz files into
`<data_dir>/<name>/` for graphgpt_tpu.readers.

Graph-level:
    python tools/convert_ogb.py graph pcqm4m-v2 ./out
    python tools/convert_ogb.py graph ogbg-molhiv ./out
Edge-level:
    python tools/convert_ogb.py edge ogbl-ppa ./out
Node-level:
    python tools/convert_ogb.py node ogbn-arxiv ./out

Node encodings mirror the reference readers (src/data/_readers/*):
  - ogbl-ppa: one-hot species -> [global_id, local_species_id] node attrs
    (node_encoding.py:5-21)
  - ogbn-proteins: species -> global/local ids, edge attrs quantised x1000
    (node_level.py:292)
"""

import argparse
import os
import sys

import numpy as np


def convert_graph_level(name: str, out_dir: str):
    if name == "pcqm4m-v2":
        from ogb.lsc import PygPCQM4Mv2Dataset

        ds = PygPCQM4Mv2Dataset(root="ogb_raw")
        split = ds.get_idx_split()
        splits = {k: split[k].numpy() for k in ("train", "valid") if k in split}
        if "test-dev" in split:
            splits["test"] = split["test-dev"].numpy()
    else:
        from ogb.graphproppred import PygGraphPropPredDataset

        ds = PygGraphPropPredDataset(name=name, root="ogb_raw")
        split = ds.get_idx_split()
        splits = {k: split[k].numpy() for k in ("train", "valid", "test")}

    node_ptr = [0]
    edge_ptr = [0]
    xs, eis, eas, ys, poss = [], [], [], [], []
    for g in ds:
        # npz contract: edges carry GLOBAL (node_ptr-offset) node ids
        eis.append(g.edge_index.numpy() + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + g.num_nodes)
        edge_ptr.append(edge_ptr[-1] + g.edge_index.shape[1])
        xs.append(g.x.numpy())
        eas.append(g.edge_attr.numpy())
        ys.append(np.asarray(g.y).reshape(-1))
        if hasattr(g, "pos") and g.pos is not None:
            poss.append(g.pos.numpy())
    payload = {
        "node_ptr": np.asarray(node_ptr, np.int64),
        "edge_ptr": np.asarray(edge_ptr, np.int64),
        "node_attr": np.concatenate(xs).astype(np.int32),
        "edge_index": np.concatenate(eis, axis=1).astype(np.int32),
        "edge_attr": np.concatenate(eas).astype(np.int32),
        "y": np.stack(ys).astype(np.float32),
    }
    if poss:
        payload["pos"] = np.concatenate(poss).astype(np.float32)
    for k, v in splits.items():
        payload[f"{k}_idx"] = v.astype(np.int64)
    dest = os.path.join(out_dir, name)
    os.makedirs(dest, exist_ok=True)
    np.savez(os.path.join(dest, "graphs.npz"), **payload)
    print(f"wrote {dest}/graphs.npz ({len(ds)} graphs)")


def convert_edge_level(name: str, out_dir: str):
    from ogb.linkproppred import PygLinkPropPredDataset

    ds = PygLinkPropPredDataset(name=name, root="ogb_raw")
    data = ds[0]
    split_edge = ds.get_edge_split()
    payload = {
        "edge_index": data.edge_index.numpy().astype(np.int32),
        "num_nodes": np.int64(data.num_nodes),
    }
    if name == "ogbl-ppa":
        # one-hot species -> [global id, local species id] (reference
        # node_encoding.py:5-21)
        x = data.x.numpy()
        species = x.argmax(1)
        payload["node_attr"] = np.stack(
            [np.arange(len(species)), species], axis=1
        ).astype(np.int32)
    elif data.x is not None:
        payload["node_attr"] = data.x.numpy().astype(np.int32)
    for split in ("train", "valid", "test"):
        d = split_edge[split]
        if "edge" in d:
            payload[f"{split}_edge"] = d["edge"].numpy().astype(np.int64)
        if "edge_neg" in d:
            payload[f"{split}_edge_neg"] = d["edge_neg"].numpy().astype(np.int64)
        if "source_node" in d:  # citation2: per-positive structured negatives
            src = d["source_node"].numpy()
            tgt = d["target_node"].numpy()
            payload[f"{split}_edge"] = np.stack([src, tgt], axis=1).astype(np.int64)
            if "target_node_neg" in d:
                negs = d["target_node_neg"].numpy()  # [N, K]
                payload[f"{split}_edge_neg"] = np.stack(
                    [np.repeat(src[:, None], negs.shape[1], 1), negs], axis=2
                ).astype(np.int64)  # [N, K, 2]
        if "head" in d:  # wikikg2 triples
            payload[f"{split}_edge"] = np.stack(
                [d["head"].numpy(), d["tail"].numpy()], axis=1
            ).astype(np.int64)
            payload[f"{split}_relation"] = d["relation"].numpy().astype(np.int64)
            if "head_neg" in d:
                tail = d["tail"].numpy()
                head = d["head"].numpy()
                hn = d["head_neg"].numpy()
                tn = d["tail_neg"].numpy()
                # merge head- and tail-replacement negatives per positive
                # (reference ogb_utils.py:105-128)
                neg_h = np.stack([hn, np.repeat(tail[:, None], hn.shape[1], 1)], axis=2)
                neg_t = np.stack([np.repeat(head[:, None], tn.shape[1], 1), tn], axis=2)
                payload[f"{split}_edge_neg"] = np.concatenate(
                    [neg_h, neg_t], axis=1
                ).astype(np.int64)
    dest = os.path.join(out_dir, name)
    os.makedirs(dest, exist_ok=True)
    np.savez(os.path.join(dest, "big_graph.npz"), **payload)
    print(f"wrote {dest}/big_graph.npz")


def convert_node_level(name: str, out_dir: str):
    from ogb.nodeproppred import PygNodePropPredDataset

    ds = PygNodePropPredDataset(name=name, root="ogb_raw")
    data = ds[0]
    split = ds.get_idx_split()
    payload = {
        "edge_index": data.edge_index.numpy().astype(np.int32),
        "num_nodes": np.int64(data.num_nodes),
        "y": data.y.numpy(),
    }
    if name == "ogbn-proteins":
        species = data.node_species.numpy().reshape(-1)
        # x = [species value (global id), 1-based running count within the
        # species (local id)] (reference _get_global_local_id_from_enumerate,
        # node_encoding.py:24-42)
        uniq, inv = np.unique(species, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        group_starts = np.searchsorted(sorted_inv, np.arange(len(uniq)))
        local = np.empty(len(inv), np.int64)
        local[order] = np.arange(len(inv)) - group_starts[sorted_inv] + 1
        payload["node_attr"] = np.stack([species, local], axis=1).astype(np.int32)
        payload["node_species"] = species.astype(np.int64)
        # continuous edge attrs quantised x1000 - 1 (node_level.py:292)
        payload["edge_attr"] = (data.edge_attr.numpy() * 1000 - 1).astype(np.int32)
    elif data.x is not None:
        payload["node_attr"] = data.x.numpy().astype(np.int32)
    for k in ("train", "valid", "test"):
        payload[f"{k}_idx"] = split[k].numpy().astype(np.int64)
    dest = os.path.join(out_dir, name)
    os.makedirs(dest, exist_ok=True)
    np.savez(os.path.join(dest, "big_graph.npz"), **payload)
    print(f"wrote {dest}/big_graph.npz")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("level", choices=["graph", "edge", "node"])
    ap.add_argument("name")
    ap.add_argument("out_dir")
    args = ap.parse_args()
    {
        "graph": convert_graph_level,
        "edge": convert_edge_level,
        "node": convert_node_level,
    }[args.level](args.name, args.out_dir)
