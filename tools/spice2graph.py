"""SPICE netlist -> circuit graph converter (offline preprocessing).

TPU-native replacement for the reference's SpiceCircuitDataset pipeline
(/root/reference/src/utils/spice2graph_full_utils.py and
dataset_utils.py:1640-1760): each device becomes a body node plus one node
per pin; body connects to its pins; pins connect directly to port nodes
and pairwise (clique) to pins sharing an internal net; pins sharing the
same port are also cliqued. Node features are type-symbol indices (v2
normalises symbols to device-type / pin-suffix classes).

Emits the repo's graph-level npz contract (graphgpt_tpu.readers):
    <out>/spice-circuit/graphs.npz  + x-elements_<ver>.txt

Usage:
    python tools/spice2graph.py <dataset_root> <out_dir> [--ver v2]
where <dataset_root> holds <i>/<i>.cir, <i>/Port<i>.txt, graph-labels.csv.
"""

from __future__ import annotations

import argparse
import os
import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

# device type -> (node-name prefix, pin suffixes)
DEVICE_PINS: Dict[str, Tuple[str, List[str]]] = {
    "pmos4": ("PM", ["_D", "_G", "_S", "_B"]),
    "nmos4": ("NM", ["_D", "_G", "_S", "_B"]),
    "npn": ("NPN", ["_C", "_B", "_E"]),
    "pnp": ("PNP", ["_C", "_B", "_E"]),
    "resistor": ("R", ["_P", "_N"]),
    "capacitor": ("C", ["_P", "_N"]),
    "inductor": ("L", ["_P", "_N"]),
    "diode": ("DIO", ["_P", "_N"]),
    "XOR": ("XOR", ["_A", "_B", "_VDD", "_VSS", "_Y"]),
    "PFD": ("PFD", ["_A", "_B", "_QA", "_QB", "_VDD", "_VSS"]),
    "INVERTER": ("INVERTER", ["_A", "_Q", "_VDD", "_VSS"]),
    "TRANSMISSION_GATE": (
        "TRANSMISSION_GATE",
        ["_A", "_B", "_C", "_VDD", "_VSS"],
    ),
}

_PREFIXES = sorted({p for p, _ in DEVICE_PINS.values()}, key=len, reverse=True)
_SYMBOL_RE = re.compile(
    r"^(" + "|".join(_PREFIXES) + r")(\d+)(_[A-Z]+)?$"
)


def read_netlist(path: str) -> List[List[str]]:
    """Token lists per line; parentheses stripped (reference read_netlist)."""
    out = []
    with open(path) as fh:
        for line in fh:
            parts = line.strip().replace("(", "").replace(")", "").split()
            if parts:
                out.append(parts)
    return out


def read_ports(path: str) -> List[str]:
    with open(path) as fh:
        return fh.readline().strip().split()


def normalize_symbol(symbol: str) -> str:
    """'PM12' -> 'PM', 'PM12_D' -> '_D'; ports/nets unchanged (reference
    normalize_all, v2 vocabulary)."""
    m = _SYMBOL_RE.match(symbol)
    if not m:
        return symbol
    prefix, _, suffix = m.groups()
    return suffix if suffix else prefix


def netlist_to_graph(
    netlist: Sequence[Sequence[str]], ports: Sequence[str]
) -> Tuple[List[str], np.ndarray]:
    """Returns (node_names, edge_index [2, E] undirected-symmetric).

    Connection semantics mirror the reference build_connection_matrix:
    ports are standalone nodes; each device contributes body+pins with
    body-pin edges; a pin whose net is an existing node (port) links
    directly; pins sharing an internal net form a clique; pins sharing a
    port form a clique too."""
    nodes: List[str] = list(ports)
    counters: Dict[str, int] = {}
    edges: set = set()
    net_pins: Dict[str, List[str]] = {}
    port_pins: Dict[str, List[str]] = {}

    def add_edge(a: str, b: str):
        ia, ib = nodes.index(a), nodes.index(b)
        if ia != ib:
            edges.add((ia, ib))
            edges.add((ib, ia))

    for component in netlist:
        ctype = component[-1]
        if ctype not in DEVICE_PINS:
            continue
        prefix, suffixes = DEVICE_PINS[ctype]
        counters[ctype] = counters.get(ctype, 0) + 1
        body = f"{prefix}{counters[ctype]}"
        pins = [f"{body}{s}" for s in suffixes]
        nodes.append(body)
        nodes.extend(pins)
        for pin in pins:
            add_edge(body, pin)
        # nets of this device: tokens between the instance name and type
        nets = component[1:-1]
        for pin, net in zip(pins, nets):
            if net in nodes:
                add_edge(pin, net)
                if net in ports:
                    port_pins.setdefault(net, []).append(pin)
            else:
                net_pins.setdefault(net, []).append(pin)
    for pins in net_pins.values():
        for i in range(len(pins)):
            for j in range(i + 1, len(pins)):
                add_edge(pins[i], pins[j])
    for pins in port_pins.values():
        for i in range(len(pins)):
            for j in range(i + 1, len(pins)):
                add_edge(pins[i], pins[j])
    if edges:
        edge_index = np.asarray(sorted(edges), np.int64).T
    else:
        edge_index = np.zeros((2, 0), np.int64)
    return nodes, edge_index


def convert(root: str, out_dir: str, ver: str = "v2") -> str:
    labels_path = os.path.join(root, "graph-labels.csv")
    with open(labels_path) as fh:
        labels = [int(x.strip()) for x in fh if x.strip()]
    x_elements: List[str] = []
    node_attr, edge_cols, node_ptr, edge_ptr, ys = [], [], [0], [0], []
    j = 0
    i = 0
    while True:
        i += 1
        netlist_file = os.path.join(root, str(i), f"{i}.cir")
        port_file = os.path.join(root, str(i), f"Port{i}.txt")
        if not os.path.isfile(netlist_file):
            if j >= len(labels):
                break
            if i > len(labels) * 4 + 16:  # tolerate gaps, bail eventually
                break
            continue
        nodes, edge_index = netlist_to_graph(
            read_netlist(netlist_file), read_ports(port_file)
        )
        symbols = [normalize_symbol(n) for n in nodes] if ver == "v2" else nodes
        for ele in symbols:
            if ele not in x_elements:
                x_elements.append(ele)
        node_attr.append(np.asarray([x_elements.index(e) for e in symbols], np.int32))
        edge_cols.append(edge_index + node_ptr[-1])
        node_ptr.append(node_ptr[-1] + len(nodes))
        edge_ptr.append(edge_ptr[-1] + edge_index.shape[1])
        ys.append(labels[j])
        j += 1
        if j >= len(labels):
            break
    out = os.path.join(out_dir, "spice-circuit")
    os.makedirs(out, exist_ok=True)
    np.savez(
        os.path.join(out, "graphs.npz"),
        node_attr=np.concatenate(node_attr)[:, None],
        edge_index=np.concatenate(edge_cols, axis=1),
        node_ptr=np.asarray(node_ptr, np.int64),
        edge_ptr=np.asarray(edge_ptr, np.int64),
        y=np.asarray(ys, np.float32)[:, None],
    )
    with open(os.path.join(out, f"x-elements_{ver}.txt"), "w") as fh:
        fh.writelines(f"{e}\n" for e in x_elements)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("out_dir")
    ap.add_argument("--ver", default="v2", choices=["v1", "v2"])
    args = ap.parse_args()
    out = convert(args.root, args.out_dir, args.ver)
    print(f"wrote {out}")
