"""Load the reference tokenizer stack from /root/reference as a test oracle.

Builds a synthetic package ``refsrc`` whose submodules execute the
reference's own source files, with small stand-ins for external packages
absent in this environment (torch_geometric, ogb, the omegaconf-based conf
package). The oracle is used strictly behaviourally: same graph + same
vocab must yield the same token rows (fixed walk) and the same walk
statistics (random walks) as our tokenizer.

Reference anchors: src/data/tokenizer.py:897-1186 (StackedGSTTokenizer),
src/utils/nx_utils.py:224-435 (Euler path + re-indexing).
"""

from __future__ import annotations

import importlib
import os
import sys
import types
from typing import Optional

import networkx as nx
import numpy as np

REF = "/root/reference/src"


def available() -> bool:
    return os.path.isdir(REF)


# ---------------------------------------------------------------------------
# torch_geometric stand-ins (only the surface the oracle modules touch)
# ---------------------------------------------------------------------------
class Data:
    """Minimal torch_geometric.data.Data: attribute bag + num_nodes."""

    def __init__(
        self,
        x=None,
        edge_index=None,
        edge_attr=None,
        y=None,
        pos=None,
        num_nodes: Optional[int] = None,
        **kw,
    ):
        self.x = x
        self.edge_index = edge_index
        self.edge_attr = edge_attr
        self.y = y
        if pos is not None:
            self.pos = pos
        self.__num_nodes = num_nodes
        for k, v in kw.items():
            setattr(self, k, v)

    @property
    def num_nodes(self):
        if self.__num_nodes is not None:
            return self.__num_nodes
        if self.x is not None:
            return int(self.x.shape[0])
        return int(self.edge_index.max()) + 1

    def __getitem__(self, key):
        return getattr(self, key)

    def __setitem__(self, key, value):
        setattr(self, key, value)

    def clone(self):
        import copy

        return copy.copy(self)


def to_networkx(data, to_undirected=None, **kw):
    """torch_geometric.utils.to_networkx for the oracle's call pattern:
    ``to_networkx(graph, to_undirected="upper")`` keeps edges with u<=v in
    an undirected nx.Graph (both directions are present in the input)."""
    G = nx.Graph() if to_undirected else nx.DiGraph()
    G.add_nodes_from(range(data.num_nodes))
    ei = np.asarray(data.edge_index)
    for u, v in zip(ei[0], ei[1]):
        u, v = int(u), int(v)
        if to_undirected == "upper" and u > v:
            continue
        if to_undirected == "lower" and u < v:
            continue
        G.add_edge(u, v)
    return G


def _register(name: str, mod: types.ModuleType):
    sys.modules[name] = mod
    if "." in name:
        parent, _, child = name.rpartition(".")
        setattr(sys.modules[parent], child, mod)


_cache: Optional[types.SimpleNamespace] = None


def load_oracle() -> types.SimpleNamespace:
    """Import the reference tokenizer modules under the ``refsrc`` package."""
    global _cache
    if _cache is not None:
        return _cache

    # --- external stand-ins (only if the real ones are absent) -----------
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")
        tgu = types.ModuleType("torch_geometric.utils")
        tgd.Data = Data

        class _Dataset:  # placeholder base class, never instantiated
            pass

        tgd.Dataset = _Dataset
        tgd.InMemoryDataset = _Dataset
        tgu.to_networkx = to_networkx
        _register("torch_geometric", tg)
        _register("torch_geometric.data", tgd)
        _register("torch_geometric.utils", tgu)
    if "ogb" not in sys.modules:
        ogb = types.ModuleType("ogb")
        ogbu = types.ModuleType("ogb.utils")
        ogbf = types.ModuleType("ogb.utils.features")
        # public OGB molecule feature cardinalities (ogb.utils.features)
        ogbf.get_atom_feature_dims = lambda: [119, 5, 12, 12, 10, 6, 6, 2, 2]
        ogbf.get_bond_feature_dims = lambda: [5, 6, 2]
        _register("ogb", ogb)
        _register("ogb.utils", ogbu)
        _register("ogb.utils.features", ogbf)

    # --- refsrc package skeleton -----------------------------------------
    root = types.ModuleType("refsrc")
    root.__path__ = [REF]
    sys.modules["refsrc"] = root

    utils_pkg = types.ModuleType("refsrc.utils")
    utils_pkg.__path__ = [os.path.join(REF, "utils")]
    _register("refsrc.utils", utils_pkg)

    data_pkg = types.ModuleType("refsrc.data")
    data_pkg.__path__ = [os.path.join(REF, "data")]
    _register("refsrc.data", data_pkg)

    conf = types.ModuleType("refsrc.conf")
    # mirror of src/conf/base_configs.py:11-25 (config data, not code)
    conf.TASK_TYPES = {
        "pretrain",
        "pretrain-smtp",
        "pretrain-mlm",
        "pretrain-mlm-coord",
        "pretrain-coord",
        "pretrain-ltp",
        "pretrain-euler",
        "pretrain-cl",
        "pretrain-coord-cl",
        "node",
        "nodev2",
        "edge",
        "graph",
    }

    class TrainingConfig:  # type-hint stand-in only
        pass

    conf.TrainingConfig = TrainingConfig
    _register("refsrc.conf", conf)

    # --- load the real reference modules ----------------------------------
    importlib.import_module("refsrc.utils.control_flow")
    nxu = importlib.import_module("refsrc.utils.nx_utils")
    importlib.import_module("refsrc.utils.mol_utils")
    importlib.import_module("refsrc.utils.attn_mask_utils")
    tu = importlib.import_module("refsrc.utils.tokenizer_utils")
    importlib.import_module("refsrc.utils.instruct_tuning_utils")
    # names the tokenizer imports from the package root
    utils_pkg.graph2path = nxu.graph2path
    utils_pkg.prepare_inputs_for_task = tu.prepare_inputs_for_task
    importlib.import_module("refsrc.data.vocab_builder")
    rtok = importlib.import_module("refsrc.data.tokenizer")

    _cache = types.SimpleNamespace(
        tokenizer=rtok, nx_utils=nxu, tokenizer_utils=tu, Data=Data
    )
    return _cache


# ---------------------------------------------------------------------------
# Canonical tokenization config for the shipped pcqm4m-v2 vocab asset
# (mirrors configs/tokenization/graph_lvl/pcqm4m-v2.yaml, scope 64)
# ---------------------------------------------------------------------------
def pcqm_tokenizer_config(task_type: str = "pretrain-mlm", cyclic: int = 0):
    return {
        "name_or_path": "/root/reference/data/OGB/pcqm4m-v2",
        "vocab_file": "vocab",
        "dataset": "molecule",
        "attr_world_identifier": "molecule",
        "task_type": task_type,
        "add_eos": True,
        "label_tokens_to_pad": [],
        "semantics": {
            "attr_assignment": "first",
            "attr_shuffle": False,
            "node": {
                "discrete": "x",
                "dim": 9,
                "continuous": None,
                "ignored_val": None,
                "embed": None,
                "embed_dim": None,
            },
            "edge": {
                "discrete": "edge_attr",
                "dim": 3,
                "continuous": None,
                "ignored_val": None,
                "embed": None,
                "embed_dim": None,
            },
            "graph": {
                "discrete": None,
                "continuous": None,
                "ignored_val": None,
                "embed": None,
            },
            "common": {"reserved_token": []},
            "instructions": {"enable": False, "name": "molecule", "func": []},
        },
        "structure": {
            "nx": {"enable": False, "func": []},
            "node": {
                "bos_token": "<bos>",
                "eos_token": "<eos>",
                "new_node_token": "<new>",
                "node_scope": 64,
                "scope_base": 64,
                "cyclic": cyclic,
            },
            "edge": {
                "remove_edge_type_token": True,
                "in_token": "<edge_in>",
                "out_token": "<edge_out>",
                "bi_token": "<edge_bi>",
                "jump_token": "<edge_jump>",
            },
            "graph": {"summary_token": "<gsum>"},
            "common": {
                "mask_token": "<mask>",
                "icl_token": "<icl>",
                "sep_token": "<sep>",
                "reserved_token": [],
            },
        },
    }
