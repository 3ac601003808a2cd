"""Offline molecule featurisation -> the graphs.npz contract.

TPU-native counterpart of the reference's rdkit-side custom datasets
(PygCustomMolDataset / PygChembl29Dataset / PygANI1Dataset,
src/utils/dataset_utils.py:723-1051, smiles2graph converters :85-243).
rdkit (C++) stays strictly OFFLINE preprocessing, exactly as in the
reference (SURVEY.md §2.1): run this script once on a machine with rdkit
installed, ship the resulting `graphs.npz` next to the training job, and
point `tokenization.data_dir/<name>/graphs.npz` at it.

    python tools/featurize_mol.py custom_mol --raw smiles.txt --out data/custom_mol/graphs.npz
    python tools/featurize_mol.py chembl29  --raw smiles.smi  --out data/Chembl29/graphs.npz
    python tools/featurize_mol.py ani1      --raw 'ani_gdb_s0*.h5' --out data/ANI1/graphs.npz
    # feature modes: basic | cc (chiral centers) | pos (+3D) | pos_cc

The npz-assembly layer (`collate_graphs`) is rdkit-free and unit-tested;
the featurizer itself imports rdkit lazily and raises a clear error when
it is absent (this image has no rdkit — zero-egress environment).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

NUM_CONFS = 5  # conformer count (reference dataset_utils.py:36 NUM_CONFS)
CHIRAL_CENTERS = ["R", "S", "r", "s", "?"]  # FindMolChiralCenters codes


# ---------------------------------------------------------------------------
# rdkit-dependent featurizers (offline only)
# ---------------------------------------------------------------------------
def _require_rdkit():
    try:
        from rdkit import Chem  # noqa: F401
    except ImportError as e:  # pragma: no cover - rdkit absent in CI image
        raise ImportError(
            "rdkit is required for offline molecule featurisation; run this "
            "script in an environment with rdkit installed (it is NOT needed "
            "on the training path)"
        ) from e


def smiles2graph(smiles: str, mode: str = "basic") -> Optional[Dict[str, np.ndarray]]:
    """SMILES -> dict(node_attr, edge_index, edge_attr[, pos]).

    Mirrors the reference's converters: `basic` is ogb's smiles2graph
    (mol2graph_basic, dataset_utils.py:85-126); `cc` swaps the chiral-tag
    column for a chiral-CENTER feature (mol2graph_cc :129-136); `pos`
    additionally embeds MMFF-optimised conformers and keeps the lowest-
    energy one (mol2coords :40-72). Returns None on conversion failure
    (smiles2graph_with_try :712-720 skips bad rows).
    """
    _require_rdkit()
    from ogb.utils.features import atom_to_feature_vector, bond_to_feature_vector
    from rdkit import Chem
    from rdkit.Chem import AllChem

    try:
        mol = Chem.MolFromSmiles(smiles)
        if mol is None:
            return None
        x = np.asarray(
            [atom_to_feature_vector(a) for a in mol.GetAtoms()], np.int64
        ).reshape(mol.GetNumAtoms(), -1)
        if "cc" in mode:
            # replace chiral-tag (col 1) with chiral-center index + 1
            cc = np.zeros(len(x), np.int64)
            for idx, typ in Chem.FindMolChiralCenters(mol):
                cc[idx] = CHIRAL_CENTERS.index(typ) + 1
            x[:, 1] = cc
        edges, feats = [], []
        for bond in mol.GetBonds():
            i, j = bond.GetBeginAtomIdx(), bond.GetEndAtomIdx()
            f = bond_to_feature_vector(bond)
            edges += [(i, j), (j, i)]
            feats += [f, f]
        edge_index = (
            np.asarray(edges, np.int64).T if edges else np.zeros((2, 0), np.int64)
        )
        edge_attr = (
            np.asarray(feats, np.int64) if feats else np.zeros((0, 3), np.int64)
        )
        out = {"node_attr": x, "edge_index": edge_index, "edge_attr": edge_attr}
        if mode.startswith("pos"):
            out["pos"] = _mol2coords(mol)
        return out
    except Exception:
        return None


def _mol2coords(mol) -> np.ndarray:  # pragma: no cover - rdkit-only path
    """Lowest-MMFF-energy conformer coordinates with a 2D fallback
    (reference mol2coords, dataset_utils.py:40-72)."""
    from rdkit import Chem
    from rdkit.Chem import AllChem

    try:
        new_mol = Chem.AddHs(mol)
        AllChem.EmbedMultipleConfs(new_mol, numConfs=NUM_CONFS, numThreads=1)
        res = AllChem.MMFFOptimizeMoleculeConfs(new_mol, numThreads=1)
        new_mol = Chem.RemoveHs(new_mol)
        index, _ = min(enumerate(res), key=lambda t: t[1])
        conf = new_mol.GetConformer(id=index)
    except Exception:
        new_mol = mol
        AllChem.Compute2DCoords(new_mol)
        conf = new_mol.GetConformer()
    if new_mol.GetAtomWithIdx(0).GetAtomicNum() == 0:
        return np.zeros((new_mol.GetNumAtoms(), 3), np.float32)
    return np.asarray(conf.GetPositions())[: new_mol.GetNumAtoms()].astype(np.float32)


# ---------------------------------------------------------------------------
# rdkit-free npz assembly (unit-tested)
# ---------------------------------------------------------------------------
def collate_graphs(
    graphs: Iterable[Optional[Dict[str, np.ndarray]]],
    ys: Optional[Iterable[float]] = None,
) -> Dict[str, np.ndarray]:
    """Concatenate per-graph dicts into the columnar npz contract
    (node_ptr/edge_ptr offsets; graph-local edge ids are rebased). Graphs
    that failed conversion (None) are skipped, with their y values."""
    node_attr, edge_attr, edge_cols, pos = [], [], [], []
    node_ptr, edge_ptr, kept_y = [0], [0], []
    ys = list(ys) if ys is not None else None
    for i, g in enumerate(graphs):
        if g is None:
            continue
        n = int(g["node_attr"].shape[0])
        node_attr.append(np.asarray(g["node_attr"], np.int32))
        edge_cols.append(np.asarray(g["edge_index"], np.int64) + node_ptr[-1])
        edge_attr.append(np.asarray(g["edge_attr"], np.int32))
        if "pos" in g:
            pos.append(np.asarray(g["pos"], np.float32))
        node_ptr.append(node_ptr[-1] + n)
        edge_ptr.append(edge_ptr[-1] + g["edge_index"].shape[1])
        kept_y.append(float(ys[i]) if ys is not None else 0.0)
    if not node_attr:
        raise ValueError("no graphs survived conversion")
    out = {
        "node_attr": np.concatenate(node_attr),
        "edge_index": np.concatenate(edge_cols, axis=1).astype(np.int32),
        "edge_attr": np.concatenate(edge_attr),
        "node_ptr": np.asarray(node_ptr, np.int64),
        "edge_ptr": np.asarray(edge_ptr, np.int64),
        "y": np.asarray(kept_y, np.float32)[:, None],
    }
    if pos:
        out["pos"] = np.concatenate(pos)
    return out


def _read_smiles(path: str) -> List[str]:
    with open(path) as f:
        return [line.strip().split()[0] for line in f if line.strip()]


def _ani1_pairs(pattern: str):
    """(smiles, first-conformer energy) pairs from ANI-1 HDF5 files
    (reference PygANI1Dataset.process, dataset_utils.py:993-1041; needs
    h5py — pyanitools' storage is plain HDF5 groups)."""
    import h5py  # pragma: no cover - offline dependency

    for path in sorted(glob.glob(pattern)):
        with h5py.File(path, "r") as f:
            for store in f.values():
                for entry in store.values():
                    smiles = "".join(
                        s.decode() if isinstance(s, bytes) else str(s)
                        for s in np.asarray(entry["smiles"]).reshape(-1)
                    )
                    yield smiles, float(np.asarray(entry["energies"]).reshape(-1)[0])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset", choices=["custom_mol", "chembl29", "ani1"])
    ap.add_argument("--raw", required=True, help="smiles file (or h5 glob for ani1)")
    ap.add_argument("--out", required=True, help="output graphs.npz path")
    ap.add_argument("--mode", default="basic", choices=["basic", "cc", "pos", "pos_cc"])
    args = ap.parse_args(argv)

    if args.dataset == "ani1":
        pairs = list(_ani1_pairs(args.raw))
        smiles = [s for s, _ in pairs]
        ys = [e for _, e in pairs]
    else:
        smiles = _read_smiles(args.raw)
        ys = [0.0] * len(smiles)

    print(f"converting {len(smiles)} molecules ({args.mode})...")
    graphs = [smiles2graph(s, args.mode) for s in smiles]
    skipped = sum(g is None for g in graphs)
    out = collate_graphs(graphs, ys)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(
        f"wrote {len(out['node_ptr']) - 1} graphs "
        f"({skipped} skipped) -> {args.out}"
    )


if __name__ == "__main__":
    sys.exit(main())
