"""tools/featurize_mol.py executed END TO END against an rdkit API stub.

Like test_convert_ogb_roundtrip: rdkit can't run here (zero egress), so
the featurizer was "written but never executed" (r4 verdict L0). The stub
mirrors exactly the rdkit/ogb surface the tool consumes — MolFromSmiles,
atom/bond iteration, FindMolChiralCenters, the conformer-embedding chain
of _mol2coords, and ogb's atom/bond feature vectors — over a toy SMILES
grammar (each letter an atom, consecutive letters bonded). The CLI main
then runs for real, and the emitted graphs.npz reads back through the
custom_mol dataset reader. Only rdkit's chemistry itself stays untested.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from graphgpt_tpu.config import Config


class _Atom:
    def __init__(self, sym, idx):
        self.sym, self.idx = sym, idx

    def GetAtomicNum(self):
        return {"C": 6, "N": 7, "O": 8}.get(self.sym, 6)


class _Bond:
    def __init__(self, i, j):
        self.i, self.j = i, j

    def GetBeginAtomIdx(self):
        return self.i

    def GetEndAtomIdx(self):
        return self.j


class _Conf:
    def __init__(self, n, seed=0):
        self._pos = np.random.default_rng(seed).normal(size=(n, 3))

    def GetPositions(self):
        return self._pos


class _Mol:
    def __init__(self, smiles):
        self.smiles = smiles
        self.atoms = [_Atom(s, i) for i, s in enumerate(smiles)]

    def GetAtoms(self):
        return self.atoms

    def GetNumAtoms(self):
        return len(self.atoms)

    def GetBonds(self):
        return [_Bond(i, i + 1) for i in range(len(self.atoms) - 1)]

    def GetAtomWithIdx(self, i):
        return self.atoms[i]

    def GetConformer(self, id=0):
        return _Conf(len(self.atoms), seed=id)


def _install_stubs(monkeypatch):
    chem = types.ModuleType("rdkit.Chem")
    chem.MolFromSmiles = lambda s: _Mol(s) if s and s.isalpha() else None
    chem.FindMolChiralCenters = lambda m: [(0, "R")] if len(m.atoms) > 2 else []
    chem.AddHs = lambda m: m
    chem.RemoveHs = lambda m: m
    allchem = types.ModuleType("rdkit.Chem.AllChem")
    allchem.EmbedMultipleConfs = lambda m, numConfs, numThreads: None
    allchem.MMFFOptimizeMoleculeConfs = lambda m, numThreads: [
        (0, float(i)) for i in range(3)
    ]
    allchem.Compute2DCoords = lambda m: None
    chem.AllChem = allchem
    rdkit = types.ModuleType("rdkit")
    rdkit.Chem = chem
    monkeypatch.setitem(sys.modules, "rdkit", rdkit)
    monkeypatch.setitem(sys.modules, "rdkit.Chem", chem)
    monkeypatch.setitem(sys.modules, "rdkit.Chem.AllChem", allchem)
    feats = types.ModuleType("ogb.utils.features")
    feats.atom_to_feature_vector = lambda a: [a.GetAtomicNum()] + [a.idx % 4] * 8
    feats.bond_to_feature_vector = lambda b: [b.i % 3, 0, 1]
    ogb = types.ModuleType("ogb")
    utils = types.ModuleType("ogb.utils")
    utils.features = feats
    ogb.utils = utils
    monkeypatch.setitem(sys.modules, "ogb", ogb)
    monkeypatch.setitem(sys.modules, "ogb.utils", utils)
    monkeypatch.setitem(sys.modules, "ogb.utils.features", feats)


def test_featurize_custom_mol_cli_roundtrip(tmp_path, monkeypatch):
    _install_stubs(monkeypatch)
    from tools import featurize_mol

    raw = tmp_path / "mols.smi"
    raw.write_text("CCO\nCNCC\nOC\nC1invalid!\nNNNO\n")
    out = tmp_path / "custom_mol" / "graphs.npz"
    featurize_mol.main(
        ["custom_mol", "--raw", str(raw), "--out", str(out), "--mode", "pos_cc"]
    )
    npz = np.load(out)
    # the invalid SMILES is skipped; 4 survive
    assert len(npz["node_ptr"]) - 1 == 4
    assert npz["node_attr"].shape[1] == 9
    assert npz["edge_attr"].shape[1] == 3
    assert npz["pos"].shape == (npz["node_attr"].shape[0], 3)
    # chiral-center column rewrite: col 1 holds center-index+1 / 0
    first = npz["node_attr"][: npz["node_ptr"][1]]
    assert first[0, 1] == 1 and np.all(first[1:, 1] == 0)

    from graphgpt_tpu import readers

    cfg = Config()
    cfg.tokenization.data_dir = str(tmp_path)
    ds = readers.read_dataset("custom_mol", cfg)
    assert len(ds) > 0
    g = ds[0]
    assert g.num_nodes >= 2 and g.pos is not None


def test_featurize_ani1_h5_cli(tmp_path, monkeypatch):
    """The ANI-1 path end to end: a real HDF5 file in pyanitools' group
    layout, energies as labels, through the same stubbed featurizer."""
    import h5py

    _install_stubs(monkeypatch)
    from tools import featurize_mol

    h5 = tmp_path / "ani_gdb_s01.h5"
    with h5py.File(h5, "w") as f:
        store = f.create_group("gdb11_s01")
        for i, (smi, e) in enumerate([("CCO", -1.5), ("CNC", -2.25)]):
            g = store.create_group(f"mol{i}")
            g.create_dataset(
                "smiles", data=np.array([c.encode() for c in smi])
            )
            g.create_dataset("energies", data=np.asarray([e, e + 1.0]))
    out = tmp_path / "ani1" / "graphs.npz"
    featurize_mol.main(
        ["ani1", "--raw", str(tmp_path / "ani_gdb_*.h5"), "--out", str(out)]
    )
    npz = np.load(out)
    assert len(npz["node_ptr"]) - 1 == 2
    np.testing.assert_allclose(npz["y"].reshape(-1), [-1.5, -2.25])
