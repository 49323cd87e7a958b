"""Graph containers produced by featurization and consumed by the batch
compiler. Two forms:

  * MolGraph  — per-molecule arrays (dense afm/nafm/bfm/adj + COO edges),
                the analog of the reference Graph2D (mol_graph.py:93-155)
                with the sparse form added for the TPU path.
  * from_mol  — featurize + build in one step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from mpnn_tpu.chem.featurize import (
    atom_features, bond_features_dense, edge_list,
)
from mpnn_tpu.chem.mol import Mol
from mpnn_tpu.graphs.encoders import GraphEncoder


@dataclasses.dataclass
class MolGraph:
    afm: np.ndarray                 # (A, 4) raw or (A, enc) encoded
    nafm: np.ndarray                # (A, 3) raw / scaled
    bfm: np.ndarray                 # (A, A, 4) raw or (A, A, enc) encoded
    adj: np.ndarray                 # (A, A)
    edge_src: np.ndarray            # (2E,) int32
    edge_dst: np.ndarray            # (2E,) int32
    edge_feats: np.ndarray          # (2E, 4) raw or (2E, enc) encoded
    label: object = None
    affinity: Optional[float] = None
    is_encoded: bool = False
    e_dist: Optional[np.ndarray] = None     # (A, A) 3D distances (Graph3D)

    @property
    def num_atoms(self) -> int:
        return self.afm.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_src.shape[0]

    def encode(self, ge: GraphEncoder) -> "MolGraph":
        """Apply fitted encoders (mol_graph.py:136-141). Idempotent."""
        if self.is_encoded:
            return self
        self.afm = ge.encode_afm(self.afm)
        self.nafm = ge.scale_nafm(self.nafm)
        self.bfm = ge.encode_bfm(self.bfm, self.adj)
        if self.num_edges:
            self.edge_feats = ge.encode_edge_feats(self.edge_feats)
        else:
            self.edge_feats = np.zeros((0, ge.bond_width()), np.float32)
        self.is_encoded = True
        return self


def from_mol(mol: Mol, label=None, affinity=None) -> MolGraph:
    afm, nafm = atom_features(mol)
    bfm, adj = bond_features_dense(mol)
    src, dst, feats = edge_list(mol)
    return MolGraph(afm=afm, nafm=nafm, bfm=bfm, adj=adj,
                    edge_src=src, edge_dst=dst, edge_feats=feats,
                    label=label, affinity=affinity)


def from_mol_3d(mol: Mol, label=None, affinity=None,
                n_conf=None, seed: int = 317) -> list:
    """Conformer-ensemble graphs — one MolGraph per surviving conformer,
    each carrying its 3D distance matrix (the reference's Mol2DGraph.to_3d →
    [Mol3DGraph], mol_graph.py:250-307)."""
    import dataclasses
    from mpnn_tpu.chem.conformers import distance_matrix, generate_conformers
    base = from_mol(mol, label=label, affinity=affinity)
    out = []
    for coords, _energy in generate_conformers(mol, n_conf=n_conf,
                                               seed=seed):
        g = dataclasses.replace(base, e_dist=distance_matrix(coords))
        out.append(g)
    return out


# bond-type ids for the GGNN message family --------------------------------

BOND_TYPE_IDS = {2: 1, 3: 2, 4: 3, 6: 4}    # 2·order → type id; 0 = no bond


def attach_edge_types(graphs):
    """Derive integer bond-type ids (GGNN input, ggnn_msg_pass.py:20) from
    the RAW doubled bond order (featurize.py: 2·order ∈ {2,3,4,6} for
    single/aromatic/double/triple). Sets g.edge_types (E,) int32 and
    g.bond_type_matrix (A, A) int32. Call BEFORE encode() (it reads the raw
    feature column)."""
    for g in graphs:
        if g.is_encoded:
            raise ValueError("attach_edge_types needs RAW bond features; "
                             "call before encode()")
        orders = g.edge_feats[:, 0].astype(np.int64)
        types = np.asarray([BOND_TYPE_IDS.get(int(o), 4) for o in orders],
                           np.int32)
        g.edge_types = types
        mat = np.zeros_like(g.adj, dtype=np.int32)
        mat[g.edge_src, g.edge_dst] = types
        g.bond_type_matrix = mat
    return graphs
