"""3D conformer pipeline tests: geometry sanity, dedup, Graph3D analog."""

import math

import numpy as np
import pytest

from mpnn_tpu import chem
from mpnn_tpu.chem import conformers as C
from mpnn_tpu.graphs.graph import from_mol_3d


class TestRotatable:
    def test_counts(self):
        assert C.count_rotatable_bonds(chem.parse_smiles("CCCC")) == 1
        assert C.count_rotatable_bonds(chem.parse_smiles("CC")) == 0
        assert C.count_rotatable_bonds(chem.parse_smiles("c1ccccc1")) == 0
        assert C.count_rotatable_bonds(
            chem.parse_smiles("CCOCC")) == 2  # C-O and O-C rotatable

    def test_conf_count_rule(self):
        assert C.conformer_count_for(0) == 50
        assert C.conformer_count_for(8) == 200
        assert C.conformer_count_for(13) == 300


class TestGeometry:
    def test_bond_lengths_near_ideal(self):
        mol = chem.parse_smiles("CC")
        confs = C.generate_conformers(mol, n_conf=3, refine_steps=300)
        coords, e = confs[0]
        d = np.linalg.norm(coords[0] - coords[1])
        assert 1.40 < d < 1.65          # C-C single ≈ 1.52 Å

    def test_angles_near_tetrahedral(self):
        mol = chem.parse_smiles("CC(C)C")  # isobutane heavy atoms
        confs = C.generate_conformers(mol, n_conf=3, refine_steps=400)
        coords, _ = confs[0]
        # angle at atom 1 (central) between atoms 0 and 2
        v1 = coords[0] - coords[1]
        v2 = coords[2] - coords[1]
        ang = math.degrees(math.acos(
            float(np.dot(v1, v2)
                  / (np.linalg.norm(v1) * np.linalg.norm(v2)))))
        assert 95 < ang < 125            # ideal 109.5

    def test_ring_is_planar_enough(self):
        mol = chem.parse_smiles("c1ccccc1")
        confs = C.generate_conformers(mol, n_conf=3, refine_steps=400)
        coords, _ = confs[0]
        # all C-C distances around the ring roughly equal
        ds = [np.linalg.norm(coords[i] - coords[(i + 1) % 6])
              for i in range(6)]
        assert max(ds) - min(ds) < 0.35

    def test_no_atom_clashes(self):
        mol = chem.parse_smiles("CCCCCC")
        confs = C.generate_conformers(mol, n_conf=5, refine_steps=300)
        coords, _ = confs[0]
        d = C.distance_matrix(coords)
        np.fill_diagonal(d, 10.0)
        assert d.min() > 1.0             # nothing overlapping


class TestDedupAndRmsd:
    def test_rmsd_zero_for_identical(self):
        rs = np.random.RandomState(0)
        a = rs.randn(5, 3)
        # rotated + translated copy
        theta = 0.7
        rot = np.array([[math.cos(theta), -math.sin(theta), 0],
                        [math.sin(theta), math.cos(theta), 0],
                        [0, 0, 1]])
        b = a @ rot.T + 3.0
        assert C.kabsch_rmsd(a, b) < 1e-6

    def test_dedup_reduces(self):
        mol = chem.parse_smiles("CC")    # rigid: everything dedups to ~1
        confs = C.generate_conformers(mol, n_conf=10, refine_steps=200)
        assert len(confs) <= 3

    def test_energy_sorted(self):
        mol = chem.parse_smiles("CCCC")
        confs = C.generate_conformers(mol, n_conf=6, refine_steps=100)
        energies = [e for _, e in confs]
        assert energies == sorted(energies)


class TestGraph3D:
    def test_from_mol_3d(self):
        mol = chem.parse_smiles("CCO")
        graphs = from_mol_3d(mol, label=1.0, n_conf=4)
        assert len(graphs) >= 1
        g = graphs[0]
        assert g.e_dist is not None and g.e_dist.shape == (3, 3)
        np.testing.assert_allclose(g.e_dist, g.e_dist.T, atol=1e-6)
        assert g.e_dist[0, 1] > 1.0      # bonded distance is physical
        assert g.label == 1.0
