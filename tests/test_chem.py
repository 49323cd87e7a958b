"""Chemistry-layer tests: SMILES parsing, perception (aromaticity, implicit
H, hybridization, rings), featurization, ECFP. Ground truths are standard
chemistry facts (checked against RDKit values offline)."""

import numpy as np
import pytest

from mpnn_tpu import chem
from mpnn_tpu.chem.mol import (
    HYB_SP, HYB_SP2, HYB_SP3,
)


def P(s):
    m = chem.parse_smiles(s)
    assert m is not None
    return m


class TestParsing:
    def test_basic_chain(self):
        m = P("CCO")
        assert m.num_atoms() == 3
        assert [a.symbol for a in m.atoms] == ["C", "C", "O"]
        assert len(m.bonds) == 2

    def test_branches_and_orders(self):
        m = P("CC(=O)O")  # acetic acid
        assert m.num_atoms() == 4
        co = m.get_bond(1, 2)
        assert co.order == 2.0
        assert m.get_bond(1, 3).order == 1.0

    def test_ring_closure(self):
        m = P("C1CCCCC1")  # cyclohexane
        assert m.num_atoms() == 6
        assert len(m.bonds) == 6
        assert all(a.in_ring for a in m.atoms)
        assert all(not a.aromatic for a in m.atoms)

    def test_two_letter_and_percent(self):
        m = P("ClC%10CC%10")  # Cl on cyclopropane via %nn closure
        assert m.atoms[0].symbol == "Cl"
        assert len(m.bonds) == 4

    def test_brackets(self):
        m = P("[NH4+]")
        a = m.atoms[0]
        assert a.symbol == "N" and a.formal_charge == 1 and a.total_hs == 4
        m = P("[13CH3][O-]")
        assert m.atoms[0].isotope == 13 and m.atoms[0].total_hs == 3
        assert m.atoms[1].formal_charge == -1

    def test_fragments_dot(self):
        m = P("[Na+].[Cl-]")
        assert m.num_atoms() == 2 and len(m.bonds) == 0

    def test_invalid(self):
        assert chem.mol_from_smiles("C1CC") is None          # unclosed ring
        assert chem.mol_from_smiles("C(") is None            # unmatched paren
        assert chem.mol_from_smiles("Xx") is None            # unknown element
        assert chem.mol_from_smiles("") is not None          # empty mol ok


class TestPerception:
    def test_benzene_aromatic_both_forms(self):
        for s in ("c1ccccc1", "C1=CC=CC=C1"):
            m = P(s)
            assert all(a.aromatic for a in m.atoms), s
            assert all(b.aromatic for b in m.bonds), s
            assert all(a.hybridization == HYB_SP2 for a in m.atoms), s
            assert all(a.total_hs == 1 for a in m.atoms), s

    def test_pyridine(self):
        m = P("c1ccncc1")
        n = next(a for a in m.atoms if a.symbol == "N")
        assert n.aromatic and n.total_hs == 0

    def test_pyrrole_furan_thiophene(self):
        for s, het in (("c1cc[nH]1", "N"), ("c1cco1", "O"), ("c1ccs1", "S")):
            m = P(s)
            assert all(a.aromatic for a in m.atoms), s
            a = next(x for x in m.atoms if x.symbol == het)
            if het == "N":
                assert a.total_hs == 1

    def test_kekulized_pyridine(self):
        m = P("C1=CC=NC=C1")
        assert all(a.aromatic for a in m.atoms)

    def test_naphthalene_fused(self):
        m = P("c1ccc2ccccc2c1")
        assert m.num_atoms() == 10
        assert all(a.aromatic for a in m.atoms)

    def test_cyclohexene_not_aromatic(self):
        m = P("C1=CCCCC1")
        assert not any(a.aromatic for a in m.atoms)
        assert all(a.in_ring for a in m.atoms)

    def test_implicit_hydrogens(self):
        assert P("C").atoms[0].total_hs == 4        # methane
        assert P("C=C").atoms[0].total_hs == 2      # ethene
        assert P("C#N").atoms[0].total_hs == 1      # HCN carbon
        assert P("O").atoms[0].total_hs == 2        # water
        assert P("N").atoms[0].total_hs == 3        # ammonia
        assert P("[O-]C").atoms[0].total_hs == 0    # alkoxide
        assert P("C[N+](C)(C)C").atoms[1].total_hs == 0

    def test_hybridization(self):
        m = P("CC=CC#C")
        hybs = [a.hybridization for a in m.atoms]
        assert hybs[0] == HYB_SP3
        assert hybs[1] == HYB_SP2 and hybs[2] == HYB_SP2
        assert hybs[3] == HYB_SP and hybs[4] == HYB_SP
        assert P("O").atoms[0].hybridization == HYB_SP3   # water: 2 lp + 2 H

    def test_conjugation(self):
        m = P("C=CC=C")  # butadiene: central single bond conjugated
        assert m.get_bond(1, 2).conjugated
        assert m.get_bond(0, 1).conjugated
        m2 = P("C=CCC=C")  # penta-1,4-diene: sp3 CH2 breaks conjugation
        assert not m2.get_bond(1, 2).conjugated
        m3 = P("CC(=O)N")  # amide: C-N conjugated via N lone pair
        assert m3.get_bond(1, 3).conjugated

    def test_charged_ring(self):
        m = P("c1cc[n+](C)c1")  # N-methyl pyrrolium-ish; parses + perceives
        assert m.num_atoms() == 6


class TestFeaturization:
    def test_atom_features_shapes_and_values(self):
        m = P("c1ccccc1O")  # phenol
        afm, nafm = chem.atom_features(m)
        assert afm.shape == (7, 4) and nafm.shape == (7, 3)
        # carbons: atomic 6, sp2=3, in ring, aromatic
        assert list(afm[0]) == [6, 3, 1, 1]
        # oxygen: atomic 8, not in ring, not aromatic
        assert afm[6, 0] == 8 and afm[6, 2] == 0 and afm[6, 3] == 0
        assert nafm[6, 1] == 1          # OH hydrogen
        assert nafm[6, 2] == 1          # one neighbor

    def test_bond_features_dense(self):
        m = P("C=CC")  # propene
        bfm, adj = chem.bond_features_dense(m)
        assert bfm.shape == (3, 3, 4) and adj.shape == (3, 3)
        assert bfm[0, 1, 0] == 4        # 2·double
        assert bfm[1, 2, 0] == 2        # 2·single
        assert bfm[1, 0, 0] == 4        # symmetric
        assert adj.sum() == 4
        # aromatic bond becomes class 3
        mb = P("c1ccccc1")
        bfmb, _ = chem.bond_features_dense(mb)
        assert bfmb[0, 1, 0] == 3

    def test_edge_list_matches_dense(self):
        m = P("CC(=O)O")
        bfm, adj = chem.bond_features_dense(m)
        src, dst, feats = chem.edge_list(m)
        assert len(src) == 2 * len(m.bonds)
        for s, d, f in zip(src, dst, feats):
            np.testing.assert_array_equal(bfm[s, d], f)


class TestECFP:
    def test_per_atom_bits(self):
        m = P("CCO")
        arr = chem.ecfp_bits_per_atom(m, radius=2, nbits=1024)
        assert arr.shape == (3, 1024)
        assert arr.sum() > 0
        # each atom has at least its radius-0 bit
        assert (arr.sum(axis=1) >= 1).all()

    def test_isomorphic_atoms_share_bits(self):
        m = P("CC(C)C")  # three equivalent methyls
        arr = chem.ecfp_bits_per_atom(m, radius=1, nbits=2048)
        np.testing.assert_array_equal(arr[0], arr[2])
        np.testing.assert_array_equal(arr[0], arr[3])
        assert not np.array_equal(arr[0], arr[1])

    def test_different_mols_differ(self):
        a = chem.ecfp_bitvector(P("c1ccccc1"), nbits=2048)
        b = chem.ecfp_bitvector(P("C1CCCCC1"), nbits=2048)
        assert not np.array_equal(a, b)

    def test_invariant_under_atom_renumbering(self):
        a = chem.ecfp_bitvector(P("OCC"), nbits=2048)
        b = chem.ecfp_bitvector(P("CCO"), nbits=2048)
        np.testing.assert_array_equal(a, b)


class TestTopologicalDistance:
    def test_chain_and_disconnected(self):
        from mpnn_tpu.chem.featurize import topological_distance
        m = P("CCCC")
        d = topological_distance(m)
        assert d[0, 3] == 3 and d[1, 2] == 1 and d[0, 0] == 0
        m2 = P("CC.O")
        d2 = topological_distance(m2)
        assert d2[0, 2] == 1e8      # disconnected → RDKit's 1e8


class TestLargestFragment:
    def test_salt_stripping(self):
        from mpnn_tpu.chem.mol import choose_largest_fragment
        m = P("CC(=O)O.[Na+]")      # sodium acetate
        out = choose_largest_fragment(m)
        assert out.num_atoms() == 4
        assert all(a.atomic_num != 11 for a in out.atoms)

    def test_single_fragment_passthrough(self):
        from mpnn_tpu.chem.mol import choose_largest_fragment
        m = P("CCO")
        assert choose_largest_fragment(m) is m

    def test_hydrogen_counting_breaks_ties(self):
        from mpnn_tpu.chem.mol import choose_largest_fragment
        # CH4 (5 atoms with H) vs O2-ish fragment [O][O] (2 atoms)
        m = P("C.[O][O]")
        out = choose_largest_fragment(m)
        assert out.atoms[0].atomic_num == 6


class TestParserRobustness:
    def test_fuzz_never_crashes(self):
        """mol_from_smiles must return a Mol or None — never raise — on
        arbitrary garbage (loader skip-row contract, load_dataset.py:17-18)."""
        import random
        rng = random.Random(317)
        alphabet = "CNOSPFIBrclnos123456789()[]=#+-@/\\.%*Hh "
        for _ in range(500):
            s = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 40)))
            out = chem.mol_from_smiles(s)
            assert out is None or hasattr(out, "atoms")

    def test_deep_nesting(self):
        s = "C" + "(C" * 30 + ")" * 30
        m = chem.mol_from_smiles(s)
        assert m is not None and m.num_atoms() == 31

    def test_long_chain(self):
        m = chem.mol_from_smiles("C" * 500)
        assert m is not None and m.num_atoms() == 500


class TestMolecularFormulas:
    """Molecular-formula validation: parsing + implicit-H/valence model must
    reproduce known formulas for real drugs (counts including hydrogens)."""

    CASES = [
        # (smiles, formula dict)
        ("CC(C)Cc1ccc(cc1)C(C)C(=O)O", dict(C=13, H=18, O=2)),   # ibuprofen
        ("CN1C=NC2=C1C(=O)N(C(=O)N2C)C", dict(C=8, H=10, N=4, O=2)),  # caffeine
        ("CC(=O)Oc1ccccc1C(=O)O", dict(C=9, H=8, O=4)),          # aspirin
        ("CC(=O)Nc1ccc(O)cc1", dict(C=8, H=9, N=1, O=2)),        # paracetamol
        ("Clc1ccccc1", dict(C=6, H=5, Cl=1)),                    # chlorobenzene
        ("C1CCNCC1", dict(C=5, H=11, N=1)),                      # piperidine
        ("c1ccc2[nH]ccc2c1", dict(C=8, H=7, N=1)),               # indole
        ("OCC(O)C(O)C(O)C(O)CO", dict(C=6, H=14, O=6)),          # sorbitol
        ("N[C@@H](C)C(=O)O", dict(C=3, H=7, N=1, O=2)),          # alanine
        ("O=C(O)c1ccccc1", dict(C=7, H=6, O=2)),                 # benzoic acid
        ("CCN(CC)CC", dict(C=6, H=15, N=1)),                     # triethylamine
        ("C#Cc1ccccc1", dict(C=8, H=6)),                         # phenylacetylene
    ]

    @pytest.mark.parametrize("smiles,formula", CASES)
    def test_formula(self, smiles, formula):
        from mpnn_tpu.chem.periodic import SYMBOLS
        m = P(smiles)
        got = {}
        for a in m.atoms:
            sym = SYMBOLS[a.atomic_num - 1]
            got[sym] = got.get(sym, 0) + 1
            got["H"] = got.get("H", 0) + a.total_hs
        got = {k: v for k, v in got.items() if v}
        assert got == {k: v for k, v in formula.items() if v}, smiles


class TestMoreFormulas:
    """Second wave of formula validation — heteroaromatics, charges, halogens."""

    CASES = [
        ("c1ccc2c(c1)cccc2", dict(C=10, H=8)),                   # naphthalene
        ("c1cnc2[nH]ccc2c1", dict(C=7, H=6, N=2)),               # azaindole
        ("CC(N)C(=O)O", dict(C=3, H=7, N=1, O=2)),               # alanine (flat)
        ("FC(F)(F)c1ccccc1", dict(C=7, H=5, F=3)),               # benzotrifluoride
        ("CSC", dict(C=2, H=6, S=1)),                            # dimethyl sulfide
        ("CS(=O)C", dict(C=2, H=6, O=1, S=1)),                   # DMSO
        ("O=S(=O)(O)O", dict(H=2, O=4, S=1)),                    # sulfuric acid
        ("OP(=O)(O)O", dict(H=3, O=4, P=1)),                     # phosphoric acid
        ("C(=O)(N)N", dict(C=1, H=4, N=2, O=1)),                 # urea
        ("c1ccoc1", dict(C=4, H=4, O=1)),                        # furan
        ("c1ccsc1", dict(C=4, H=4, S=1)),                        # thiophene
        ("C1=CC=CC=C1C=O", dict(C=7, H=6, O=1)),                 # benzaldehyde
        ("N#Cc1ccccc1", dict(C=7, H=5, N=1)),                    # benzonitrile
        ("CN(C)C=O", dict(C=3, H=7, N=1, O=1)),                  # DMF
    ]

    @pytest.mark.parametrize("smiles,formula", CASES)
    def test_formula(self, smiles, formula):
        from mpnn_tpu.chem.periodic import SYMBOLS
        m = P(smiles)
        got = {}
        for a in m.atoms:
            sym = SYMBOLS[a.atomic_num - 1]
            got[sym] = got.get(sym, 0) + 1
            got["H"] = got.get("H", 0) + a.total_hs
        got = {k: v for k, v in got.items() if v}
        assert got == {k: v for k, v in formula.items() if v}, (smiles, got)


class TestParserEdgeCases:
    def test_ring_number_reuse(self):
        # ring label 1 reused after closure — legal SMILES (biphenyl)
        m = P("c1ccccc1-c1ccccc1")
        assert m.num_atoms() == 12 and len(m.bonds) == 13

    def test_bond_symbol_on_ring_closure(self):
        # double bond declared at the ring-closure digit
        m = P("C=1CCCCC=1")
        b = m.get_bond(0, 5)
        assert b is not None and b.order == 2.0

    def test_directional_bonds_parsed_as_single(self):
        m = P("C/C=C/C")   # trans-2-butene; stereo discarded, bonds kept
        assert m.get_bond(1, 2).order == 2.0
        assert m.get_bond(0, 1).order == 1.0

    def test_spiro(self):
        m = P("C1CCC2(CC1)CCCCC2")  # spiro[5.5]undecane
        assert m.num_atoms() == 11
        assert m.degree(3) == 4

    def test_multiple_branches(self):
        m = P("C(C)(C)(C)C")  # neopentane
        assert m.degree(0) == 4
        assert m.atoms[0].total_hs == 0
