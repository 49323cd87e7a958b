"""InChI reader tests: connectivity parsing, bond-order inference,
mobile-H placement, failure contract, SMILES cross-checks."""

import numpy as np
import pytest

from mpnn_tpu import chem
from mpnn_tpu.chem.inchi import mol_from_inchi_builtin
from mpnn_tpu.chem.periodic import SYMBOLS


def formula(m):
    got = {}
    for a in m.atoms:
        s = SYMBOLS[a.atomic_num - 1]
        got[s] = got.get(s, 0) + 1
        got["H"] = got.get("H", 0) + a.total_hs
    return {k: v for k, v in got.items() if v}


CASES = [
    ("InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3", dict(C=2, H=6, O=1), 0),
    ("InChI=1S/C6H6/c1-2-4-6-5-3-1/h1-6H", dict(C=6, H=6), 6),
    ("InChI=1S/C2H4O2/c1-2(3)4/h1H3,(H,3,4)", dict(C=2, H=4, O=2), 0),
    ("InChI=1S/CH4/h1H4", dict(C=1, H=4), 0),
    ("InChI=1S/C8H10N4O2/c1-11-4-9-6-5(11)7(13)10(2)8(14)12(6)3/"
     "h4H,1-3H3", dict(C=8, H=10, N=4, O=2), 9),               # caffeine
    ("InChI=1S/C3H6O/c1-3(2)4/h1-2H3", dict(C=3, H=6, O=1), 0),
    ("InChI=1S/C2H3N/c1-2-3/h1H3", dict(C=2, H=3, N=1), 0),
    ("InChI=1S/C5H5N/c1-2-4-6-5-3-1/h1-5H", dict(C=5, H=5, N=1), 6),
    ("InChI=1S/C9H8O4/c1-6(10)13-8-5-3-2-4-7(8)9(11)12/h2-5H,1H3,"
     "(H,11,12)", dict(C=9, H=8, O=4), 6),                     # aspirin
    ("InChI=1S/C13H18O2/c1-9(2)8-11-4-6-12(7-5-11)10(3)13(14)15/"
     "h4-7,9-10H,8H2,1-3H3,(H,14,15)",
     dict(C=13, H=18, O=2), 6),                                # ibuprofen
]


@pytest.mark.parametrize("inchi,want,n_aromatic", CASES)
def test_known_molecules(inchi, want, n_aromatic):
    m = mol_from_inchi_builtin(inchi)
    assert m is not None, inchi
    assert formula(m) == want
    assert sum(a.aromatic for a in m.atoms) == n_aromatic


def test_matches_smiles_featurization():
    """Benzene from InChI and from SMILES must featurize identically."""
    mi = mol_from_inchi_builtin("InChI=1S/C6H6/c1-2-4-6-5-3-1/h1-6H")
    ms = chem.parse_smiles("c1ccccc1")
    afm_i, nafm_i = chem.atom_features(mi)
    afm_s, nafm_s = chem.atom_features(ms)
    np.testing.assert_array_equal(np.sort(afm_i, axis=0),
                                  np.sort(afm_s, axis=0))
    np.testing.assert_array_equal(np.sort(nafm_i, axis=0),
                                  np.sort(nafm_s, axis=0))


def test_fixed_h_plus_mobile_h_on_same_atom():
    """An atom in BOTH the fixed /h list and a mobile-H group keeps its
    fixed H and gains the mobile one (fixed assigns, mobile adds)."""
    from mpnn_tpu.chem.inchi import _parse_h_layer
    # atom 1: fixed 1 H; mobile group (H,1,2) places its H on atom 1 too
    assert _parse_h_layer("1H,(H,1,2)", 2) == {0: 2}
    # disjoint case unchanged
    assert _parse_h_layer("2H,(H,1)", 2) == {0: 1, 1: 1}
    # H2 mobile group spreads over the first two listed atoms
    assert _parse_h_layer("1H,(H2,1,2,3)", 3) == {0: 2, 1: 1}


def test_failure_contract():
    assert mol_from_inchi_builtin("not-an-inchi") is None
    assert mol_from_inchi_builtin("InChI=1S/garbage!!/c1-2") is None
    # multi-component rejected by the builtin
    assert mol_from_inchi_builtin(
        "InChI=1S/CH4O.Na/c1-2;/h2H,1H3;") is None
    # charged layers rejected by the builtin
    assert mol_from_inchi_builtin(
        "InChI=1S/H3N/h1H3/p+1") is None


def test_entrypoint_uses_builtin():
    m = chem.mol_from_inchi("InChI=1S/C2H6O/c1-2-3/h3H,2H2,1H3")
    assert m is not None and m.num_atoms() == 3
