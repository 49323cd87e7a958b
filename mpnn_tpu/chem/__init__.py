from mpnn_tpu.chem.mol import Atom, Bond, Mol
from mpnn_tpu.chem.smiles import parse_smiles, mol_from_smiles, SmilesError
from mpnn_tpu.chem.featurize import (
    atom_features,
    bond_features_dense,
    edge_list,
    ATOM_HOT_FEATURES,
    ATOM_BOOL_FEATURES,
    ATOM_NUMERIC_FEATURES,
    BOND_FEATURES,
)
from mpnn_tpu.chem.ecfp import (
    morgan_bit_info,
    ecfp_bits_per_atom,
    ecfp_bitvector,
)


def mol_from_inchi(inchi: str):
    """InChI input (the reference's primary driver format, test.py:69-70).
    The built-in reader (chem/inchi.py) handles standard single-component
    InChIs — connectivity + H layer with bond-order inference; when it can't
    (exotic layers: charges, isotopes, multi-component), falls back to the
    optional RDKit backend if installed, else returns None (MolFromInchi's
    skip-row contract)."""
    from mpnn_tpu.chem.inchi import mol_from_inchi_builtin
    mol = mol_from_inchi_builtin(inchi)
    if mol is not None:
        return mol
    try:
        from rdkit import Chem  # optional backend for the exotic cases
    except ImportError:
        return None
    rdmol = Chem.MolFromInchi(inchi)
    if rdmol is None:
        return None
    from mpnn_tpu.chem.rdkit_backend import from_rdkit
    return from_rdkit(rdmol)
