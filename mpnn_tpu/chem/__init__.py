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
    """InChI parsing requires RDKit (full InChI reconstruction — bond orders
    from the formula/connection layers — is out of scope for the built-in
    parser). Gated: uses RDKit when available, raises otherwise. The
    reference's InChI drivers (test.py:69-70) map to this entry point."""
    try:
        from rdkit import Chem  # optional backend
    except ImportError as e:
        raise ImportError(
            "mol_from_inchi requires the optional RDKit backend; "
            "use SMILES input with the built-in parser instead") from e
    rdmol = Chem.MolFromInchi(inchi)
    if rdmol is None:
        return None
    from mpnn_tpu.chem.rdkit_backend import from_rdkit
    return from_rdkit(rdmol)
