"""Optional RDKit backend: converts an RDKit Mol into our Mol so the rest of
the pipeline is backend-agnostic. Import is gated — the execution image has
no RDKit; everything works without it via the built-in SMILES parser."""

from __future__ import annotations

from mpnn_tpu.chem.mol import Atom, Mol


def from_rdkit(rdmol) -> Mol:
    mol = Mol()
    for a in rdmol.GetAtoms():
        mol.add_atom(Atom(
            atomic_num=a.GetAtomicNum(),
            formal_charge=a.GetFormalCharge(),
            explicit_hs=None,
            aromatic=a.GetIsAromatic(),
            isotope=a.GetIsotope(),
        ))
        # carry RDKit's perception directly (exact parity path)
        atom = mol.atoms[-1]
        atom.implicit_hs = a.GetTotalNumHs()
        atom.in_ring = a.IsInRing()
        atom.hybridization = int(a.GetHybridization())
    for b in rdmol.GetBonds():
        mol.add_bond(b.GetBeginAtomIdx(), b.GetEndAtomIdx(),
                     order=b.GetBondTypeAsDouble(),
                     aromatic=b.GetIsAromatic())
        bond = mol.bonds[-1]
        bond.in_ring = b.IsInRing()
        bond.conjugated = b.GetIsConjugated()
    mol._sanitized = True   # RDKit already perceived everything
    mol.rings = [list(r) for r in rdmol.GetRingInfo().AtomRings()]
    return mol
