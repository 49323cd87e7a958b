"""Minimal RDKit-free InChI reader.

The reference's primary drivers parse InChI (`Chem.MolFromInchi`,
test.py:69-70); without RDKit in this image the previous fallback was a
hard gate. This reader handles standard single-component InChIs:

    InChI=1S/<formula>/c<connections>/h<H-layer>[/q<charge>][/p<protons>]...

InChI stores the CONNECTIVITY but not bond orders; orders are inferred:
every heavy atom gets its hydrogen count from the /h layer, which fixes
each atom's remaining valence, and the leftover unsaturation is resolved as
a perfect matching of double/triple bonds (backtracking over the few
unsaturated atoms — molecules are small). Aromaticity is then perceived by
the normal sanitize pass, so `c1ccccc1`-equivalent rings come out aromatic.

Unsupported layers (stereo /b /t /m /s are ignored — the featurizer reads
no stereo; isotopes /i ignored; multi-component '.'/ ';' formulas and
reconnected-metal layers are rejected → None, mirroring MolFromInchi's
failure contract).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from mpnn_tpu.chem.mol import Atom, Mol
from mpnn_tpu.chem.periodic import ATOMIC_NUM, DEFAULT_VALENCES, SYMBOLS


class InchiError(ValueError):
    pass


_FORMULA_RE = re.compile(r"([A-Z][a-z]?)(\d*)")


def _parse_formula(formula: str) -> List[str]:
    """→ element symbol per heavy atom, in InChI canonical numbering order
    (Hill order: C first, H skipped, then alphabetical)."""
    if "." in formula:
        raise InchiError("multi-component InChI not supported")
    counts: List[Tuple[str, int]] = []
    for sym, num in _FORMULA_RE.findall(formula):
        if not sym:
            continue
        if sym not in ATOMIC_NUM:
            raise InchiError(f"unknown element {sym!r}")
        counts.append((sym, int(num) if num else 1))
    atoms: List[str] = []
    for sym, n in counts:
        if sym == "H":
            continue
        atoms.extend([sym] * n)
    return atoms


def _parse_connections(layer: str, n_atoms: int) -> List[Tuple[int, int]]:
    """/c layer: e.g. '1-2-3' or '1-2(4)-3'. Numbers are 1-based canonical
    atom ids; '-' extends the chain, '(...)' branches, ',' closes siblings.
    """
    bonds: List[Tuple[int, int]] = []
    stack: List[int] = []
    prev: Optional[int] = None
    i, s = 0, layer
    while i < len(s):
        ch = s[i]
        if ch.isdigit():
            j = i
            while j < len(s) and s[j].isdigit():
                j += 1
            cur = int(s[i:j]) - 1
            if not 0 <= cur < n_atoms:
                raise InchiError(f"atom index {cur + 1} out of range")
            if prev is not None:
                a, b = min(prev, cur), max(prev, cur)
                if (a, b) not in bonds:
                    bonds.append((a, b))
            prev = cur
            i = j
        elif ch == "-":
            i += 1
        elif ch == "(":
            stack.append(prev)
            i += 1
        elif ch == ")":
            if not stack:
                raise InchiError("unmatched ')' in /c layer")
            prev = stack.pop()
            i += 1
        elif ch == ",":
            if not stack:
                raise InchiError("',' outside branch in /c layer")
            prev = stack[-1]
            i += 1
        elif ch == "*" or ch == ";":
            raise InchiError("multi-component /c layer not supported")
        else:
            raise InchiError(f"unexpected {ch!r} in /c layer")
    return bonds


def _expand_ids(ids: str):
    """'1-4' → 1,2,3,4; '7' → 7."""
    if "-" in ids:
        a, b = ids.split("-")
        return list(range(int(a), int(b) + 1))
    return [int(ids)]


def _parse_h_layer(layer: str, n_atoms: int) -> Dict[int, int]:
    """/h layer: fixed H ('3H,2H2,1-4H') plus mobile-H groups
    '(H2,1,2,3)' — n hydrogens shared over the listed atoms; any placement
    is a valid tautomer, so we put one H on each of the first n listed
    atoms (the convention reconstruction tools use). → {atom0: H count}."""
    hs: Dict[int, int] = {}
    if not layer:
        return hs
    # fixed-H assignments FIRST (they SET the count), so a later mobile-H
    # placement on the same atom adds on top instead of being overwritten.
    # Fixed-H grammar: comma-separated id/range tokens accumulate until one
    # carries the H suffix, which applies to the whole group
    # ('4-7,9-10H,8H2' → atoms 4..7 and 9..10 get 1 H; atom 8 gets 2)
    fixed = re.sub(r"\([^)]*\)", "", layer)
    pending: List[int] = []
    for part in fixed.split(","):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"([\d\-]+)(H(\d*))?", part)
        if not m:
            raise InchiError(f"bad /h item {part!r}")
        pending.extend(_expand_ids(m.group(1)))
        if m.group(2):
            count = int(m.group(3)) if m.group(3) else 1
            for idx in pending:
                if not 1 <= idx <= n_atoms:
                    raise InchiError(f"/h atom {idx} out of range")
                hs[idx - 1] = count
            pending = []
    if pending:
        raise InchiError("dangling ids without H count in /h layer")
    # mobile-H groups ADD to whatever the fixed pass assigned
    for grp in re.findall(r"\(H(\d*),([\d,\-]+)\)", layer):
        n_h = int(grp[0]) if grp[0] else 1
        ids: List[int] = []
        for tok in grp[1].split(","):
            ids.extend(_expand_ids(tok))
        for idx in ids[:n_h]:
            if not 1 <= idx <= n_atoms:
                raise InchiError(f"/h atom {idx} out of range")
            hs[idx - 1] = hs.get(idx - 1, 0) + 1
    return hs


def _assign_bond_orders(mol: Mol, needed: List[int]) -> bool:
    """Distribute leftover valence (`needed[i]` extra bond orders at atom i)
    over bonds by backtracking. Each increment raises one bond's order by 1
    and consumes 1 from both endpoints."""
    if all(v == 0 for v in needed):
        return True
    # pick the unsaturated atom with fewest options (fail fast)
    cands = [i for i, v in enumerate(needed) if v > 0]
    i = min(cands, key=lambda a: sum(
        1 for b in mol.atom_bonds(a)
        if needed[b.other(a)] > 0 and b.order < 3))
    for b in mol.atom_bonds(i):
        j = b.other(i)
        if needed[j] > 0 and b.order < 3:
            b.order += 1.0
            needed[i] -= 1
            needed[j] -= 1
            if _assign_bond_orders(mol, needed):
                return True
            b.order -= 1.0
            needed[i] += 1
            needed[j] += 1
    return False


def parse_inchi(inchi: str) -> Mol:
    if not inchi.startswith("InChI="):
        raise InchiError("missing InChI= prefix")
    body = inchi[len("InChI="):]
    parts = body.split("/")
    if len(parts) < 2 or not re.fullmatch(r"1S?", parts[0]):
        raise InchiError(f"unsupported InChI version {parts[0]!r}")
    formula = parts[1]
    layers = {p[0]: p[1:] for p in parts[2:] if p}
    if "q" in layers or "p" in layers:
        raise InchiError("charged/protonated InChI not supported")

    symbols = _parse_formula(formula)
    mol = Mol()
    for sym in symbols:
        mol.add_atom(Atom(atomic_num=ATOMIC_NUM[sym]))
    n = len(symbols)
    if n == 0:
        raise InchiError("no heavy atoms")

    for a, b in _parse_connections(layers.get("c", ""), n):
        mol.add_bond(a, b, order=1.0)

    hs = _parse_h_layer(layers.get("h", ""), n)
    # fix every atom's H count explicitly (InChI's /h is total H per atom)
    needed = []
    for atom in mol.atoms:
        atom.explicit_hs = hs.get(atom.idx, 0)
        vals = DEFAULT_VALENCES.get(atom.symbol, (4,))
        degree = mol.degree(atom.idx)
        used = degree + atom.explicit_hs
        # choose the smallest standard valence that fits
        target = None
        for v in vals:
            if used <= v:
                target = v
                break
        if target is None:
            raise InchiError(
                f"atom {atom.idx + 1} ({atom.symbol}) over-coordinated")
        needed.append(target - used)

    # leftover unsaturation must pair up exactly; if the smallest valences
    # over-demand (odd total), try relaxing hetero atoms to their base
    # valence (e.g. S stays 2 rather than forcing double bonds)
    if sum(needed) % 2 == 1 or not _assign_bond_orders(mol, list(needed)):
        # retry greedily with zero demand on hypervalent-capable atoms
        needed2 = []
        for atom, d in zip(mol.atoms, needed):
            vals = DEFAULT_VALENCES.get(atom.symbol, (4,))
            needed2.append(d if len(vals) == 1 else 0)
        if not _assign_bond_orders(mol, list(needed2)):
            raise InchiError("could not infer bond orders")

    mol.sanitize()
    return mol


def mol_from_inchi_builtin(inchi: str) -> Optional[Mol]:
    """MolFromInchi-style contract: Mol or None."""
    try:
        return parse_inchi(inchi)
    except Exception:
        return None
