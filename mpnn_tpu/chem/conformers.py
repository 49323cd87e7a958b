"""3D conformer generation — RDKit-free distance geometry.

Reference pipeline (mol_graph/mol_graph.py:250-344): conformer count from
rotatable bonds (<8→50, <13→200, else 300), EmbedMultipleConfs(ETKDG), UFF
energy sort, greedy RMS dedup at 0.35 Å, and a 3D distance matrix per
surviving conformer (`e_dist`, Get3DDistanceMatrix). The downstream
conformer-ensemble model was planned but never built (thoughts.txt:19-21);
the capability surface is conformer generation + per-conformer distance
matrices, reproduced here with classic distance geometry:

  1. distance-bounds matrix: ideal bond lengths (element/order table),
     angle-derived 1-3 distances from hybridization, triangle-inequality
     bound smoothing (Floyd-Warshall);
  2. random metrization: sample a distance matrix inside the bounds, embed
     via metric-matrix eigendecomposition (top 3 eigenvectors);
  3. refinement: gradient descent on the stress function (distance-bound
     violations + a soft lower-bound clash term) — the ETKDG/UFF analog;
  4. energy = final stress; sort ascending; greedy Kabsch-RMSD dedup.

Coordinates are approximate (no torsion knowledge base), but bond lengths /
angles land near chemical values and the API matches the reference's:
`generate_conformers(mol)` → energy-sorted, deduplicated coordinate sets;
`distance_matrix(coords)` → e_dist.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from mpnn_tpu.chem.mol import HYB_SP, HYB_SP2, HYB_SP3, Mol

# covalent radii (Å) for common elements; default 0.77
_COV_RADius = {1: 0.31, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66, 9: 0.57,
               14: 1.11, 15: 1.07, 16: 1.05, 17: 1.02, 35: 1.20, 53: 1.39}

_ANGLE_BY_HYB = {HYB_SP: math.pi, HYB_SP2: math.radians(120.0),
                 HYB_SP3: math.radians(109.47)}


def covalent_radius(z: int) -> float:
    return _COV_RADius.get(z, 0.77)


def bond_length(mol: Mol, bond) -> float:
    r = covalent_radius(mol.atoms[bond.begin].atomic_num) \
        + covalent_radius(mol.atoms[bond.end].atomic_num)
    if bond.aromatic:
        return 0.92 * r
    if bond.order == 2:
        return 0.87 * r
    if bond.order == 3:
        return 0.78 * r
    return r


def count_rotatable_bonds(mol: Mol) -> int:
    """Single, non-ring bonds between two non-terminal heavy atoms
    (the standard rotatable-bond definition RDKit's
    CalcNumRotatableBonds implements, minus its amide exclusion)."""
    n = 0
    for b in mol.bonds:
        if b.order != 1.0 or b.in_ring or b.aromatic:
            continue
        if mol.degree(b.begin) >= 2 and mol.degree(b.end) >= 2:
            n += 1
    return n


def conformer_count_for(n_rotatable: int) -> int:
    """mol_graph.py:309-315."""
    if n_rotatable < 8:
        return 50
    if n_rotatable < 13:
        return 200
    return 300


# ---------------------------------------------------------------------------
# bounds matrix
# ---------------------------------------------------------------------------

def bounds_matrix(mol: Mol) -> Tuple[np.ndarray, np.ndarray]:
    """(upper, lower) distance bounds (A, A)."""
    n = mol.num_atoms()
    big = 1000.0
    upper = np.full((n, n), big)
    lower = np.zeros((n, n))
    np.fill_diagonal(upper, 0.0)

    # 1-2: bond lengths (tight)
    for b in mol.bonds:
        d = bond_length(mol, b)
        upper[b.begin, b.end] = upper[b.end, b.begin] = d * 1.01
        lower[b.begin, b.end] = lower[b.end, b.begin] = d * 0.99

    # 1-3: law of cosines with the center atom's ideal angle
    for j in range(n):
        theta = _ANGLE_BY_HYB.get(mol.atoms[j].hybridization,
                                  math.radians(109.47))
        nbrs = mol.neighbors(j)
        for a in range(len(nbrs)):
            for b in range(a + 1, len(nbrs)):
                i, k = nbrs[a], nbrs[b]
                d_ij = bond_length(mol, mol.get_bond(i, j))
                d_jk = bond_length(mol, mol.get_bond(j, k))
                d = math.sqrt(max(
                    d_ij ** 2 + d_jk ** 2
                    - 2 * d_ij * d_jk * math.cos(theta), 1e-6))
                upper[i, k] = upper[k, i] = min(upper[i, k], d * 1.03)
                lower[i, k] = lower[k, i] = max(lower[i, k], d * 0.97)

    # everything else: van-der-Waals floor
    vdw = np.asarray([covalent_radius(a.atomic_num) + 0.9
                      for a in mol.atoms])
    floor = vdw[:, None] + vdw[None, :]
    far = lower == 0
    lower[far] = np.minimum(floor, upper * 0.99)[far]
    np.fill_diagonal(lower, 0.0)

    # triangle smoothing of uppers (Floyd-Warshall)
    for k in range(n):
        upper = np.minimum(upper, upper[:, k:k + 1] + upper[k:k + 1, :])
    lower = np.minimum(lower, upper)
    return upper, lower


# ---------------------------------------------------------------------------
# embedding + refinement
# ---------------------------------------------------------------------------

def _embed_once(upper, lower, rng) -> np.ndarray:
    n = upper.shape[0]
    d = lower + rng.rand(n, n) * (upper - lower)
    d = (d + d.T) / 2
    np.fill_diagonal(d, 0.0)
    # metric matrix (double centering)
    d2 = d ** 2
    row = d2.mean(axis=1, keepdims=True)
    g = -0.5 * (d2 - row - row.T + d2.mean())
    w, v = np.linalg.eigh(g)
    idx = np.argsort(w)[::-1][:3]
    coords = v[:, idx] * np.sqrt(np.maximum(w[idx], 1e-9))
    if coords.shape[1] < 3:      # tiny molecules: Gram rank < 3
        coords = np.pad(coords, ((0, 0), (0, 3 - coords.shape[1])))
    return coords


def _stress_and_grad(coords, upper, lower):
    diff = coords[:, None, :] - coords[None, :, :]
    dist = np.sqrt((diff ** 2).sum(-1) + 1e-12)
    np.fill_diagonal(dist, 1.0)
    over = np.maximum(dist - upper, 0.0)
    under = np.maximum(lower - dist, 0.0)
    np.fill_diagonal(over, 0.0)
    np.fill_diagonal(under, 0.0)
    stress = (over ** 2).sum() + (under ** 2).sum()
    coef = 2 * (over - under) / dist
    grad = (coef[:, :, None] * diff).sum(axis=1)
    return stress, grad


def _refine(coords, upper, lower, steps: int = 200, lr: float = 0.05):
    for _ in range(steps):
        s, g = _stress_and_grad(coords, upper, lower)
        if s < 1e-6:
            break
        coords = coords - lr * g
    return coords, s


def kabsch_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """Minimal RMSD after optimal rotation/translation (Kabsch)."""
    a = a - a.mean(0)
    b = b - b.mean(0)
    h = a.T @ b
    u, s, vt = np.linalg.svd(h)
    sign = np.sign(np.linalg.det(vt.T @ u.T))
    dmat = np.diag([1.0, 1.0, sign])
    r = vt.T @ dmat @ u.T
    a_rot = a @ r.T
    return float(np.sqrt(((a_rot - b) ** 2).sum() / len(a)))


def generate_conformers(mol: Mol, n_conf: Optional[int] = None,
                        seed: int = 317, rms_threshold: float = 0.35,
                        refine_steps: int = 200
                        ) -> List[Tuple[np.ndarray, float]]:
    """→ [(coords (A,3), energy)], energy-sorted, greedy-RMSD-deduplicated
    (mol_graph.py:317-344 pipeline shape)."""
    if mol.num_atoms() < 2:
        return [(np.zeros((mol.num_atoms(), 3)), 0.0)]
    if n_conf is None:
        n_conf = conformer_count_for(count_rotatable_bonds(mol))
    upper, lower = bounds_matrix(mol)
    rng = np.random.RandomState(seed)
    confs = []
    for _ in range(n_conf):
        coords = _embed_once(upper, lower, rng)
        coords, energy = _refine(coords, upper, lower, refine_steps)
        confs.append((coords, float(energy)))
    confs.sort(key=lambda ce: ce[1])
    kept: List[Tuple[np.ndarray, float]] = []
    for coords, e in confs:
        if all(kabsch_rmsd(coords, kc) >= rms_threshold
               for kc, _ in kept):
            kept.append((coords, e))
    return kept


def distance_matrix(coords: np.ndarray) -> np.ndarray:
    """e_dist — the 3D distance matrix (Get3DDistanceMatrix analog)."""
    diff = coords[:, None, :] - coords[None, :, :]
    return np.sqrt((diff ** 2).sum(-1))
