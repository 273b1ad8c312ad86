"""Kabsch-Sander secondary-structure assignment (DSSP-equivalent, in numpy).

Replaces the external ``mkdssp`` binary + Bio.PDB wrapper used by the reference
(deeprank2/features/secondary_structure.py:105). Implements the parts of DSSP
that matter for the 3-class (helix/strand/coil) feature:

- backbone H-bond energies E = 0.084 * 332 * (1/r_ON + 1/r_CH - 1/r_OH - 1/r_CN)
  with the amide H placed from the previous residue's C=O direction; a bond is
  E < -0.5 kcal/mol;
- n-turns (n = 3, 4, 5) and minimal helices (G/H/I from two consecutive turns);
- parallel/antiparallel bridges -> strand (B/E);
- turns (T) and bends (S, kappa > 70 deg); everything else coil.

Assignment priority follows DSSP: H > B/E > G > I > T > S.
"""

from __future__ import annotations

import numpy as np

HBOND_ENERGY_CUTOFF = -0.5
CHAIN_BREAK_DISTANCE = 2.5
Q1Q2_F = 0.084 * 332.0


def _backbone_table(arrays) -> tuple[np.ndarray, dict[str, np.ndarray], np.ndarray]:
    """Residues with a full backbone: (residue indices, {N,CA,C,O} coords, chain ids)."""
    res_ids = []
    coords = {name: [] for name in ("N", "CA", "C", "O")}
    chains = []
    for r in range(arrays.num_residues):
        start = int(arrays.res_atom_start[r])
        count = int(arrays.res_atom_count[r])
        names = list(arrays.atom_names[start : start + count])
        if all(n in names for n in ("N", "CA", "C", "O")):
            res_ids.append(r)
            for n in ("N", "CA", "C", "O"):
                coords[n].append(arrays.positions[start + names.index(n)])
            chains.append(int(arrays.res_chain[r]))
    return (
        np.array(res_ids, dtype=np.int64),
        {k: np.array(v, dtype=np.float64).reshape(-1, 3) for k, v in coords.items()},
        np.array(chains, dtype=np.int64),
    )


def assign_secondary_structure(arrays) -> dict[int, str]:
    """DSSP letter per residue index ('H','G','I','E','B','T','S',' ')."""
    res_ids, bb, chains = _backbone_table(arrays)
    n = len(res_ids)
    if n == 0:
        return {}

    # sequence continuity: i and i+1 are connected if same chain and peptide bond intact
    connected = np.zeros(n, dtype=bool)  # connected[i] == residue i bonded to i+1
    if n > 1:
        dist_cn = np.linalg.norm(bb["C"][:-1] - bb["N"][1:], axis=1)
        connected[:-1] = (chains[:-1] == chains[1:]) & (dist_cn < CHAIN_BREAK_DISTANCE)

    def chain_connected(i: int, j: int) -> bool:
        """All peptide bonds intact between positions i..j (i < j)."""
        return bool(connected[i:j].all())

    # amide H from previous residue C=O; none for chain starts and prolines
    h_pos = np.full((n, 3), np.nan)
    is_pro = np.array([arrays.res_aa_ids[r] >= 0 and _is_proline(arrays, r) for r in res_ids])
    for i in range(1, n):
        if connected[i - 1] and not is_pro[i]:
            co = bb["C"][i - 1] - bb["O"][i - 1]
            norm = np.linalg.norm(co)
            if norm > 0:
                h_pos[i] = bb["N"][i] + co / norm

    # H-bond energy matrix: donor NH(i) ... acceptor CO(j)
    has_h = ~np.isnan(h_pos[:, 0])
    hbond = np.zeros((n, n), dtype=bool)
    if has_h.any():
        donors = np.flatnonzero(has_h)
        d_on = np.linalg.norm(bb["N"][donors][:, None, :] - bb["O"][None, :, :], axis=-1)
        d_cn = np.linalg.norm(bb["N"][donors][:, None, :] - bb["C"][None, :, :], axis=-1)
        d_oh = np.linalg.norm(h_pos[donors][:, None, :] - bb["O"][None, :, :], axis=-1)
        d_ch = np.linalg.norm(h_pos[donors][:, None, :] - bb["C"][None, :, :], axis=-1)
        with np.errstate(divide="ignore"):
            energy = Q1Q2_F * (1.0 / d_on + 1.0 / d_ch - 1.0 / d_oh - 1.0 / d_cn)
        for k, i in enumerate(donors):
            row = energy[k]
            for j in np.flatnonzero(row < HBOND_ENERGY_CUTOFF):
                if abs(int(i) - int(j)) >= 2:  # no self/neighbor bonds  # noqa: PLR2004
                    hbond[i, j] = True

    # n-turns: CO(i) -> NH(i+k)
    turn = {k: np.zeros(n, dtype=bool) for k in (3, 4, 5)}
    for k in (3, 4, 5):
        for i in range(n - k):
            if hbond[i + k, i] and chain_connected(i, i + k):
                turn[k][i] = True

    # minimal helices: two consecutive k-turns at i-1 and i -> helix at i..i+k-1
    helix = {k: np.zeros(n, dtype=bool) for k in (3, 4, 5)}
    for k in (3, 4, 5):
        for i in range(1, n - k):
            if turn[k][i - 1] and turn[k][i]:
                helix[k][i : i + k] = True

    # bridges (parallel / antiparallel) -> strand
    strand = np.zeros(n, dtype=bool)
    for i in range(1, n - 1):
        for j in range(i + 3, n - 1):
            parallel = (hbond[i, j - 1] and hbond[j + 1, i]) or (hbond[j, i - 1] and hbond[i + 1, j])
            antiparallel = (hbond[i, j] and hbond[j, i]) or (hbond[i + 1, j - 1] and hbond[j + 1, i - 1])
            if parallel or antiparallel:
                strand[i] = True
                strand[j] = True

    # turns (T): residues i+1..i+k-1 of any k-turn
    turn_t = np.zeros(n, dtype=bool)
    for k in (3, 4, 5):
        for i in np.flatnonzero(turn[k]):
            turn_t[i + 1 : i + k] = True

    # bends (S): kappa (CA angle over i-2, i, i+2) > 70 degrees
    bend = np.zeros(n, dtype=bool)
    for i in range(2, n - 2):
        if not (chain_connected(i - 2, i) and chain_connected(i, i + 2)):
            continue
        u = bb["CA"][i] - bb["CA"][i - 2]
        v = bb["CA"][i + 2] - bb["CA"][i]
        nu, nv = np.linalg.norm(u), np.linalg.norm(v)
        if nu > 0 and nv > 0:
            kappa = np.degrees(np.arccos(np.clip(np.dot(u, v) / (nu * nv), -1.0, 1.0)))
            bend[i] = kappa > 70.0  # noqa: PLR2004

    out: dict[int, str] = {}
    for i, r in enumerate(res_ids):
        if helix[4][i]:
            letter = "H"
        elif strand[i]:
            letter = "E"
        elif helix[3][i]:
            letter = "G"
        elif helix[5][i]:
            letter = "I"
        elif turn_t[i]:
            letter = "T"
        elif bend[i]:
            letter = "S"
        else:
            letter = " "
        out[int(r)] = letter
    return out


def _is_proline(arrays, residue_index: int) -> bool:
    from deeprank2_tpu.molstruct.aminoacid import AA_THREE_LETTER

    aa_id = int(arrays.res_aa_ids[residue_index])
    return aa_id >= 0 and AA_THREE_LETTER[aa_id] == "PRO"
