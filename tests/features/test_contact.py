"""Physics oracles for the contact edge features.

Mirrors the reference's test scenarios (known chemistry on 101M/1A0Z pairs):
covalent and 1-3 pairs have zero energies, 1-4 pairs use the reduced parameter
set, opposing-chain close contacts keep full energies, Coulomb signs/ordering.
"""

import numpy as np
import pytest

from deeprank2_tpu.domain import edgestorage as Efeat
from deeprank2_tpu.features.contact import add_features, covalent_cutoff, cutoff_13, cutoff_14
from deeprank2_tpu.io.pdb import parse_pdb

from . import find_atom, single_atom_edge_graph, single_residue_edge_graph


def _get_contact(data_path, pdb_id, res1, atom1, res2, atom2, chains=None):
    pdb_path = str(data_path / "pdb" / pdb_id / f"{pdb_id}.pdb")
    arrays = parse_pdb(pdb_path)
    if chains is None:
        chains = (arrays.chain_ids[0], arrays.chain_ids[0])
    a1 = find_atom(arrays, chains[0], res1, atom1)
    a2 = find_atom(arrays, chains[1], res2, atom2)
    graph = single_atom_edge_graph(arrays, a1, a2)
    add_features(pdb_path, graph)
    for name in (Efeat.VDW, Efeat.ELEC, Efeat.DISTANCE, Efeat.SAMECHAIN, Efeat.COVALENT, Efeat.SAMERES):
        assert not np.isnan(graph.edge_features[name][0]), f"isnan {name}"
    return {name: v[0] for name, v in graph.edge_features.items()}


def test_covalent_pair(data_path) -> None:
    """MET 0: N - CA is covalent (1.49 Å): zero energies, covalent flag set."""
    e = _get_contact(data_path, "101M", 0, "N", 0, "CA")
    assert e[Efeat.DISTANCE] < covalent_cutoff
    assert e[Efeat.VDW] == 0.0
    assert e[Efeat.ELEC] == 0.0
    assert e[Efeat.COVALENT] == 1.0


def test_13_pair(data_path) -> None:
    """MET 0: N - CB is a 1-3 pair (2.47 Å): zero energies, not covalent."""
    e = _get_contact(data_path, "101M", 0, "N", 0, "CB")
    assert e[Efeat.DISTANCE] < cutoff_13
    assert e[Efeat.VDW] == 0.0
    assert e[Efeat.ELEC] == 0.0
    assert e[Efeat.COVALENT] == 0.0


def test_very_close_opposing_chains(data_path) -> None:
    """A:THR118:O - B:ARG30:NH1 (3.55 Å): full energies because different chains."""
    e = _get_contact(data_path, "1A0Z", 118, "O", 30, "NH1", chains=("A", "B"))
    assert e[Efeat.DISTANCE] < cutoff_13
    assert e[Efeat.ELEC] != 0.0
    assert e[Efeat.VDW] != 0.0
    assert e[Efeat.SAMECHAIN] == 0.0


def test_14_pair(data_path) -> None:
    """MET 0: CA - SD is a 1-4 pair: small nonzero vdW (1-4 parameters), nonzero elec."""
    e = _get_contact(data_path, "101M", 0, "CA", 0, "SD")
    assert cutoff_13 < e[Efeat.DISTANCE] < cutoff_14
    assert e[Efeat.VDW] != 0.0
    assert abs(e[Efeat.VDW]) < 0.1
    assert e[Efeat.ELEC] != 0.0
    assert e[Efeat.COVALENT] == 0.0


def test_14dist_opposing_chains(data_path) -> None:
    """A:PRO114:CA - B:HIS116:CD2 (3.62 Å): full (main) vdW because different chains."""
    e = _get_contact(data_path, "1A0Z", 114, "CA", 116, "CD2", chains=("A", "B"))
    assert cutoff_13 < e[Efeat.DISTANCE] < cutoff_14
    assert e[Efeat.ELEC] > 1.0
    assert e[Efeat.VDW] > 0.1


def test_vanderwaals_negative(data_path) -> None:
    """MET0:N - ASP27:CB, 29.5 Å apart: negative (attractive tail) vdW."""
    e = _get_contact(data_path, "101M", 0, "N", 27, "CB")
    assert e[Efeat.VDW] < 0.0


def test_vanderwaals_morenegative(data_path) -> None:
    """Intermediate distance is more negative than far."""
    e_mid = _get_contact(data_path, "101M", 0, "N", 138, "CG")
    e_far = _get_contact(data_path, "101M", 0, "N", 27, "CB")
    assert e_mid[Efeat.VDW] < e_far[Efeat.VDW]


def test_edge_distance(data_path) -> None:
    """Distance ordering for known atom pairs."""
    e_close = _get_contact(data_path, "101M", 0, "N", 0, "CA")
    e_mid = _get_contact(data_path, "101M", 0, "N", 138, "CG")
    e_far = _get_contact(data_path, "101M", 0, "N", 27, "CB")
    assert e_close[Efeat.DISTANCE] < e_mid[Efeat.DISTANCE] < e_far[Efeat.DISTANCE]
    assert e_close[Efeat.DISTANCE] == pytest.approx(1.49, abs=0.01)


def test_attractive_electrostatic(data_path) -> None:
    """ARG139:CZ - GLU136:OE2 close attraction is stronger than a far pair."""
    e_close = _get_contact(data_path, "101M", 139, "CZ", 136, "OE2")
    e_far = _get_contact(data_path, "101M", 139, "CZ", 20, "OD2")
    assert e_close[Efeat.ELEC] < 0.0
    assert e_far[Efeat.ELEC] < 0.0
    assert e_far[Efeat.ELEC] > e_close[Efeat.ELEC]


def test_repulsive_electrostatic(data_path) -> None:
    """GLU109:OE2 - GLU105:OE1 (like charges): repulsive energy (reference
    tests/features/test_contact.py:163)."""
    e = _get_contact(data_path, "101M", 109, "OE2", 105, "OE1")
    assert e[Efeat.ELEC] > 0.0


def test_residue_contact_sums(data_path) -> None:
    """Residue edges: distance = min over atom pairs, energies = sums over atom pairs."""
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    arrays = parse_pdb(pdb_path)
    r1 = arrays.find_residue("A", 0)
    r2 = arrays.find_residue("A", 27)
    graph = single_residue_edge_graph(arrays, r1, r2)
    add_features(pdb_path, graph)
    d = graph.edge_features[Efeat.DISTANCE][0]
    assert d > 0

    # oracle: min distance over the explicit atom-pair set
    atoms1 = np.arange(arrays.res_atom_start[r1], arrays.res_atom_start[r1] + arrays.res_atom_count[r1])
    atoms2 = np.arange(arrays.res_atom_start[r2], arrays.res_atom_start[r2] + arrays.res_atom_count[r2])
    dists = np.linalg.norm(arrays.positions[atoms1][:, None, :] - arrays.positions[atoms2][None, :, :], axis=-1)
    assert d == pytest.approx(dists.min())
    assert graph.edge_features[Efeat.SAMECHAIN][0] == 1.0
