"""SASA/BSA feature oracles (mirrors reference tests/features/test_surfacearea.py scenarios)."""

import numpy as np

from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.features.surfacearea import add_features
from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.utils.sasa import atom_radii, shrake_rupley

from . import build_testgraph


def test_sasa_residue_graph(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 8.5, 8.5, chain_ids=("A", "B"))
    add_features(pdb_path, graph)

    sasa = graph.node_features[Nfeat.SASA]
    assert sasa.shape == (graph.num_nodes,)
    assert np.all(sasa >= 0)
    assert np.any(sasa > 0)
    assert not np.any(np.isnan(sasa))


def test_bsa_interface_positive(data_path) -> None:
    """Interface residues bury area: BSA must be positive for a solid fraction."""
    pdb_path = str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 8.5, 8.5, chain_ids=("A", "B"))
    add_features(pdb_path, graph)

    bsa = graph.node_features[Nfeat.BSA]
    assert np.all(bsa >= -1e-6)
    assert (bsa > 1.0).mean() > 0.2


def test_sasa_atom_graph(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, _ = build_testgraph(pdb_path, "atom", 10, 10, central_res=25, chain_ids="A")
    add_features(pdb_path, graph)
    sasa = graph.node_features[Nfeat.SASA]
    assert sasa.shape == (graph.num_nodes,)
    assert np.any(sasa > 0)


def test_shrake_rupley_sphere_oracle() -> None:
    """A single atom's SASA is the full solvent-extended sphere area."""
    areas = shrake_rupley(np.zeros((1, 3)), np.array([1.8]))
    expected = 4 * np.pi * (1.8 + 1.4) ** 2
    assert abs(areas[0] - expected) / expected < 1e-6

    # two far-apart atoms: both fully exposed; two coincident: half-ish buried each
    areas2 = shrake_rupley(np.array([[0.0, 0, 0], [100.0, 0, 0]]), np.array([1.8, 1.8]))
    assert np.allclose(areas2, expected, rtol=1e-6)
    areas3 = shrake_rupley(np.array([[0.0, 0, 0], [1.0, 0, 0]]), np.array([1.8, 1.8]))
    assert np.all(areas3 < expected * 0.75)


def test_total_sasa_plausible(data_path) -> None:
    """Whole-structure SASA of 101M in the typical range for a ~150-residue protein."""
    arrays = parse_pdb(str(data_path / "pdb" / "101M" / "101M.pdb"))
    areas = shrake_rupley(arrays.positions, atom_radii(np.asarray(arrays.elements)))
    total = areas.sum()
    assert 6000 < total < 12000  # Å^2, myoglobin-sized protein
