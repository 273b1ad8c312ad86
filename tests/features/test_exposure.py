"""Residue depth and half-sphere exposure oracles."""

import numpy as np

from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.features.exposure import add_features

from . import build_testgraph


def test_exposure_residue_graph(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 8.5, 8.5, chain_ids=("A", "B"))
    add_features(pdb_path, graph)

    depth = graph.node_features[Nfeat.RESDEPTH]
    hse = graph.node_features[Nfeat.HSE]
    assert depth.shape == (graph.num_nodes,)
    assert np.all(depth >= 0)
    assert depth.max() > depth.min()  # buried vs surface residues differ
    assert hse.shape == (graph.num_nodes, 3)
    assert np.any(hse[:, 0] + hse[:, 1] > 0)
    # hse_up + hse_down = number of CA neighbors within 12 Å; bounded
    assert (hse[:, 0] + hse[:, 1]).max() < 100


def test_exposure_atom_graph(data_path) -> None:
    """Atomic graphs get their residue's values."""
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, _ = build_testgraph(pdb_path, "atom", 10, 10, central_res=25, chain_ids="A")
    add_features(pdb_path, graph)
    depth = graph.node_features[Nfeat.RESDEPTH]
    res_idx = graph.node_residue_indices
    # atoms of the same residue share the value
    for r in np.unique(res_idx)[:5]:
        sel = depth[res_idx == r]
        assert np.allclose(sel, sel[0])


def test_hse_atomic_method(data_path) -> None:
    """set_hse_method("atomic") counts all other-residue atoms in the half
    spheres (extension beyond the reference's CA-only HSExposureCA); the
    default "ca" method is restored and matches its previous values."""
    from deeprank2_tpu.features.exposure import set_hse_method

    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, chain_ids="A")
    add_features(pdb_path, graph)
    hse_ca = graph.node_features[Nfeat.HSE].copy()

    set_hse_method("atomic")
    try:
        add_features(pdb_path, graph)
        hse_atomic = graph.node_features[Nfeat.HSE].copy()
    finally:
        set_hse_method("ca")

    interior = (hse_ca[:, 0] + hse_ca[:, 1]) > 0  # residues with a valid pCB
    assert interior.any()
    # every CA neighbor is one of many atoms: atomic counts strictly dominate
    assert np.all((hse_atomic[:, 0] + hse_atomic[:, 1])[interior] > (hse_ca[:, 0] + hse_ca[:, 1])[interior])
    # the splitting plane (pCB) is shared -> angle channel identical
    np.testing.assert_allclose(hse_atomic[:, 2], hse_ca[:, 2])

    add_features(pdb_path, graph)
    np.testing.assert_allclose(graph.node_features[Nfeat.HSE], hse_ca)
