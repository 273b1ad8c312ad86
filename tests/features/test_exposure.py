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


def test_residue_depth_numerical_oracle(data_path) -> None:
    """Numerical accuracy bound for the default residue-depth method
    (surface sampling + offset) against the independent exact grid-EDT
    solvent-excluded surface (utils/ses.py — MSMS-faithful geometry, its own
    oracle tests in tests/utils/test_ses.py). Closes the round-2 finding
    that exposure asserted only ranges/monotonicity: the two implementations
    must agree within a stated tolerance (measured on 101M: mean |d| 0.42 A,
    max 2.0 A, r = 0.92)."""
    from deeprank2_tpu.features.exposure import set_depth_method

    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, chain_ids="A")
    add_features(pdb_path, graph)
    d_fast = graph.node_features[Nfeat.RESDEPTH].copy()

    set_depth_method("ses_edt")
    try:
        add_features(pdb_path, graph)
        d_exact = graph.node_features[Nfeat.RESDEPTH].copy()
    finally:
        set_depth_method("sas_offset")

    diff = np.abs(d_fast - d_exact)
    assert diff.mean() <= 0.7, f"mean |depth diff| {diff.mean():.3f} A vs exact SES"
    assert diff.max() <= 3.0, f"max |depth diff| {diff.max():.3f} A vs exact SES"
    assert np.corrcoef(d_fast, d_exact)[0, 1] >= 0.85


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
