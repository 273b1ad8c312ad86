"""Oracles for the grid-EDT solvent-excluded-surface depth (utils/ses.py)."""

import numpy as np
import pytest

from deeprank2_tpu.utils.ses import atom_ses_depth


def test_isolated_sphere_depth_equals_radius():
    """The SES of one atom is its vdW sphere: center depth == radius."""
    for radius in (1.4, 1.8):
        depth = atom_ses_depth(np.zeros((1, 3)), np.array([radius]), spacing=0.3)
        assert depth[0] == pytest.approx(radius, abs=0.35)


def test_distant_pair_depths_are_independent():
    positions = np.array([[0.0, 0.0, 0.0], [20.0, 0.0, 0.0]])
    radii = np.array([1.8, 1.4])
    depth = atom_ses_depth(positions, radii, spacing=0.3)
    assert depth[0] == pytest.approx(1.8, abs=0.35)
    assert depth[1] == pytest.approx(1.4, abs=0.35)


def test_reentrant_surface_is_excluded():
    """Two spheres 1 Å apart: the probe cannot roll into the neck between
    them, so the midpoint belongs to the SES interior (depth > 0) even though
    it is outside both vdW spheres — the defining property MSMS has and the
    SAS-offset approximation lacks."""
    positions = np.array([[0.0, 0.0, 0.0], [4.2, 0.0, 0.0]])
    radii = np.array([1.8, 1.8])
    depth = atom_ses_depth(np.vstack([positions, [[2.1, 0.0, 0.0]]]), np.array([1.8, 1.8, 0.0]), spacing=0.3)
    assert depth[2] > 0.2  # midpoint is solvent-excluded

    # a 20 Å gap is reachable by the probe: midpoint depth is 0
    positions_far = np.array([[0.0, 0.0, 0.0], [20.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    depth_far = atom_ses_depth(positions_far, np.array([1.8, 1.8, 0.0]), spacing=0.3)
    assert depth_far[2] == 0.0


def test_hydrogens_do_not_shape_surface_but_get_depths():
    positions = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
    radii = np.array([1.8, 0.0])  # second atom is H
    depth = atom_ses_depth(positions, radii, spacing=0.3)
    assert depth[1] > 0.5  # sampled inside the heavy atom's SES


def test_feature_switch_on_real_structure(data_path):
    """ses_edt and the default sas_offset agree broadly on a real protein."""
    from deeprank2_tpu.domain import nodestorage as Nfeat
    from deeprank2_tpu.features import exposure
    from tests.features import build_testgraph

    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, chain_ids="A")
    exposure.add_features(pdb_path, graph)
    sas_depth = graph.node_features[Nfeat.RESDEPTH].copy()

    exposure.set_depth_method("ses_edt")
    try:
        exposure.add_features(pdb_path, graph)
        ses_depth = graph.node_features[Nfeat.RESDEPTH].copy()
    finally:
        exposure.set_depth_method("sas_offset")

    assert np.all(ses_depth >= 0)
    assert ses_depth.max() > ses_depth.min()
    # the two estimates rank residues the same way (burial ordering)
    corr = np.corrcoef(sas_depth, ses_depth)[0, 1]
    assert corr > 0.8

    with pytest.raises(ValueError, match="unknown depth method"):
        exposure.set_depth_method("nope")
