"""The C++ SASA kernel must agree exactly with the numpy fallback."""

import numpy as np
import pytest

import deeprank2_tpu.csrc as csrc
from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.utils import sasa as S


@pytest.fixture
def structure(data_path):
    return parse_pdb(str(data_path / "pdb" / "1CRN" / "1CRN.pdb"))


def test_native_matches_numpy(structure, monkeypatch) -> None:
    if csrc.load() is None:
        pytest.skip("native kernels unavailable (no compiler)")
    radii = S.atom_radii(np.asarray(structure.elements))

    areas_native = S.shrake_rupley(structure.positions, radii)
    monkeypatch.setattr(csrc, "load", lambda: None)
    areas_numpy = S.shrake_rupley(structure.positions, radii)
    assert np.allclose(areas_native, areas_numpy, atol=1e-10)


def test_native_points_match_numpy(structure, monkeypatch) -> None:
    if csrc.load() is None:
        pytest.skip("native kernels unavailable (no compiler)")
    radii = S.atom_radii(np.asarray(structure.elements))

    _, pts_native = S.shrake_rupley(structure.positions, radii, n_points=64, return_points=True)
    monkeypatch.setattr(csrc, "load", lambda: None)
    _, pts_numpy = S.shrake_rupley(structure.positions, radii, n_points=64, return_points=True)
    assert pts_native.shape == pts_numpy.shape
    a = np.asarray(sorted(map(tuple, np.round(pts_native, 6))))
    b = np.asarray(sorted(map(tuple, np.round(pts_numpy, 6))))
    assert np.allclose(a, b)
