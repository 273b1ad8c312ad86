"""Target tools tests, with the reference's stored pdb2sql scores as oracles."""

import shutil

import h5py
import numpy as np
import pytest

from deeprank2_tpu.tools.similarity import StructureSimilarity
from deeprank2_tpu.tools.target import add_target, compute_ppi_scores

# pdb2sql-computed scores stored in the reference fixture
# (tests/data/hdf5/1ATN_ppi.hdf5 target_values)
PDB2SQL_ORACLE = {
    "1ATN_1w": {"dockq": 0.0274, "fnat": 0.0441, "irmsd": 14.919, "lrmsd": 50.124},
    "1ATN_2w": {"dockq": 0.0269, "fnat": 0.0441, "irmsd": 15.25, "lrmsd": 51.097},
    "1ATN_3w": {"dockq": 0.0321, "fnat": 0.0588, "irmsd": 15.444, "lrmsd": 49.839},
    "1ATN_4w": {"dockq": 0.0108, "fnat": 0.0, "irmsd": 16.19, "lrmsd": 54.482},
}


@pytest.mark.parametrize("decoy", sorted(PDB2SQL_ORACLE))
def test_scores_match_pdb2sql(data_path, decoy) -> None:
    scores = compute_ppi_scores(
        str(data_path / "pdb" / "1ATN" / f"{decoy}.pdb"),
        str(data_path / "ref" / "1ATN" / "1ATN.pdb"),
    )
    oracle = PDB2SQL_ORACLE[decoy]
    assert scores["lrmsd"] == pytest.approx(oracle["lrmsd"], abs=0.01)
    assert scores["irmsd"] == pytest.approx(oracle["irmsd"], abs=0.01)
    assert scores["fnat"] == pytest.approx(oracle["fnat"], abs=0.001)
    assert scores["dockq"] == pytest.approx(oracle["dockq"], abs=0.001)
    assert scores["binary"] == (scores["irmsd"] < 4)
    assert scores["capri_class"] == 4


def test_native_is_perfect(data_path) -> None:
    """Scoring the native against itself: zero rmsd, fnat 1, dockq 1."""
    native = str(data_path / "ref" / "1ATN" / "1ATN.pdb")
    scores = compute_ppi_scores(native, native)
    assert scores["lrmsd"] == pytest.approx(0.0, abs=1e-6)
    assert scores["irmsd"] == pytest.approx(0.0, abs=1e-6)
    assert scores["fnat"] == 1.0
    assert scores["dockq"] == pytest.approx(1.0, abs=1e-6)
    assert scores["binary"]
    assert scores["capri_class"] == 1


def test_add_target(tmp_path, srv_hdf5) -> None:
    graph_path = str(tmp_path / "copy.hdf5")
    shutil.copy(srv_hdf5, graph_path)
    with h5py.File(graph_path) as f:
        entries = list(f.keys())

    target_file = tmp_path / "targets.lst"
    with open(target_file, "w", encoding="utf-8") as f:
        for i, entry in enumerate(entries):
            f.write(f"{entry} {i * 10}\n")

    add_target(graph_path, "custom", str(target_file))
    with h5py.File(graph_path) as f:
        for i, entry in enumerate(entries):
            assert f[entry]["target_values"]["custom"][()] == i * 10


def test_superpose_identity() -> None:
    from deeprank2_tpu.tools.similarity import superpose, superposed_rmsd

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(30, 3))
    # random rotation + translation
    from deeprank2_tpu.utils.grid import rotation_matrix

    rot = rotation_matrix(np.array([0.3, 0.5, 0.8]), 1.1)
    moved = pts @ rot.T + np.array([1.0, -2.0, 3.0])
    assert superposed_rmsd(moved, pts) == pytest.approx(0.0, abs=1e-9)
    r, t = superpose(moved, pts)
    assert np.allclose(moved @ r.T + t, pts, atol=1e-9)
