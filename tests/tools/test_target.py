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


def test_rigid_body_decoys_graded_and_cached(tmp_path, data_path):
    """Decoy generation: graded irmsd sweep, balanced binary labels, and
    deterministic regeneration (cache by file presence)."""
    from deeprank2_tpu.tools.decoys import rigid_body_decoys
    from deeprank2_tpu.tools.target import compute_ppi_scores

    ref = str(data_path / "ref" / "1ATN" / "1ATN.pdb")
    paths = rigid_body_decoys(ref, "B", tmp_path, count=8, seed=7)
    assert len(paths) == 8
    scores = [compute_ppi_scores(p, ref) for p in paths]
    irmsds = [s["irmsd"] for s in scores]
    assert irmsds[0] < 2.0  # smallest perturbation: near-native
    assert irmsds[-1] > 4.0  # largest: incorrect
    binaries = [int(s["binary"]) for s in scores]
    assert 0 < sum(binaries) < len(binaries)  # non-degenerate classes
    # regeneration is a no-op (same bytes)
    first = open(paths[0], "rb").read()
    paths2 = rigid_body_decoys(ref, "B", tmp_path, count=8, seed=7)
    assert paths2 == paths
    assert open(paths[0], "rb").read() == first


def test_reference_bundle_cache_consistency(data_path):
    """The per-reference zone cache returns the same scores as a cold path."""
    from deeprank2_tpu.io.pdb import parse_pdb
    from deeprank2_tpu.tools import similarity

    decoy = str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb")
    ref = str(data_path / "ref" / "1ATN" / "1ATN.pdb")
    sim_cached = similarity.StructureSimilarity(decoy, ref)
    assert sim_cached._ref_bundle is not None
    assert ref in similarity._REF_CACHE
    # cold instance: pre-parsed arrays bypass the bundle cache
    sim_cold = similarity.StructureSimilarity(decoy, parse_pdb(ref))
    assert sim_cold._ref_bundle is None
    for fn in ("compute_lrmsd_fast", "compute_irmsd_fast", "compute_fnat_fast"):
        assert getattr(sim_cached, fn)() == getattr(sim_cold, fn)()


def test_add_target_label_file_comments_and_spacing(tmp_path, data_path):
    """Label files may carry comment lines and repeated separators (the
    np.loadtxt conventions the reference relied on)."""
    import shutil

    import h5py

    from deeprank2_tpu.tools.target import add_target

    hdf5 = tmp_path / "t.hdf5"
    shutil.copy(data_path / "hdf5" / "1ATN_ppi.hdf5", hdf5)
    with h5py.File(hdf5) as f5:
        entry = next(iter(f5.keys()))
    labels = tmp_path / "labels.txt"
    labels.write_text(f"# entry value\n{entry}  0.75\n\n")
    add_target(str(hdf5), "newscore", str(labels))
    with h5py.File(hdf5) as f5:
        assert float(f5[entry]["target_values"]["newscore"][()]) == 0.75
