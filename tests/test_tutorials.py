"""Smoke tests for the runnable tutorial scripts (tutorials/*.py), mirroring
the reference's notebook tutorials (/root/reference/tutorials/TUTORIAL.md).

Each tutorial runs in demo mode on the vendored corpus with tiny settings:
featurize a handful of structures, then train both model families for a
couple of epochs end-to-end.
"""

from __future__ import annotations

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tutorials import data_generation_ppi, data_generation_srv, training  # noqa: E402


@pytest.fixture(scope="module")
def ppi_residue_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tutorial") / "ppi")
    data_generation_ppi.main(["--out", out, "--limit", "6", "--resolutions", "residue"])
    return os.path.join(out, "residue")


def test_data_generation_ppi(ppi_residue_dir):
    files = glob.glob(os.path.join(ppi_residue_dir, "*.hdf5"))
    assert files
    import h5py

    n_demo = len(data_generation_ppi.load_inputs(None, 6)[0])
    entries = []
    for f in files:
        with h5py.File(f, "r") as h:
            for mol in h:
                entries.append(mol)
                assert "node_features" in h[mol]
                assert "grid_points" in h[mol] or "mapped_features" in h[mol]
    assert len(entries) == n_demo


def test_data_generation_srv(tmp_path):
    out = str(tmp_path / "srv")
    data_generation_srv.main(["--out", out, "--resolutions", "residue", "--no-grids"])
    files = glob.glob(os.path.join(out, "residue", "*.hdf5"))
    assert files
    import h5py

    n = sum(len(list(h5py.File(f, "r"))) for f in files)
    assert n == len(data_generation_srv.DEMO_VARIANTS)


def test_training_tutorial(ppi_residue_dir):
    training.main(["--data", ppi_residue_dir, "--epochs", "2", "--batch-size", "4"])
    for sub in ("gnn_classif", "cnn_classif"):
        assert os.path.exists(os.path.join(ppi_residue_dir, sub, "output_exporter.hdf5"))
        assert os.path.exists(os.path.join(ppi_residue_dir, sub, "model.pth.tar"))
