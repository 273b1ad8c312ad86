"""Output exporter tests (mirrors reference tests/utils/test_exporters.py)."""

import os
from unittest.mock import patch

import numpy as np
import pytest

from deeprank2_tpu.utils.exporters import (
    HDF5OutputExporter,
    OutputExporterCollection,
    ScatterPlotExporter,
    TensorboardBinaryClassificationExporter,
)


@pytest.fixture
def epoch_data():
    entry_names = ["entry1", "entry2", "entry3", "entry4"]
    outputs = [[0.2, 0.8], [0.9, 0.1], [0.4, 0.6], [0.8, 0.2]]
    targets = [1, 0, 1, 0]
    return entry_names, outputs, targets


def test_hdf5_exporter_roundtrip(tmp_path, epoch_data) -> None:
    names, outputs, targets = epoch_data
    exporter = HDF5OutputExporter(str(tmp_path))
    with exporter:
        exporter.process("training", 0, names, outputs, targets, 0.1)
        exporter.process("training", 1, names, outputs, targets, 0.05)
    df = exporter.read("training")
    assert len(df) == 8
    assert set(df["epoch"]) == {0, 1}
    assert df["entry"].iloc[0] == "entry1"
    assert df["output"].iloc[0] == pytest.approx([0.2, 0.8])
    assert df["loss"].iloc[-1] == pytest.approx(0.05)


def test_hdf5_exporter_regression(tmp_path) -> None:
    exporter = HDF5OutputExporter(str(tmp_path))
    with exporter:
        exporter.process("testing", 0, ["a", "b"], [0.5, 1.5], [0.4, None], 0.2)
    df = exporter.read("testing")
    assert df["output"].iloc[1] == pytest.approx(1.5)
    assert np.isnan(df["target"].iloc[1])


def test_tensorboard_exporter(tmp_path, epoch_data) -> None:
    names, outputs, targets = epoch_data
    exporter = TensorboardBinaryClassificationExporter(str(tmp_path))
    scalars = []
    with patch.object(exporter._writer, "add_scalar", lambda tag, value, step: scalars.append((tag, value, step))):
        with exporter:
            exporter.process("training", 0, names, outputs, targets, 0.1)
    tags = {tag for tag, _, _ in scalars}
    assert "training cross entropy loss" in tags
    assert "training MCC" in tags
    assert "training accuracy" in tags
    assert "training ROC AUC" in tags
    accuracy = next(v for t, v, _ in scalars if t == "training accuracy")
    assert accuracy == 1.0  # all four predictions correct


def test_tensorboard_compatibility() -> None:
    exporter = TensorboardBinaryClassificationExporter.__new__(TensorboardBinaryClassificationExporter)
    assert exporter.is_compatible_with(2, 1)
    assert not exporter.is_compatible_with(1, 1)
    assert not exporter.is_compatible_with(2, None)


def test_scatter_plot_exporter(tmp_path) -> None:
    exporter = ScatterPlotExporter(str(tmp_path), epoch_interval=1)
    with exporter:
        exporter.process("training", 0, ["a", "b"], [0.1, 0.9], [0.0, 1.0], 0.1)
        assert os.path.isfile(exporter.get_filename(0))


def test_scatter_plot_compatibility() -> None:
    exporter = ScatterPlotExporter.__new__(ScatterPlotExporter)
    assert exporter.is_compatible_with(1, 1)
    assert not exporter.is_compatible_with(2, 1)


def test_collection(tmp_path, epoch_data) -> None:
    names, outputs, targets = epoch_data
    e1 = HDF5OutputExporter(str(tmp_path / "a"))
    e2 = HDF5OutputExporter(str(tmp_path / "b"))
    collection = OutputExporterCollection(e1, e2)
    with collection:
        collection.process("training", 0, names, outputs, targets, 0.1)
    assert len(e1.read("training")) == 4
    assert len(e2.read("training")) == 4


def test_hdf5_exporter_tolerates_none_epoch(tmp_path) -> None:
    """Testing a pretrained model whose checkpoint predates a best-model save
    passes epoch=None (reference stores NaN via pandas); we write -1."""
    import h5py
    import numpy as np

    from deeprank2_tpu.utils.exporters import HDF5OutputExporter

    exporter = HDF5OutputExporter(str(tmp_path))
    with exporter:
        exporter.process("testing", None, ["e0", "e1"], [[0.2, 0.8], [0.7, 0.3]], [1, 0], 0.5)
    with h5py.File(tmp_path / "output_exporter.hdf5", "r") as f:
        assert np.all(f["testing"]["epoch"][()] == -1)
