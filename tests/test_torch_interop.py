"""Reference (PyTorch) checkpoint migration: load, translate, predict.

Uses the reference's own pretrained fixtures
(tests/data/pretrained/testing_{graph,grid}_model.pth.tar) and validates our
predictions against a numpy re-implementation of the reference forward pass
running directly on the raw torch state_dict.
"""

from __future__ import annotations

import numpy as np
import pytest

from deeprank2_tpu.dataset import GraphDataset, GridDataset
from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification
from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork
from deeprank2_tpu.trainer import Trainer
from deeprank2_tpu.utils.checkpoint import load_checkpoint


@pytest.fixture(scope="module")
def graph_ckpt(data_path):
    from tests.conftest import need

    return str(need(data_path / "pretrained" / "testing_graph_model.pth.tar"))


@pytest.fixture(scope="module")
def grid_ckpt(data_path):
    from tests.conftest import need

    return str(need(data_path / "pretrained" / "testing_grid_model.pth.tar"))


def test_load_reference_checkpoint_schema(graph_ckpt):
    state = load_checkpoint(graph_ckpt)
    assert state["data_type"] == "GraphDataset"
    assert state["model_state_format"] == "torch"
    assert state["target"] == "binary"
    assert state["task"] == "classif"
    assert state["node_features"] == ["bsa", "res_depth", "hse", "info_content", "pssm"]
    assert state["edge_features"] == ["distance"]
    # transforms survive as eval-able source strings (reference storage format)
    assert state["features_transform"]["bsa"]["transform"].startswith("lambda")
    assert isinstance(state["means"]["bsa"], float | np.floating)


def _np_linear(state, prefix, x):
    return x @ np.asarray(state[f"{prefix}.weight"]).T + np.asarray(state[f"{prefix}.bias"])


def _np_vanilla_forward(state, x, edge_index, edge_attr):
    """Reference VanillaNetwork.forward in numpy (vanilla_gnn.py:26-65)."""

    def conv(name, x):
        row, col = edge_index[:, 0], edge_index[:, 1]
        msg_in = np.concatenate([x[row], x[col], edge_attr], axis=1)
        msgs = np.maximum(_np_linear(state, f"{name}._edge_mlp.0", msg_in), 0.0)
        sums = np.zeros((x.shape[0], msgs.shape[1]))
        np.add.at(sums, row, msgs)
        return np.maximum(_np_linear(state, f"{name}._node_mlp.0", np.concatenate([x, sums], axis=1)), 0.0)

    x = conv("_external1", x)
    x = conv("_external2", x)
    pooled = x.mean(axis=0, keepdims=True)
    h = np.maximum(_np_linear(state, "_graph_mlp.0", pooled), 0.0)
    return _np_linear(state, "_graph_mlp.2", h)


def test_pretrained_graph_model_predictions_match_reference_math(graph_ckpt, data_path, tmp_path):
    import jax

    from deeprank2_tpu.ops.batch import collate_graphs

    from tests.conftest import need

    hdf5 = str(need(data_path / "hdf5" / "test.hdf5"))
    ds = GraphDataset(hdf5_path=hdf5, train_source=graph_ckpt)
    trainer = Trainer(VanillaNetwork, dataset_test=ds, pretrained_model=graph_ckpt, output_exporters=[])
    trainer.test(batch_size=4)

    raw = load_checkpoint(graph_ckpt)["model_state"]
    for idx in range(min(3, len(ds))):
        entry = ds.get(idx)
        # entries store undirected edges; the reference mirrors them at load
        # (dataset.py:944-951), our collator at collation — mirror the oracle's
        und = np.asarray(entry["edge_index"])
        ei = np.concatenate([und, und[:, ::-1]], axis=0)
        ea = np.concatenate([np.asarray(entry["edge_attr"])] * 2, axis=0)
        oracle = _np_vanilla_forward(raw, np.asarray(entry["x"]), ei, ea)
        batch, _ = collate_graphs([entry])
        ours = np.asarray(trainer.model.apply(jax.tree.map(np.asarray, trainer.params), batch))
        np.testing.assert_allclose(ours[0], oracle[0], rtol=1e-4, atol=1e-4)


def test_pretrained_grid_model_runs(grid_ckpt, data_path):
    from tests.conftest import need

    hdf5 = str(need(data_path / "hdf5" / "1ATN_ppi.hdf5"))
    ds = GridDataset(hdf5_path=hdf5, train_source=grid_ckpt)
    trainer = Trainer(CnnClassification, dataset_test=ds, pretrained_model=grid_ckpt, output_exporters=[])
    trainer.test(batch_size=2)


def test_unsupported_architecture_raises(graph_ckpt):
    from deeprank2_tpu.neuralnets.torch_interop import translate_state_dict

    with pytest.raises(ValueError, match="supported architectures"):
        translate_state_dict("AlignmentGNN", {})
