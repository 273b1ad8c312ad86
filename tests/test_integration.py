"""Full-chain integration tests (mirrors reference tests/test_integration.py):
compute_ppi_scores -> QueryCollection.process -> dataset -> train -> reload."""

import h5py
import numpy as np
import pytest

from deeprank2_tpu.dataset import GraphDataset, GridDataset
from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification
from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
from deeprank2_tpu.query import ProteinProteinInterfaceQuery, QueryCollection
from deeprank2_tpu.tools.target import compute_ppi_scores
from deeprank2_tpu.trainer import Trainer
from deeprank2_tpu.utils.grid import GridSettings, MapMethod


@pytest.fixture(scope="module")
def ppi_dataset(tmp_path_factory, data_path):
    """Scored + processed PPI dataset with graphs and grids (4 decoys)."""
    out = tmp_path_factory.mktemp("integration") / "ppi"
    collection = QueryCollection()
    for i in range(1, 5):
        pdb_path = str(data_path / "pdb" / "1ATN" / f"1ATN_{i}w.pdb")
        targets = compute_ppi_scores(pdb_path, str(data_path / "ref" / "1ATN" / "1ATN.pdb"))
        targets["binary"] = int(targets["binary"])
        collection.add(
            ProteinProteinInterfaceQuery(
                pdb_path=pdb_path,
                resolution="residue",
                chain_ids=["A", "B"],
                targets=targets,
            )
        )
    paths = collection.process(
        prefix=str(out),
        feature_modules=["components", "contact"],
        cpu_count=2,
        grid_settings=GridSettings([12, 12, 12], [30.0, 30.0, 30.0]),
        grid_map_method=MapMethod.FAST_GAUSSIAN,
    )
    return paths[0]


def test_entries_complete(ppi_dataset) -> None:
    with h5py.File(ppi_dataset) as f:
        assert len(f.keys()) == 4
        for entry in f.values():
            assert "node_features" in entry
            assert "mapped_features" in entry
            assert "irmsd" in entry["target_values"]
            assert "dockq" in entry["target_values"]


def test_graph_training_chain(ppi_dataset, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=ppi_dataset, target="irmsd")
    trainer = Trainer(GINet, dataset_train=ds, output_exporters=[])
    model_path = str(tmp_path / "chain.pth.tar")
    trainer.train(nepoch=3, batch_size=2, filename=model_path)

    ds_test = GraphDataset(hdf5_path=ppi_dataset, train_source=model_path)
    trainer2 = Trainer(GINet, dataset_test=ds_test, pretrained_model=model_path)
    trainer2.test(batch_size=2)


def test_grid_training_chain(ppi_dataset, tmp_path) -> None:
    ds = GridDataset(hdf5_path=ppi_dataset, target="binary")
    trainer = Trainer(CnnClassification, dataset_train=ds, output_exporters=[])
    trainer.train(nepoch=2, batch_size=2, filename=None)


def test_exported_outputs(ppi_dataset, tmp_path) -> None:
    from deeprank2_tpu.utils.exporters import HDF5OutputExporter

    ds = GraphDataset(hdf5_path=ppi_dataset, target="irmsd")
    exporter = HDF5OutputExporter(str(tmp_path))
    trainer = Trainer(GINet, dataset_train=ds, output_exporters=[exporter])
    trainer.train(nepoch=2, batch_size=2, filename=None)
    df = exporter.read("training")
    assert len(df) == 4 * 3  # 4 entries x (epoch 0 eval + 2 epochs)
    assert np.isfinite(df["loss"]).all()


@pytest.fixture(scope="module")
def atom_ppi_dataset(tmp_path_factory, data_path):
    """Atom-resolution PPI dataset (the FoutNet/sGAT BASELINE config)."""
    out = tmp_path_factory.mktemp("integration") / "atomppi"
    collection = QueryCollection()
    for i in range(1, 5):
        collection.add(
            ProteinProteinInterfaceQuery(
                pdb_path=str(data_path / "pdb" / "1ATN" / f"1ATN_{i}w.pdb"),
                resolution="atom",
                chain_ids=["A", "B"],
                targets={"binary": i % 2},
            )
        )
    paths = collection.process(prefix=str(out), feature_modules=["components", "contact"], cpu_count=2)
    return paths[0]


def test_foutnet_atom_ppi(atom_ppi_dataset) -> None:
    from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet

    ds = GraphDataset(hdf5_path=atom_ppi_dataset, target="binary", clustering_method="mcl")
    trainer = Trainer(FoutNet, dataset_train=ds, output_exporters=[])
    trainer.train(nepoch=2, batch_size=2, filename=None)


def test_sgat_atom_ppi(atom_ppi_dataset) -> None:
    from deeprank2_tpu.neuralnets.gnn.sgat import SGAT

    ds = GraphDataset(hdf5_path=atom_ppi_dataset, target="binary", clustering_method="mcl", edge_features=["distance"])
    trainer = Trainer(SGAT, dataset_train=ds, output_exporters=[])
    trainer.train(nepoch=2, batch_size=2, filename=None)


def test_blocksparse_atom_ppi(atom_ppi_dataset, tmp_path) -> None:
    """PDB -> atomic featurization -> block-sparse (BCSR) GINet training —
    the large-graph path end to end, including the graph-parallel variant."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

    ds = GraphDataset(hdf5_path=atom_ppi_dataset, target="binary")
    trainer = Trainer(GINetBlockSparse, dataset_train=ds, output_exporters=[])
    trainer.train(nepoch=2, batch_size=2, filename=str(tmp_path / "bs.pth.tar"))

    if jax.device_count() >= 2:
        from deeprank2_tpu.parallel.blocksparse_partition import GINetBlockSparseGP

        ds_gp = GraphDataset(hdf5_path=atom_ppi_dataset, target="binary")
        trainer_gp = Trainer(GINetBlockSparseGP, dataset_train=ds_gp, output_exporters=[])
        trainer_gp.train(nepoch=1, batch_size=2, filename=None)


def test_grid_data_parallel(grid_hdf5) -> None:
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GridDataset(hdf5_path=grid_hdf5, target="binary")
    trainer = Trainer(CnnClassification, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer.train(nepoch=1, batch_size=8, filename=None)


def test_blocked_edges_atom_ppi(atom_ppi_dataset, tmp_path) -> None:
    """PDB -> atomic featurization -> blocked-edge VanillaNetwork training —
    the per-edge-feature fast path end to end, and checkpoint interop with
    the COO model (same parameter pytree)."""
    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork, VanillaNetworkBlocked

    ds = GraphDataset(hdf5_path=atom_ppi_dataset, target="binary")
    trainer = Trainer(VanillaNetworkBlocked, dataset_train=ds, output_exporters=[])
    model_path = str(tmp_path / "blocked.pth.tar")
    trainer.train(nepoch=2, batch_size=2, filename=model_path)

    # a checkpoint trained on the blocked path loads on the COO model
    ds_test = GraphDataset(hdf5_path=atom_ppi_dataset, train_source=model_path)
    trainer2 = Trainer(VanillaNetwork, dataset_test=ds_test, pretrained_model=model_path)
    trainer2.test(batch_size=2)
