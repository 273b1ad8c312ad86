"""Trainer smoke tests: one short training run per architecture, save/load
round trips, invalid-combination errors (mirrors the reference test strategy,
tests/test_trainer.py)."""

import numpy as np
import pytest

from deeprank2_tpu.dataset import GraphDataset, GridDataset
from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification, CnnRegression
from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet
from deeprank2_tpu.neuralnets.gnn.ginet import GINet
from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet as GINetNoCluster
from deeprank2_tpu.neuralnets.gnn.sgat import SGAT
from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork
from deeprank2_tpu.trainer import Trainer


def _train(model_class, dataset, tmp_path, nepoch=2, batch_size=4, **train_kwargs):
    trainer = Trainer(model_class, dataset_train=dataset, output_exporters=[])
    trainer.train(nepoch=nepoch, batch_size=batch_size, filename=str(tmp_path / "model.pth.tar"), **train_kwargs)
    return trainer


def test_vanilla_classif(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = _train(VanillaNetwork, ds, tmp_path)
    assert trainer.epoch_saved_model is not None


def test_vanilla_regression(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="irmsd")
    _train(VanillaNetwork, ds, tmp_path)


def test_ginet_mcl(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl")
    _train(GINet, ds, tmp_path, validate=True)


def test_ginet_nocluster(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    _train(GINetNoCluster, ds, tmp_path)


def test_clustered_dense_models(srv_hdf5, tmp_path) -> None:
    """Dense clustered models train through the Trainer (preclustering + dense collation)."""
    from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNetDense
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDense
    from deeprank2_tpu.neuralnets.gnn.sgat import SGATDense

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl")
    _train(GINetClusteredDense, ds, tmp_path)
    _train(FoutNetDense, ds, tmp_path)
    ds_sgat = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl", edge_features=["distance"])
    _train(SGATDense, ds_sgat, tmp_path)


def test_ginet_dense(srv_hdf5, tmp_path) -> None:
    """The block-dense MXU GINet trains through the same Trainer surface."""
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = _train(GINetDense, ds, tmp_path)
    assert trainer.epoch_saved_model is not None


def test_ginet_blocksparse(srv_hdf5, tmp_path) -> None:
    """The BCSR large-graph GINet trains through the same Trainer surface,
    with grow-only bucketed tile/block capacities."""
    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = _train(GINetBlockSparse, ds, tmp_path)
    assert trainer.epoch_saved_model is not None
    caps = trainer._bs_caps
    assert caps["tiles"] > 0 and caps["blocks"] > 0
    # capacities never shrink: re-collating a single entry keeps the caps
    trainer._collate([ds.get(0)], pad_graphs=1)
    assert trainer._bs_caps == caps

    # pretrained reload produces identical predictions (checkpoints are
    # interchangeable with the COO GINet parameter pytree)
    model_path = str(tmp_path / "model.pth.tar")
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    trainer2 = Trainer(GINetBlockSparse, dataset_test=ds_test, pretrained_model=model_path)
    trainer2.test(batch_size=4)


def test_clustered_blocksparse_models(srv_hdf5, tmp_path) -> None:
    """The clustered BCSR fast-path models (GINet clustered / FoutNet / sGAT)
    train through the same Trainer surface: preclustering + the clustered
    block-sparse collation with grow-only capacity buckets."""
    from deeprank2_tpu.neuralnets.gnn.clustered_blocksparse import (
        FoutNetBlockSparse,
        GINetClusteredBlockSparse,
        SGATBlockSparse,
    )

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl")
    trainer = _train(GINetClusteredBlockSparse, ds, tmp_path)
    assert trainer.epoch_saved_model is not None
    caps = trainer._bs_caps
    assert caps["pooled_tiles"] > 0 and caps["c1"] > 0

    # checkpoints interchange with the clustered COO GINet
    model_path = str(tmp_path / "model.pth.tar")
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path, clustering_method="mcl")
    trainer2 = Trainer(GINet, dataset_test=ds_test, pretrained_model=model_path)
    trainer2.test(batch_size=4)

    _train(FoutNetBlockSparse, ds, tmp_path)
    ds_sgat = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl", edge_features=["distance"])
    _train(SGATBlockSparse, ds_sgat, tmp_path)

    # data-parallel variant (sharded clustered collation over the mesh)
    trainer_dp = Trainer(GINetClusteredBlockSparse, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer_dp.train(nepoch=1, batch_size=4, filename=None, best_model=False)


def test_diag_clustered_model(srv_hdf5, tmp_path) -> None:
    """GINetClusteredDiag (graph-diagonal clustered fast path) trains through
    the Trainer: preclustering + diag-clustered collation with grow-only
    buckets; checkpoints interchange with the clustered COO GINet; DP trains."""
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDiag

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl")
    trainer = _train(GINetClusteredDiag, ds, tmp_path)
    assert trainer.epoch_saved_model is not None
    assert trainer._bs_caps["dc_nodes"] > 0 and trainer._bs_caps["dc_clusters"] > 0

    model_path = str(tmp_path / "model.pth.tar")
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path, clustering_method="mcl")
    trainer2 = Trainer(GINet, dataset_test=ds_test, pretrained_model=model_path)
    trainer2.test(batch_size=4)

    trainer_dp = Trainer(GINetClusteredDiag, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer_dp.train(nepoch=1, batch_size=4, filename=None, best_model=False)

    from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNetDiag

    _train(FoutNetDiag, ds, tmp_path)

    from deeprank2_tpu.neuralnets.gnn.sgat import SGATDiag

    ds_sgat = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl", edge_features=["distance"])
    _train(SGATDiag, ds_sgat, tmp_path)


def test_foutnet(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl")
    _train(FoutNet, ds, tmp_path)


def test_sgat(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary", clustering_method="mcl", edge_features=["distance"])
    _train(SGAT, ds, tmp_path)


def test_cnn_classif(grid_hdf5, tmp_path) -> None:
    ds = GridDataset(hdf5_path=grid_hdf5, target="binary")
    _train(CnnClassification, ds, tmp_path, batch_size=2)


def test_cnn_regression(grid_hdf5, tmp_path) -> None:
    ds = GridDataset(hdf5_path=grid_hdf5, target="irmsd")
    _train(CnnRegression, ds, tmp_path, batch_size=2)


def test_save_load_same_predictions(srv_hdf5, tmp_path) -> None:
    """A reloaded pretrained model produces the same predictions."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = _train(VanillaNetwork, ds, tmp_path, nepoch=3)

    with trainer._output_exporters:
        trainer._eval(ds, 0, "testing", 4)

    model_path = str(tmp_path / "model.pth.tar")
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    trainer2 = Trainer(VanillaNetwork, dataset_test=ds_test, pretrained_model=model_path)
    trainer2._build_step_functions()

    for i in range(len(ds)):
        entry = [ds.get(i)]
        batch1, _ = trainer._collate(entry, pad_graphs=1)
        batch2, _ = trainer2._collate([ds_test.get(i)], pad_graphs=1)
        _, pred1 = trainer._eval_step(trainer.params, batch1)
        _, pred2 = trainer2._eval_step(trainer2.params, batch2)
        assert np.allclose(np.asarray(pred1), np.asarray(pred2), atol=1e-6)


def test_pretrained_on_unlabeled_data(srv_hdf5, tmp_path, data_path) -> None:
    """Inference on data without the target present (benchmark scenario)."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    _train(VanillaNetwork, ds, tmp_path)
    model_path = str(tmp_path / "model.pth.tar")

    # build an unlabeled dataset (no targets at all)
    from deeprank2_tpu.molstruct.aminoacid import alanine, phenylalanine
    from deeprank2_tpu.query import QueryCollection, SingleResidueVariantQuery

    qc = QueryCollection()
    qc.add(
        SingleResidueVariantQuery(
            pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
            resolution="residue",
            chain_ids="A",
            variant_residue_number=27,
            insertion_code=None,
            wildtype_amino_acid=alanine,
            variant_amino_acid=phenylalanine,
            pssm_paths={"A": str(data_path / "pssm" / "101M" / "101M.A.pdb.pssm")},
        )
    )
    paths = qc.process(prefix=str(tmp_path / "unlabeled"), feature_modules=["components", "contact", "conservation"], cpu_count=1)

    ds_new = GraphDataset(hdf5_path=paths[0], train_source=model_path)
    trainer = Trainer(VanillaNetwork, dataset_test=ds_new, pretrained_model=model_path)
    trainer.test(batch_size=1)


def test_train_val_split(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, val_size=0.25, output_exporters=[])
    assert len(trainer.dataset_train) == 6
    assert len(trainer.dataset_val) == 2
    trainer.train(nepoch=1, batch_size=4, validate=True, filename=None)


def test_split_is_seeded(srv_hdf5) -> None:
    """Same Trainer seed -> same train/val partition (a resumed run would
    otherwise leak trained entries into validation)."""
    def split_names(seed):
        ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
        t = Trainer(VanillaNetwork, dataset_train=ds, val_size=0.25, output_exporters=[], seed=seed)
        return [e[1] for e in t.dataset_val.index_entries]

    assert split_names(42) == split_names(42)
    assert split_names(42) != split_names(7) or len(split_names(42)) == 0


def test_data_parallel_uneven_batch(srv_hdf5) -> None:
    """Regression: batch_size not divisible by device count must not overfill
    shards (per-shard capacity was floor-divided)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[], data_parallel=True)
    # 8 entries on 8 devices with batch_size 6: ceil(6/8)=1 graph per shard
    trainer.train(nepoch=1, batch_size=6, filename=None)


def test_trim_lambda_source() -> None:
    from deeprank2_tpu.trainer import _trim_lambda_source

    assert _trim_lambda_source("lambda t: np.log(t + 10)}}") == "lambda t: np.log(t + 10)"
    assert _trim_lambda_source('lambda t: t, "standardize": True}') == "lambda t: t"
    assert _trim_lambda_source("lambda t: (t, t * 2)},") == "lambda t: (t, t * 2)"
    assert _trim_lambda_source("lambda") is None


def test_checkpoint_lambda_ending_in_call_roundtrips(srv_hdf5, tmp_path) -> None:
    """A features_transform lambda ending in a call survives save -> inherit
    (the old rstrip ate its closing paren, corrupting the checkpoint)."""
    ds = GraphDataset(
        hdf5_path=srv_hdf5,
        target="binary",
        features_transform={"res_mass": {"transform": lambda t: np.log(t + 10)}},
    )
    trainer = _train(VanillaNetwork, ds, tmp_path)
    model_path = str(tmp_path / "model.pth.tar")
    ds2 = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    t2 = Trainer(VanillaNetwork, dataset_test=ds2, pretrained_model=model_path)
    t2.test(batch_size=4)


def test_class_weights(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, class_weights=True, output_exporters=[])
    trainer.train(nepoch=1, batch_size=4, filename=None)
    assert trainer.weights is not None


def test_early_stopping(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, val_size=0.25, output_exporters=[])
    trainer.train(nepoch=5, batch_size=4, validate=True, earlystop_patience=1, filename=None)


def test_data_parallel(srv_hdf5, tmp_path) -> None:
    """DP over the virtual 8-device CPU mesh."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer.train(nepoch=1, batch_size=8, filename=None)


def test_data_parallel_dense(srv_hdf5, tmp_path) -> None:
    """DP with the block-dense model: batches shard on the graph axis."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(GINetDense, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer.train(nepoch=1, batch_size=8, filename=None)


def test_graph_parallel_blocksparse(srv_hdf5, tmp_path) -> None:
    """Graph-parallel block-sparse model: each batch's row tiles span the
    whole virtual mesh; checkpoints interchange with the single-device model."""
    import jax

    from deeprank2_tpu.parallel.blocksparse_partition import GINetBlockSparseGP

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = _train(GINetBlockSparseGP, ds, tmp_path)
    assert trainer.epoch_saved_model is not None

    # composing with DP is rejected
    with pytest.raises(ValueError, match="graph_parallel"):
        t2 = Trainer(GINetBlockSparseGP, dataset_train=ds, output_exporters=[], data_parallel=True)
        t2.train(nepoch=1, batch_size=4, filename=None)

    # checkpoint loads into the single-device block-sparse model
    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

    model_path = str(tmp_path / "model.pth.tar")
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    trainer3 = Trainer(GINetBlockSparse, dataset_test=ds_test, pretrained_model=model_path)
    trainer3.test(batch_size=4)


def test_graph_parallel_blocksparse_ring(srv_hdf5, tmp_path) -> None:
    """Ring-halo graph-parallel model: Trainer collation dispatch + train/test
    round trip; checkpoints interchange with the single-device model."""
    import jax

    from deeprank2_tpu.parallel.blocksparse_partition import GINetBlockSparseRing

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = _train(GINetBlockSparseRing, ds, tmp_path)
    assert trainer.epoch_saved_model is not None

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

    model_path = str(tmp_path / "model.pth.tar")
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    trainer3 = Trainer(GINetBlockSparse, dataset_test=ds_test, pretrained_model=model_path)
    trainer3.test(batch_size=4)


def test_data_parallel_blocksparse(srv_hdf5, tmp_path) -> None:
    """DP with the block-sparse model: whole graphs balance across shards."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(GINetBlockSparse, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer.train(nepoch=1, batch_size=8, filename=None)


def test_ginet_sigmoid(srv_hdf5, tmp_path) -> None:
    """GINet regression with sigmoid target transform (reference
    tests/test_trainer.py:154)."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="irmsd", task="regress", target_transform=True, clustering_method="mcl")
    trainer = _train(GINet, ds, tmp_path, nepoch=1)
    assert trainer.epoch_saved_model is not None


def test_incompatible_exporter_regression(srv_hdf5, tmp_path) -> None:
    """The binary-classification TensorBoard exporter must be rejected for a
    regression task (reference tests/test_trainer.py:287)."""
    from deeprank2_tpu.utils.exporters import TensorboardBinaryClassificationExporter

    ds = GraphDataset(hdf5_path=srv_hdf5, target="irmsd", task="regress")
    with pytest.raises(ValueError, match="compatible"):
        Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[TensorboardBinaryClassificationExporter(str(tmp_path))])


def test_incompatible_no_pretrained_no_net(srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    with pytest.raises(ValueError, match="[Nn]o neural network"):
        Trainer(neuralnet=None, dataset_train=ds)


def test_incompatible_pretrained_no_test(srv_hdf5, tmp_path) -> None:
    """A pretrained model needs a test dataset (reference :355) and a network
    class (reference :375)."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    model_path = str(tmp_path / "model.pth.tar")
    _train(VanillaNetwork, ds, tmp_path)
    with pytest.raises(ValueError, match="dataset_test"):
        Trainer(VanillaNetwork, pretrained_model=model_path)
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    with pytest.raises(ValueError, match="[Nn]o neural network"):
        Trainer(neuralnet=None, dataset_test=ds_test, pretrained_model=model_path)


def test_train_method_no_train(srv_hdf5, tmp_path) -> None:
    """Calling train() on a pretrained test-only Trainer errors (reference :658)."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    model_path = str(tmp_path / "model.pth.tar")
    _train(VanillaNetwork, ds, tmp_path)
    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    trainer = Trainer(VanillaNetwork, dataset_test=ds_test, pretrained_model=model_path)
    with pytest.raises(ValueError, match="[Nn]o training dataset"):
        trainer.train(nepoch=1, batch_size=4, filename=None)


def test_dataset_equivalence_no_pretrained(srv_hdf5) -> None:
    """val/test datasets must inherit from THIS train dataset (reference :526)."""
    train = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    # no train_source at all
    val_plain = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    with pytest.raises(ValueError, match="train_source"):
        Trainer(VanillaNetwork, dataset_train=train, dataset_val=val_plain)
    # train_source pointing at a DIFFERENT dataset
    other = GraphDataset(hdf5_path=srv_hdf5, target="binary", node_features=["res_mass"])
    val_other = GraphDataset(hdf5_path=srv_hdf5, train_source=other)
    with pytest.raises(ValueError, match="train_source"):
        Trainer(VanillaNetwork, dataset_train=train, dataset_val=val_other)


def test_optim(srv_hdf5, tmp_path) -> None:
    """configure_optimizers with an explicit optimizer survives save/load
    (reference :453); the default is Adam lr=1e-3 wd=1e-5 (reference :484)."""
    from deeprank2_tpu.ops import optim

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[])
    assert trainer._optimizer_cls is optim.Adam
    assert trainer.lr == 1e-3
    assert trainer.weight_decay == 1e-5

    trainer.configure_optimizers(optim.SGD, lr=0.05, weight_decay=1e-4)
    model_path = str(tmp_path / "model.pth.tar")
    trainer.train(nepoch=1, batch_size=4, filename=model_path)

    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=model_path)
    pretrained = Trainer(VanillaNetwork, dataset_test=ds_test, pretrained_model=model_path)
    assert pretrained._optimizer_cls is optim.SGD
    assert pretrained.lr == 0.05
    pretrained.test(batch_size=4)


def test_invalid_trainsize(srv_hdf5) -> None:
    """Invalid val_size values error out (reference :606)."""
    n = len(GraphDataset(hdf5_path=srv_hdf5, target="binary"))
    for bad in (1.0, n, -0.5, "half"):
        ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
        with pytest.raises((ValueError, TypeError)):
            Trainer(VanillaNetwork, dataset_train=ds, val_size=bad)


def test_cuda_raises(srv_hdf5) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    with pytest.raises(ValueError):
        Trainer(VanillaNetwork, dataset_train=ds, cuda=True)


def test_no_target_raises(srv_hdf5) -> None:
    with pytest.raises(ValueError):
        GraphDataset(hdf5_path=srv_hdf5)  # no target set


def test_no_train_data_raises() -> None:
    with pytest.raises(ValueError):
        Trainer(VanillaNetwork)


def test_training_reduces_loss(srv_hdf5, tmp_path) -> None:
    """The optimizer actually learns: training loss drops substantially."""
    from deeprank2_tpu.utils.exporters import HDF5OutputExporter

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    exporter = HDF5OutputExporter(str(tmp_path))
    trainer = Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[exporter])
    trainer.train(nepoch=30, batch_size=8, filename=None)
    df = exporter.read("training")
    first = df[df.epoch == 1]["loss"].iloc[0]
    last = df[df.epoch == df.epoch.max()]["loss"].iloc[0]
    assert last < first * 0.5, f"loss did not decrease: {first} -> {last}"


def test_orbax_checkpoint_roundtrip(srv_hdf5, tmp_path) -> None:
    """Orbax-format checkpoint: train, save, reload, same predictions."""
    pytest.importorskip("orbax.checkpoint")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[])
    ckpt = str(tmp_path / "model.orbax")
    trainer.train(nepoch=2, batch_size=4, filename=ckpt)

    ds_test = GraphDataset(hdf5_path=srv_hdf5, train_source=ckpt)
    trainer2 = Trainer(VanillaNetwork, dataset_test=ds_test, pretrained_model=ckpt)
    trainer2._build_step_functions()
    trainer._build_step_functions()
    batch1, _ = trainer._collate([ds.get(0)], pad_graphs=1)
    batch2, _ = trainer2._collate([ds_test.get(0)], pad_graphs=1)
    _, pred1 = trainer._eval_step(trainer.params, batch1)
    _, pred2 = trainer2._eval_step(trainer2.params, batch2)
    assert np.allclose(np.asarray(pred1), np.asarray(pred2), atol=1e-6)


def test_midtraining_resume_matches_uninterrupted(srv_hdf5, tmp_path) -> None:
    """A run interrupted at epoch 2 and resumed to epoch 4 reproduces the
    uninterrupted 4-epoch run exactly (params, loss history, best epoch)."""
    import jax

    def make_trainer():
        ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
        return Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[], seed=11)

    straight = make_trainer()
    straight.train(nepoch=4, batch_size=4, filename=None)

    snap = str(tmp_path / "resume.pth.tar")
    interrupted = make_trainer()
    interrupted.train(nepoch=2, batch_size=4, filename=None, checkpoint_every=1, checkpoint_path=snap)

    resumed = make_trainer()
    resumed.train(nepoch=4, batch_size=4, filename=None, resume_from=snap)

    assert resumed.epoch_saved_model == straight.epoch_saved_model
    flat_a = jax.tree.leaves(straight.params)
    flat_b = jax.tree.leaves(resumed.params)
    for a, b in zip(flat_a, flat_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resume_past_end_raises(srv_hdf5, tmp_path) -> None:
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetwork, dataset_train=ds, output_exporters=[])
    snap = str(tmp_path / "resume.pth.tar")
    trainer.train(nepoch=2, batch_size=4, filename=None, checkpoint_every=2, checkpoint_path=snap)
    trainer2 = Trainer(VanillaNetwork, dataset_train=GraphDataset(hdf5_path=srv_hdf5, target="binary"), output_exporters=[])
    with pytest.raises(ValueError, match="nothing to resume"):
        trainer2.train(nepoch=2, batch_size=4, filename=None, resume_from=snap)


@pytest.mark.parametrize(("validate", "best_model"), [(True, True), (False, True), (False, False), (True, False)])
def test_nan_loss_cases(validate, best_model, srv_hdf5, tmp_path) -> None:
    """Exploding SGD -> NaN losses: a model is still saved, with the warning
    (reference: tests/test_integration.py:252-299)."""
    import warnings

    from deeprank2_tpu.ops.optim import SGD

    ds_train = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    ds_valid = GraphDataset(hdf5_path=srv_hdf5, train_source=ds_train)
    trainer = Trainer(VanillaNetwork, dataset_train=ds_train, dataset_val=ds_valid, output_exporters=[])
    trainer.configure_optimizers(SGD, lr=10000, weight_decay=10000)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        trainer.train(nepoch=5, batch_size=1, validate=validate, best_model=best_model, filename=str(tmp_path / "nan.pth.tar"))
    messages = [str(w.message) for w in caught if issubclass(w.category, UserWarning)]
    assert any("losses were NaN" in m for m in messages)


def test_clustered_model_without_clustering_method_raises(srv_hdf5) -> None:
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDense

    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")  # no clustering_method
    with pytest.raises(ValueError, match="needs preclustered data"):
        Trainer(GINetClusteredDense, dataset_train=ds, output_exporters=[])


def test_data_parallel_blocked_edges(srv_hdf5, tmp_path) -> None:
    """DP with the blocked-edge model: whole graphs balance across shards,
    and single-device vs sharded collation agree through training."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetworkBlocked

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    trainer = Trainer(VanillaNetworkBlocked, dataset_train=ds, output_exporters=[], data_parallel=True)
    trainer.train(nepoch=1, batch_size=8, filename=None)


def test_collate_cache_reused_across_epochs(srv_hdf5, tmp_path):
    """Non-shuffled loaders cache collated host batches across epochs (and the
    cache can be disabled); training results were already pinned identical by
    the other tests running through the same loader."""
    ds = GraphDataset(hdf5_path=srv_hdf5, target="binary")
    t_cached = Trainer(VanillaNetwork, dataset_train=ds, val_size=0.25, collate_cache_batches=64)
    t_cached.train(nepoch=2, batch_size=4, shuffle=False)
    assert len(t_cached._collate_cache) > 0

    t_cold = Trainer(VanillaNetwork, dataset_train=GraphDataset(hdf5_path=srv_hdf5, target="binary"), val_size=0.25, collate_cache_batches=0)
    t_cold.train(nepoch=2, batch_size=4, shuffle=False)
    assert len(t_cold._collate_cache) == 0
