"""Query pipeline tests: build, multiprocessing fan-out, duplicate renaming."""

import os

import h5py
import numpy as np
import pytest

from deeprank2_tpu.domain import edgestorage as Efeat
from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.molstruct.aminoacid import alanine, phenylalanine
from deeprank2_tpu.query import ProteinProteinInterfaceQuery, QueryCollection, SingleResidueVariantQuery


def _ppi_query(data_path, resolution="residue", targets=None):
    return ProteinProteinInterfaceQuery(
        pdb_path=str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb"),
        resolution=resolution,
        chain_ids=["A", "B"],
        pssm_paths={
            "A": str(data_path / "pssm" / "1ATN" / "1ATN.A.pdb.pssm"),
            "B": str(data_path / "pssm" / "1ATN" / "1ATN.B.pdb.pssm"),
        },
        targets=targets or {"binary": 0},
    )


def _srv_query(data_path, resolution="residue"):
    return SingleResidueVariantQuery(
        pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
        resolution=resolution,
        chain_ids="A",
        variant_residue_number=27,
        insertion_code=None,
        wildtype_amino_acid=alanine,
        variant_amino_acid=phenylalanine,
        pssm_paths={"A": str(data_path / "pssm" / "101M" / "101M.A.pdb.pssm")},
        targets={"binary": 1},
    )


def test_build_ppi_graph(data_path) -> None:
    graph = _ppi_query(data_path).build(["components", "contact", "conservation"])
    assert graph.num_nodes > 0
    assert graph.num_edges > 0
    assert Nfeat.PSSM in graph.node_features
    assert Efeat.ELEC in graph.edge_features
    assert graph.targets == {"binary": 0}
    assert not graph.has_nan()


def test_build_srv_graph(data_path) -> None:
    graph = _srv_query(data_path).build(["components", "contact", "conservation"])
    assert graph.num_nodes > 0
    assert Nfeat.DIFFCONSERVATION in graph.node_features
    assert not graph.has_nan()


def test_process_combined(tmp_path, data_path) -> None:
    os.chdir(tmp_path)
    collection = QueryCollection()
    collection.add(_ppi_query(data_path))
    collection.add(_srv_query(data_path))

    paths = collection.process(prefix=str(tmp_path / "out"), cpu_count=2)
    assert len(paths) == 1
    with h5py.File(paths[0], "r") as f:
        assert len(f.keys()) == 2
        for entry in f.values():
            assert Nfeat.NODE in entry
            assert Efeat.EDGE in entry


def test_process_separate_outputs(tmp_path, data_path) -> None:
    collection = QueryCollection()
    collection.add(_ppi_query(data_path))
    collection.add(_srv_query(data_path))
    paths = collection.process(prefix=str(tmp_path / "sep"), cpu_count=2, combine_output=False)
    total = 0
    for p in paths:
        with h5py.File(p, "r") as f:
            total += len(f.keys())
    assert total == 2


def test_duplicate_rename(data_path) -> None:
    collection = QueryCollection()
    q1 = _ppi_query(data_path)
    q2 = _ppi_query(data_path)
    collection.add(q1)
    collection.add(q2, warn_duplicate=False)
    assert len(collection) == 2
    assert q2.model_id.endswith("_2")
    assert q1.get_query_id() != q2.get_query_id()


def test_invalid_resolution(data_path) -> None:
    with pytest.raises(ValueError):
        ProteinProteinInterfaceQuery(
            pdb_path=str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb"),
            resolution="banana",
            chain_ids=["A", "B"],
        )


def test_srv_needs_one_chain(data_path) -> None:
    with pytest.raises(ValueError):
        SingleResidueVariantQuery(
            pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
            resolution="residue",
            chain_ids=["A", "B"],
            variant_residue_number=27,
            insertion_code=None,
            wildtype_amino_acid=alanine,
            variant_amino_acid=phenylalanine,
        )


def test_default_feature_modules(tmp_path, data_path) -> None:
    """Defaults are components + contact (no pssm required)."""
    q = ProteinProteinInterfaceQuery(
        pdb_path=str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb"),
        resolution="residue",
        chain_ids=["A", "B"],
    )
    collection = QueryCollection()
    collection.add(q)
    paths = collection.process(prefix=str(tmp_path / "defaults"), cpu_count=1)
    with h5py.File(paths[0], "r") as f:
        entry = next(iter(f.values()))
        assert Nfeat.RESTYPE in entry[Nfeat.NODE]
        assert Efeat.ELEC in entry[Efeat.EDGE]
        assert Nfeat.PSSM not in entry[Nfeat.NODE]


def test_single_feature_module_input_types(tmp_path, data_path) -> None:
    """feature_modules accepts ModuleType, list[ModuleType], str, list[str]
    (reference tests/test_querycollection.py:146)."""
    from deeprank2_tpu.features import surfacearea

    for i, testcase in enumerate([surfacearea, [surfacearea], "surfacearea", ["surfacearea"]]):
        collection = QueryCollection()
        collection.add(_ppi_query(data_path))
        paths = collection.process(prefix=str(tmp_path / f"single{i}"), cpu_count=1, feature_modules=testcase)
        with h5py.File(paths[0], "r") as f:
            entry = next(iter(f.values()))
            assert Nfeat.BSA in entry[Nfeat.NODE]
            assert Nfeat.HSE not in entry[Nfeat.NODE]

    with pytest.raises(TypeError):
        QueryCollection().process(prefix=str(tmp_path / "bad"), feature_modules=42)


def test_all_feature_modules(tmp_path, data_path) -> None:
    """feature_modules='all' runs every module: one feature from each module
    lands for a PPI query; IRC is PPI-only and absent for an SRV query
    (reference tests/test_querycollection.py:158)."""
    one_from_each = [Nfeat.RESTYPE, Nfeat.PSSM, Nfeat.HSE, Nfeat.SECSTRUCT, Nfeat.BSA, Nfeat.IRCTOTAL]

    collection = QueryCollection()
    collection.add(_ppi_query(data_path))
    paths = collection.process(prefix=str(tmp_path / "all_ppi"), cpu_count=1, feature_modules="all")
    with h5py.File(paths[0], "r") as f:
        entry = next(iter(f.values()))
        for feat in one_from_each:
            assert feat in entry[Nfeat.NODE], feat
        assert Efeat.DISTANCE in entry[Efeat.EDGE]

    collection = QueryCollection()
    collection.add(_srv_query(data_path))
    paths = collection.process(prefix=str(tmp_path / "all_srv"), cpu_count=1, feature_modules="all")
    with h5py.File(paths[0], "r") as f:
        entry = next(iter(f.values()))
        for feat in one_from_each[:-1]:
            assert feat in entry[Nfeat.NODE], feat
        assert Nfeat.IRCTOTAL not in entry[Nfeat.NODE]


def test_process_host_sharding(data_path, tmp_path) -> None:
    """Multi-host fan-out: each host processes queries[host::num_hosts] into
    its own <prefix>-host<h>.hdf5; the union covers every query exactly once."""
    import h5py

    from deeprank2_tpu.dataset import GraphDataset

    def make_collection():
        qc = QueryCollection()
        for i, res in enumerate([27, 25, 20, 64, 89]):
            query = _srv_query(data_path)
            query.variant_residue_number = res
            query.targets = {"binary": i % 2}
            qc.add(query)
        return qc

    all_names = set()
    paths = []
    for host in range(2):
        qc = make_collection()
        out = qc.process(
            prefix=str(tmp_path / "sharded"),
            feature_modules=["components", "contact"],
            cpu_count=1,
            num_hosts=2,
            host_index=host,
        )
        paths.extend(out)
        with h5py.File(out[0]) as f:
            names = set(f.keys())
        assert not (all_names & names)
        all_names |= names
    assert len(all_names) == 5

    ds = GraphDataset(hdf5_path=paths, target="binary")
    assert len(ds) == 5


def test_process_resume_skips_done(data_path, tmp_path, caplog) -> None:
    """resume=True skips queries whose entries already exist in the output."""
    import logging

    import h5py

    def make_collection(residues):
        qc = QueryCollection()
        for i, res in enumerate(residues):
            query = _srv_query(data_path)
            query.variant_residue_number = res
            query.targets = {"binary": i % 2}
            qc.add(query)
        return qc

    prefix = str(tmp_path / "resumable")
    make_collection([27, 25]).process(prefix=prefix, feature_modules=["components"], cpu_count=1)

    with caplog.at_level(logging.INFO):
        paths = make_collection([27, 25, 20]).process(prefix=prefix, feature_modules=["components"], cpu_count=1, resume=True)
    assert any("skipping 2" in rec.message for rec in caplog.records)
    with h5py.File(paths[0]) as f:
        assert len(f.keys()) == 3


def test_augmentation(tmp_path, data_path) -> None:
    """Grid augmentation through process(): (count+1) entries per query, all
    loadable by GridDataset (reference: tests/test_query.py test_augmentation)."""
    import h5py

    from deeprank2_tpu.dataset import GridDataset
    from deeprank2_tpu.utils.grid import GridSettings, MapMethod

    qc = QueryCollection()
    qc.add(
        ProteinProteinInterfaceQuery(
            pdb_path=str(data_path / "pdb" / "3C8P" / "3C8P.pdb"),
            resolution="residue",
            chain_ids=["A", "B"],
            targets={"binary": 0},
        )
    )
    qc.add(
        ProteinProteinInterfaceQuery(
            pdb_path=str(data_path / "pdb" / "3C8P" / "3C8P.pdb"),
            resolution="atom",
            chain_ids=["A", "B"],
            targets={"binary": 1},
        )
    )

    augmentation_count = 3
    expected = (augmentation_count + 1) * len(qc.queries)
    paths = qc.process(
        prefix=str(tmp_path / "qc"),
        feature_modules=["components", "contact"],
        cpu_count=1,
        grid_settings=GridSettings([20, 20, 20], [20.0, 20.0, 20.0]),
        grid_map_method=MapMethod.GAUSSIAN,
        grid_augmentation_count=augmentation_count,
    )
    with h5py.File(paths[0], "r") as f5:
        entry_names = list(f5.keys())
    assert len(entry_names) == expected

    dataset = GridDataset(paths[0], target="binary")
    assert len(dataset) == expected
