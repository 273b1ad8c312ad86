"""Query-level build behaviors (reference: tests/test_query.py).

PSSM sanity checking (reference query.py:107-162): mismatched or missing PSSM
rows are an error for the conservation module, suppressible to a warning;
absent files are FileNotFoundError; other feature modules never need PSSMs.
"""

import numpy as np
import pytest

from deeprank2_tpu.domain import edgestorage as Efeat
from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.molstruct.aminoacid import (
    alanine,
    arginine,
    asparagine,
    glutamate,
    glycine,
    leucine,
    lysine,
    phenylalanine,
)
from deeprank2_tpu.query import ProteinProteinInterfaceQuery, SingleResidueVariantQuery


def _check_graph_makes_sense(g, node_feature_names, edge_feature_names, tmp_path) -> None:
    """Graph sanity oracle mirrored from reference tests/test_query.py:24-78:
    non-empty, no self-edges, no NaN, HDF5 round trip with nonzero features,
    and the dataset mirrors each undirected edge into two directed ones."""
    import h5py

    from deeprank2_tpu.dataset import GraphDataset

    assert g.num_nodes > 0, "no nodes"
    assert Nfeat.POSITION in g.node_features
    assert g.num_edges > 0, "no edges"
    assert Efeat.DISTANCE in g.edge_features
    for edge in g.edges:
        assert edge.id.item1 != edge.id.item2, f"an edge pairs {edge.id.item1} with itself"
    assert not g.has_nan()

    out = str(tmp_path / "query_graph.hdf5")
    g.targets["binary"] = 0
    g.write_to_hdf5(out)

    with h5py.File(out, "r") as f5:
        grp = f5[next(iter(f5.keys()))]
        for feature_name in node_feature_names:
            vals = grp[f"{Nfeat.NODE}/{feature_name}"][()]
            assert vals.size > 0, f"no {feature_name} feature"
            assert len(np.nonzero(vals)) > 0, f"{feature_name}: all zero"
        assert grp[f"{Efeat.EDGE}/{Efeat.INDEX}"][()].shape[1] == 2, "wrong edge index shape"
        count_edges_hdf5 = grp[f"{Efeat.EDGE}/{Efeat.INDEX}"].shape[0]
        assert count_edges_hdf5 > 0, "no edge indices"
        for feature_name in edge_feature_names:
            assert grp[f"{Efeat.EDGE}/{feature_name}"][()].shape[0] == count_edges_hdf5, f"not enough edge {feature_name} values"

    dataset = GraphDataset(hdf5_path=out, target="binary")
    entry = dataset.get(0)
    assert entry["edge_index"].shape[0] == count_edges_hdf5
    # mirroring happens at collation here (ops/batch.py, vs reference
    # dataset.py:944-951 which mirrors per entry): twice as many directed
    # edges, with the attrs duplicated alongside
    from deeprank2_tpu.ops.batch import collate_graphs

    batch, _ = collate_graphs([entry], pad_graphs=1)
    real_edges = int(np.asarray(batch.edge_mask).sum())
    assert real_edges == 2 * count_edges_hdf5
    assert batch.edge_attr.shape[0] == batch.edge_index.shape[1]


def _ppi_query(data_path, pssm_paths):
    return ProteinProteinInterfaceQuery(
        pdb_path=str(data_path / "pdb" / "3C8P" / "3C8P.pdb"),
        resolution="residue",
        chain_ids=["A", "B"],
        pssm_paths=pssm_paths,
    )


def _good_pssms(data_path):
    return {
        "A": str(data_path / "pssm" / "3C8P" / "3C8P.A.pdb.pssm"),
        "B": str(data_path / "pssm" / "3C8P" / "3C8P.B.pdb.pssm"),
    }


def test_interface_graph_residue(data_path) -> None:
    graph = _ppi_query(data_path, _good_pssms(data_path)).build(["surfacearea", "components", "conservation", "contact"])
    for feat in (Nfeat.POSITION, Nfeat.POLARITY, Nfeat.PSSM, Nfeat.INFOCONTENT, Nfeat.BSA):
        assert feat in graph.node_features, feat
        assert np.isfinite(graph.node_features[feat]).all(), feat
    assert Efeat.DISTANCE in graph.edge_features
    assert graph.num_nodes > 0 and graph.num_edges > 0
    # interface spans both chains
    assert graph.get_all_chains() == ["A", "B"]


def test_interface_graph_atomic(data_path) -> None:
    query = ProteinProteinInterfaceQuery(
        pdb_path=str(data_path / "pdb" / "3C8P" / "3C8P.pdb"),
        resolution="atom",
        chain_ids=["A", "B"],
        pssm_paths=_good_pssms(data_path),
        influence_radius=4.5,
        max_edge_length=4.5,
    )
    graph = query.build(["surfacearea", "components", "conservation", "contact"])
    for feat in (Nfeat.POSITION, Nfeat.PSSM, Nfeat.BSA, Nfeat.INFOCONTENT):
        assert feat in graph.node_features, feat
    assert Efeat.DISTANCE in graph.edge_features
    d = graph.edge_features[Efeat.DISTANCE]
    assert d.max() <= 4.5 + 1e-6


@pytest.mark.parametrize("bad_chain_file", ["A:3C8P.A.wrong_order.pdb.pssm", "B:3C8P.B.missing_res.pdb.pssm"])
def test_bad_pssm_raises_then_suppresses(data_path, bad_chain_file) -> None:
    bad_chain, bad_file = bad_chain_file.split(":")
    pssms = _good_pssms(data_path)
    pssms[bad_chain] = str(data_path / "pssm" / "3C8P_incorrect" / bad_file)

    query = _ppi_query(data_path, pssms)
    with pytest.raises(ValueError, match="do not match"):
        query.build(["conservation"])

    # other modules don't need PSSMs
    query.build(["components"])

    # suppression downgrades to a warning
    query.suppress_pssm_errors = True
    with pytest.warns(UserWarning):
        query.build(["conservation"])


@pytest.mark.parametrize("pssm_paths", [{}, None])
def test_no_pssm_provided(data_path, pssm_paths) -> None:
    query = _ppi_query(data_path, pssm_paths)
    with pytest.raises(ValueError, match="No pssm"):
        query.build(["conservation"])
    query.build(["components"])


def test_incorrect_pssm_provided(data_path) -> None:
    # nonexistent file
    pssms = _good_pssms(data_path)
    pssms["B"] = str(data_path / "pssm" / "3C8P_incorrect" / "does_not_exist.pssm")
    with pytest.raises(FileNotFoundError):
        _ppi_query(data_path, pssms).build(["conservation"])

    # chain entirely missing from the dict
    only_a = {"A": _good_pssms(data_path)["A"]}
    with pytest.raises(FileNotFoundError):
        _ppi_query(data_path, only_a).build(["conservation"])

    # both fine without conservation
    _ppi_query(data_path, pssms).build(["components"])
    _ppi_query(data_path, only_a).build(["components"])


def test_variant_graph_101M(data_path, tmp_path) -> None:
    """Atomic variant graph oracle (reference test_query.py:131-161)."""
    query = SingleResidueVariantQuery(
        pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
        resolution="atom",
        chain_ids="A",
        variant_residue_number=27,
        insertion_code=None,
        wildtype_amino_acid=asparagine,
        variant_amino_acid=phenylalanine,
        pssm_paths={"A": str(data_path / "pssm" / "101M" / "101M.A.pdb.pssm")},
        targets={"binary": 0},
        influence_radius=5.0,
        max_edge_length=5.0,
    )
    g = query.build(["surfacearea", "components", "conservation", "contact"])
    _check_graph_makes_sense(
        g,
        [Nfeat.POSITION, Nfeat.SASA, Nfeat.RESTYPE, Nfeat.VARIANTRES, Nfeat.DIFFCONSERVATION],
        [Efeat.DISTANCE, Efeat.VDW, Efeat.ELEC],
        tmp_path,
    )


def test_variant_graph_1A0Z(data_path, tmp_path) -> None:
    """Multi-chain variant graph with per-chain PSSMs (reference :164-199)."""
    query = SingleResidueVariantQuery(
        pdb_path=str(data_path / "pdb" / "1A0Z" / "1A0Z.pdb"),
        resolution="atom",
        chain_ids="A",
        variant_residue_number=125,
        insertion_code=None,
        wildtype_amino_acid=leucine,
        variant_amino_acid=arginine,
        pssm_paths={
            "A": str(data_path / "pssm" / "1A0Z" / "1A0Z.A.pdb.pssm"),
            "B": str(data_path / "pssm" / "1A0Z" / "1A0Z.B.pdb.pssm"),
            "C": str(data_path / "pssm" / "1A0Z" / "1A0Z.A.pdb.pssm"),
            "D": str(data_path / "pssm" / "1A0Z" / "1A0Z.B.pdb.pssm"),
        },
        targets={"binary": 1},
        influence_radius=5.0,
        max_edge_length=5.0,
    )
    g = query.build(["surfacearea", "components", "conservation", "contact"])
    _check_graph_makes_sense(
        g,
        [Nfeat.POSITION, Nfeat.RESTYPE, Nfeat.VARIANTRES, Nfeat.SASA, Nfeat.DIFFCONSERVATION],
        [Efeat.DISTANCE, Efeat.VDW, Efeat.ELEC],
        tmp_path,
    )


def test_variant_graph_9API(data_path, tmp_path) -> None:
    """Large-structure variant graph (reference :202-236)."""
    query = SingleResidueVariantQuery(
        pdb_path=str(data_path / "pdb" / "9api" / "9api.pdb"),
        resolution="atom",
        chain_ids="A",
        variant_residue_number=310,
        insertion_code=None,
        wildtype_amino_acid=lysine,
        variant_amino_acid=glutamate,
        pssm_paths={
            "A": str(data_path / "pssm" / "9api" / "9api.A.pdb.pssm"),
            "B": str(data_path / "pssm" / "9api" / "9api.B.pdb.pssm"),
        },
        targets={"binary": 0},
        influence_radius=5.0,
        max_edge_length=5.0,
    )
    g = query.build(["surfacearea", "components", "conservation", "contact"])
    _check_graph_makes_sense(
        g,
        [Nfeat.POSITION, Nfeat.RESTYPE, Nfeat.VARIANTRES, Nfeat.SASA, Nfeat.DIFFCONSERVATION],
        [Efeat.DISTANCE, Efeat.VDW, Efeat.ELEC],
        tmp_path,
    )


def test_variant_residue_graph_101M(data_path, tmp_path) -> None:
    """Residue-level variant graph (reference :238-263)."""
    query = SingleResidueVariantQuery(
        pdb_path=str(data_path / "pdb" / "101M" / "101M.pdb"),
        resolution="residue",
        chain_ids="A",
        variant_residue_number=25,
        insertion_code=None,
        wildtype_amino_acid=glycine,
        variant_amino_acid=alanine,
        pssm_paths={"A": str(data_path / "pssm" / "101M" / "101M.A.pdb.pssm")},
        targets={"binary": 0},
    )
    g = query.build(["surfacearea", "components", "conservation", "contact"])
    _check_graph_makes_sense(
        g,
        [Nfeat.POSITION, Nfeat.SASA, Nfeat.PSSM, Nfeat.RESTYPE, Nfeat.VARIANTRES, Nfeat.POLARITY],
        [Efeat.DISTANCE],
        tmp_path,
    )


def test_res_ppi(data_path, tmp_path) -> None:
    """Residue PPI on non-AB chain ids (reference :266-273)."""
    query = ProteinProteinInterfaceQuery(
        pdb_path=str(data_path / "pdb" / "3MRC" / "3MRC.pdb"),
        resolution="residue",
        chain_ids=["M", "P"],
    )
    g = query.build(["surfacearea", "contact"])
    _check_graph_makes_sense(g, [Nfeat.SASA], [Efeat.ELEC], tmp_path)


def test_variant_query_multiple_chains(data_path) -> None:
    """A wide variant graph reaches into chain B, which has no PSSM: conservation
    must fail loudly there, and succeed once the radius excludes chain B
    (reference: test_query.py:467-493)."""
    query = SingleResidueVariantQuery(
        pdb_path=str(data_path / "pdb" / "2g98" / "pdb2g98.pdb"),
        resolution="atom",
        chain_ids="A",
        variant_residue_number=14,
        insertion_code=None,
        wildtype_amino_acid=alanine,
        variant_amino_acid=glycine,
        pssm_paths={"A": str(data_path / "pssm" / "2g98" / "2g98.A.pdb.pssm")},
        targets={"binary": 0},
        influence_radius=10.0,
        max_edge_length=4.5,
    )
    graph = query.build(["components"])
    assert "B" in graph.get_all_chains()
    with pytest.raises(FileNotFoundError):
        query.build(["conservation"])

    query.influence_radius = 7.0
    graph = query.build(["conservation"])
    assert "B" not in graph.get_all_chains()
    assert Nfeat.PSSM in graph.node_features
