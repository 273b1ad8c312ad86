"""Query-level build behaviors (reference: tests/test_query.py).

PSSM sanity checking (reference query.py:107-162): mismatched or missing PSSM
rows are an error for the conservation module, suppressible to a warning;
absent files are FileNotFoundError; other feature modules never need PSSMs.
"""

import numpy as np
import pytest

from deeprank2_tpu.domain import edgestorage as Efeat
from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.molstruct.aminoacid import alanine, glycine
from deeprank2_tpu.query import ProteinProteinInterfaceQuery, SingleResidueVariantQuery


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
