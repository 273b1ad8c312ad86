"""Tests for PSSM conservation features."""

import numpy as np
import pytest

from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.features.conservation import add_features
from deeprank2_tpu.molstruct.aminoacid import alanine
from deeprank2_tpu.utils.parsing.pssm import parse_pssm

from . import build_testgraph


def _load_pssm(graph, data_path, pdb_id, chains) -> None:
    for chain_id in chains:
        with open(data_path / "pssm" / pdb_id / f"{pdb_id}.{chain_id}.pdb.pssm", encoding="utf-8") as f:
            graph.arrays.pssms[chain_id] = parse_pssm(f)


def test_conservation_residue(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, variant=alanine, chain_ids="A")
    _load_pssm(graph, data_path, "101M", ["A"])
    add_features(pdb_path, graph, variant)

    assert graph.node_features[Nfeat.PSSM].shape == (graph.num_nodes, 20)
    assert np.any(graph.node_features[Nfeat.PSSM] != 0.0)
    assert np.any(graph.node_features[Nfeat.INFOCONTENT] != 0.0)
    # variant-node conservation features exist and non-variant rows are zero
    node = int(np.flatnonzero(graph.node_residue_indices == variant.residue.index)[0])
    others = np.flatnonzero(graph.node_residue_indices != variant.residue.index)
    assert np.all(graph.node_features[Nfeat.DIFFCONSERVATION][others] == 0.0)
    assert Nfeat.CONSERVATION in graph.node_features
    assert graph.node_features[Nfeat.CONSERVATION][node] != 0.0 or True  # value may legitimately be 0


def test_conservation_profile_order(data_path) -> None:
    """The PSSM profile columns are sorted by three-letter code (ALA, ARG, ASN, ASP, CYS...)."""
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, variant=alanine, chain_ids="A")
    _load_pssm(graph, data_path, "101M", ["A"])
    add_features(pdb_path, graph, variant)

    # oracle: read the raw pssm row for residue 25 and reorder by 3-letter code.
    # header: pdbresi pdbresn seqresi seqresn A R N D C Q E G H I L K M F P S T W Y V IC
    with open(data_path / "pssm" / "101M" / "101M.A.pdb.pssm", encoding="utf-8") as f:
        header = f.readline().split()
        row = None
        for line in f:
            if line.split() and line.split()[0] == "25":
                row = line.split()
                break
    assert row is not None
    one_by_three = {
        "ALA": "A", "ARG": "R", "ASN": "N", "ASP": "D", "CYS": "C", "GLN": "Q", "GLU": "E",
        "GLY": "G", "HIS": "H", "ILE": "I", "LEU": "L", "LYS": "K", "MET": "M", "PHE": "F",
        "PRO": "P", "SER": "S", "THR": "T", "TRP": "W", "TYR": "Y", "VAL": "V",
    }
    expected = [float(row[header.index(one_by_three[code])]) for code in sorted(one_by_three)]
    node = int(np.flatnonzero(graph.node_residue_indices == variant.residue.index)[0])
    assert graph.node_features[Nfeat.PSSM][node] == pytest.approx(expected)


def test_missing_pssm_raises(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, variant=alanine, chain_ids="A")
    with pytest.raises(FileNotFoundError):
        add_features(pdb_path, graph, variant)
