"""Secondary-structure oracles against stored mkdssp outputs (tests/data/dssp)."""

import numpy as np
import pytest

from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.features.secondary_structure import SecondarySctructure, _classify_secstructure, add_features
from deeprank2_tpu.io.pdb import parse_pdb
from deeprank2_tpu.utils.secstructure import assign_secondary_structure

from . import build_testgraph


def _parse_dssp_file(path) -> dict:
    out = {}
    started = False
    for line in open(path, encoding="utf-8"):
        if line.startswith("  #  RESIDUE"):
            started = True
            continue
        if not started or len(line) < 17:  # noqa: PLR2004
            continue
        resnum = line[5:10].strip()
        if resnum:
            out[(line[11], int(resnum))] = line[16]
    return out


def _cls3(ss: str) -> str:
    if ss in "GHI":
        return "H"
    if ss in "BE":
        return "E"
    return "C"


@pytest.mark.parametrize(("case", "min_agreement"), [("9api", 0.97), ("1ak4", 0.95)])
def test_against_mkdssp_output(data_path, case, min_agreement) -> None:
    """3-class agreement with the stored mkdssp ground truth must be high."""
    truth = _parse_dssp_file(data_path / "dssp" / f"{case}.dssp.txt")
    arrays = parse_pdb(str(data_path / "pdb" / case / f"{case}.pdb"))
    letters = assign_secondary_structure(arrays)

    match = total = 0
    for r, letter in letters.items():
        key = (arrays.chain_ids[arrays.res_chain[r]], int(arrays.res_numbers[r]))
        if key in truth:
            total += 1
            match += _cls3(letter) == _cls3(truth[key])
    assert total > 300
    assert match / total >= min_agreement


def test_known_residues(data_path) -> None:
    """The reference test's ground-truth residues (tests/features/test_secondary_structure.py:36-44)."""
    arrays = parse_pdb(str(data_path / "pdb" / "9api" / "9api.pdb"))
    letters = assign_secondary_structure(arrays)
    checks = [
        (267, "A", SecondarySctructure.COIL),
        (46, "A", SecondarySctructure.COIL),
        (104, "A", SecondarySctructure.COIL),
        (194, "A", SecondarySctructure.STRAND),
        (385, "B", SecondarySctructure.STRAND),
        (235, "A", SecondarySctructure.HELIX),
        (263, "A", SecondarySctructure.HELIX),
    ]
    for num, chain, expected in checks:
        r = arrays.find_residue(chain, num)
        assert r >= 0
        assert _classify_secstructure(letters.get(r, " ")) == expected, f"{chain}{num}"


def test_feature_onehot(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "9api" / "9api.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 10, 10, chain_ids=("A", "B"))
    add_features(pdb_path, graph)
    onehots = graph.node_features[Nfeat.SECSTRUCT]
    assert onehots.shape == (graph.num_nodes, 3)
    assert np.all(onehots.sum(axis=1) == 1.0)
