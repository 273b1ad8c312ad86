"""Oracle tests for identity/component node features."""

import numpy as np

from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.features.components import add_features
from deeprank2_tpu.molstruct.aminoacid import alanine, amino_acids_by_code, phenylalanine

from . import build_testgraph


def test_atom_features(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "atom", 10, 10, central_res=25, variant=phenylalanine, chain_ids="A")
    add_features(pdb_path, graph, variant)

    assert Nfeat.ATOMTYPE in graph.node_features
    assert graph.node_features[Nfeat.ATOMTYPE].shape == (graph.num_nodes, 6)
    assert np.all(graph.node_features[Nfeat.ATOMTYPE].sum(axis=1) == 1.0)
    assert Nfeat.PDBOCCUPANCY in graph.node_features
    assert Nfeat.ATOMCHARGE in graph.node_features
    # charges come from the forcefield topology; must not all be zero
    assert np.any(graph.node_features[Nfeat.ATOMCHARGE] != 0.0)


def test_aminoacid_features(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, variant=alanine, chain_ids="A")
    add_features(pdb_path, graph, variant)

    node = int(np.flatnonzero(graph.node_residue_indices == variant.residue.index)[0])

    # 101M residue 25 is GLY
    gly = amino_acids_by_code["GLY"]
    assert graph.node_features[Nfeat.RESTYPE][node, gly.index] == 1.0
    assert graph.node_features[Nfeat.RESMASS][node] == gly.mass
    assert graph.node_features[Nfeat.RESPI][node] == gly.pI
    assert graph.node_features[Nfeat.RESSIZE][node] == gly.size

    # variant features on the variant node only
    assert graph.node_features[Nfeat.VARIANTRES][node, alanine.index] == 1.0
    assert graph.node_features[Nfeat.DIFFMASS][node] == alanine.mass - gly.mass
    others = np.flatnonzero(graph.node_residue_indices != variant.residue.index)
    assert np.all(graph.node_features[Nfeat.DIFFMASS][others] == 0.0)
    assert np.all(graph.node_features[Nfeat.DIFFSIZE][others] == 0.0)


def test_variant_res_defaults_to_wildtype(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, variant=alanine, chain_ids="A")
    add_features(pdb_path, graph, variant)
    others = np.flatnonzero(graph.node_residue_indices != variant.residue.index)
    restype = graph.node_features[Nfeat.RESTYPE][others]
    variantres = graph.node_features[Nfeat.VARIANTRES][others]
    assert np.array_equal(restype, variantres)
