"""Inter-residue contact feature oracles."""

import numpy as np

from deeprank2_tpu.domain import nodestorage as Nfeat
from deeprank2_tpu.features.irc import add_features

from . import build_testgraph


def test_irc_residue_graph(data_path) -> None:
    pdb_path = str(data_path / "pdb" / "1ATN" / "1ATN_1w.pdb")
    graph, _ = build_testgraph(pdb_path, "residue", 8.5, 8.5, chain_ids=("A", "B"))
    add_features(pdb_path, graph)

    total = graph.node_features[Nfeat.IRCTOTAL]
    assert total.shape == (graph.num_nodes,)
    assert np.any(total > 0)

    # the polarity-pair channels sum to the total for every node
    pair_sum = np.zeros(graph.num_nodes)
    for name in Nfeat.IRC_FEATURES:
        if name != Nfeat.IRCTOTAL:
            assert name in graph.node_features
            pair_sum += graph.node_features[name]
    assert np.allclose(pair_sum, total)


def test_irc_skipped_for_variants(data_path) -> None:
    from deeprank2_tpu.molstruct.aminoacid import alanine

    pdb_path = str(data_path / "pdb" / "101M" / "101M.pdb")
    graph, variant = build_testgraph(pdb_path, "residue", 10, 10, central_res=25, variant=alanine, chain_ids="A")
    add_features(pdb_path, graph, variant)
    assert Nfeat.IRCTOTAL not in graph.node_features
