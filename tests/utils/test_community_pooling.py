"""Community detection / pooling (reference: tests/utils/test_community_pooling.py)."""

import numpy as np
import pytest

from deeprank2_tpu.utils.community_pooling import (
    community_detection,
    community_detection_per_batch,
    community_pooling,
    get_preloaded_cluster,
)

# two 4-cliques joined by one bridge edge -> two obvious communities
_TWO_CLIQUES = np.array(
    [[a, b] for a, b in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (4, 7), (5, 6), (5, 7), (6, 7), (3, 4)]],
    dtype=np.int64,
)


@pytest.mark.parametrize("method", ["mcl", "louvain"])
def test_community_detection_two_cliques(method) -> None:
    cluster = community_detection(_TWO_CLIQUES, 8, method=method)
    assert cluster.shape == (8,)
    assert len(set(cluster[:4])) == 1
    assert len(set(cluster[4:])) == 1
    assert cluster[0] != cluster[7]


@pytest.mark.parametrize("method", ["mcl", "louvain"])
def test_community_detection_per_batch(method) -> None:
    # batch of two identical two-clique graphs
    edges = np.concatenate([_TWO_CLIQUES, _TWO_CLIQUES + 8])
    batch = np.repeat([0, 1], 8)
    cluster = community_detection_per_batch(edges, batch, 16, method=method)
    assert cluster.shape == (16,)
    # graph 1's ids start after graph 0's (batch-global)
    assert cluster[8:].min() > cluster[:8].max()
    # same structure -> same partition shape per graph
    assert len(set(cluster[:8].tolist())) == len(set(cluster[8:].tolist())) == 2


def test_get_preloaded_cluster_offsets() -> None:
    cluster = np.array([0, 1, 0, 0, 1, 1])
    batch = np.array([0, 0, 0, 1, 1, 1])
    out = get_preloaded_cluster(cluster.copy(), batch)
    assert out.tolist() == [0, 1, 0, 2, 3, 3]


def test_community_pooling_batch() -> None:
    from deeprank2_tpu.ops.batch import collate_graphs

    rng = np.random.default_rng(0)
    entries = []
    for g in range(2):
        entries.append(
            {
                "entry_name": f"g{g}",
                "x": rng.normal(size=(8, 3)),
                "edge_index": _TWO_CLIQUES,
                "edge_attr": np.ones((len(_TWO_CLIQUES), 2)),
                "pos": rng.normal(size=(8, 3)),
                "y": float(g),
            }
        )
    batch, _ = collate_graphs(entries)
    node_graph = np.asarray(batch.node_graph)
    cluster = community_detection_per_batch(np.asarray(batch.edge_index).T, node_graph, batch.num_nodes, method="mcl")
    # pad slots -> OOB cluster id
    cluster = np.where(np.asarray(batch.node_mask), cluster, batch.num_nodes)
    pooled = community_pooling(cluster, batch)

    n_clusters = len(set(cluster[np.asarray(batch.node_mask)].tolist()))
    assert int(np.asarray(pooled.node_mask).sum()) == n_clusters
    # max-pooling: every pooled feature value equals the max over some member set
    x = np.asarray(batch.x)
    xp = np.asarray(pooled.x)
    for c in sorted(set(cluster[np.asarray(batch.node_mask)].tolist())):
        members = np.flatnonzero(cluster == c)
        np.testing.assert_allclose(xp[c], x[members].max(axis=0), rtol=1e-6)
    # pooled edges exist between the two communities of each graph (bridge edge)
    ei = np.asarray(pooled.edge_index)[:, np.asarray(pooled.edge_mask)]
    assert ei.shape[1] >= 2  # at least the mirrored bridge per graph
    assert np.all(ei[0] != ei[1])
