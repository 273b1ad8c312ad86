"""Correctness oracles for the TPU compute primitives (segment ops, pooling,
batching, optimizers) against plain-numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.ops.batch import bucket_size, collate_graphs, collate_graphs_sharded
from deeprank2_tpu.ops.pooling import pool_edges_coalesce
from deeprank2_tpu.ops.segment import segment_max, segment_mean, segment_softmax, segment_sum


def test_segment_ops_oracle() -> None:
    rng = np.random.default_rng(0)
    data = rng.normal(size=(20, 4)).astype(np.float32)
    ids = rng.integers(0, 5, size=20)
    out = np.zeros((5, 4), dtype=np.float32)
    for i, s in enumerate(ids):
        out[s] += data[i]
    assert np.allclose(segment_sum(jnp.asarray(data), jnp.asarray(ids), 5), out, atol=1e-5)

    means = np.zeros((5, 4))
    for s in range(5):
        sel = data[ids == s]
        if len(sel):
            means[s] = sel.mean(axis=0)
    assert np.allclose(segment_mean(jnp.asarray(data), jnp.asarray(ids), 5), means, atol=1e-5)

    maxes = np.zeros((5, 4))
    for s in range(5):
        sel = data[ids == s]
        if len(sel):
            maxes[s] = sel.max(axis=0)
    assert np.allclose(segment_max(jnp.asarray(data), jnp.asarray(ids), 5), maxes, atol=1e-5)


def test_segment_oob_dropped() -> None:
    data = jnp.ones((3, 2))
    ids = jnp.array([0, 7, 1])  # 7 is out of range for 2 segments
    out = segment_sum(data, ids, 2)
    assert np.allclose(out, [[1, 1], [1, 1]])


def test_segment_softmax() -> None:
    logits = jnp.array([1.0, 2.0, 3.0, 10.0])
    ids = jnp.array([0, 0, 0, 1])
    out = np.asarray(segment_softmax(logits, ids, 2))
    assert out[:3].sum() == pytest.approx(1.0, abs=1e-5)
    assert out[3] == pytest.approx(1.0, abs=1e-5)


def test_pool_edges_coalesce_oracle() -> None:
    # nodes 0..5 in clusters [0,0,1,1,2,2]; edges between nodes
    cluster = jnp.array([0, 0, 1, 1, 2, 2, 99])  # last entry padded
    edge_index = jnp.array(
        [
            [0, 1, 2, 0, 4, 6],
            [2, 3, 3, 1, 5, 6],
        ]
    )  # (0-1 cluster), (0-1), (within 1: self loop), (within 0: self loop), (within 2), padded
    edge_attr = jnp.arange(6, dtype=jnp.float32).reshape(6, 1) + 1
    edge_mask = jnp.array([True, True, True, True, True, False])

    ei, ea, em = pool_edges_coalesce(edge_index, edge_attr, edge_mask, cluster, capacity=6)
    valid = np.asarray(em)
    pairs = np.asarray(ei).T[valid]
    attrs = np.asarray(ea)[valid]
    # expected: one pooled edge (0, 1) with summed attrs of edges 0 and 1 (1+2)
    assert pairs.tolist() == [[0, 1]]
    assert attrs.tolist() == [[3.0]]


def test_bucket_size_monotonic() -> None:
    sizes = [bucket_size(n) for n in range(1, 3000, 17)]
    assert all(a <= b for a, b in zip(sizes, sizes[1:]))
    assert all(bucket_size(n) >= n for n in range(1, 3000, 17))
    # few distinct buckets -> few recompiles
    assert len(set(sizes)) < 12


def test_collate_masks() -> None:
    e1 = {
        "x": np.ones((3, 2), np.float32),
        "edge_index": np.array([[0, 1], [1, 2]]),
        "edge_attr": np.ones((2, 1), np.float32),
        "pos": np.zeros((3, 3), np.float32),
        "y": 1.0,
        "entry_name": "a",
    }
    batch, names = collate_graphs([e1], pad_graphs=4)
    assert batch.num_graphs == 4
    assert names == ["a", "", "", ""]
    assert np.asarray(batch.y_mask).tolist() == [True, False, False, False]
    assert int(np.asarray(batch.node_mask).sum()) == 3
    assert int(np.asarray(batch.edge_mask).sum()) == 4  # mirrored
    # padded edges point out of range
    em = np.asarray(batch.edge_mask)
    ei = np.asarray(batch.edge_index)
    assert (ei[:, ~em] == batch.num_nodes).all()


def test_collate_sharded_shapes() -> None:
    entries = []
    for k in range(4):
        entries.append(
            {
                "x": np.ones((3 + k, 2), np.float32),
                "edge_index": np.array([[0, 1]]),
                "edge_attr": np.ones((1, 1), np.float32),
                "pos": np.zeros((3 + k, 3), np.float32),
                "y": float(k),
                "entry_name": f"e{k}",
            }
        )
    batch, names = collate_graphs_sharded(entries, num_shards=2, pad_graphs_per_shard=2)
    assert batch.x.shape[0] == 2  # leading shard axis
    assert len(names) == 4


def test_adam_converges() -> None:
    from deeprank2_tpu.ops.optim import Adam

    params = {"w": jnp.array([5.0, -3.0])}
    opt = Adam(lr=0.1)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum(p["w"] ** 2))(params)
        return opt.step(params, grads, state)

    for _ in range(200):
        params, state = step(params, state)
    assert np.abs(np.asarray(params["w"])).max() < 0.05


def test_losses_match_oracles() -> None:
    from deeprank2_tpu.ops.losses import CrossEntropyLoss, MSELoss

    pred = jnp.array([1.0, 2.0, 3.0])
    target = jnp.array([1.5, 2.0, 2.0])
    assert float(MSELoss()(pred, target)) == pytest.approx(((1.5 - 1) ** 2 + 0 + 1) / 3)

    logits = jnp.array([[2.0, 0.0], [0.0, 2.0]])
    targets_arr = jnp.array([0, 1])
    expected = -np.log(np.exp(2) / (np.exp(2) + 1))
    assert float(CrossEntropyLoss()(logits, targets_arr)) == pytest.approx(expected, abs=1e-5)

    # masked elements are excluded
    mask = jnp.array([True, False])
    assert float(CrossEntropyLoss()(logits, targets_arr, mask)) == pytest.approx(expected, abs=1e-5)


def test_community_detection() -> None:
    from deeprank2_tpu.utils.community_pooling import community_detection, community_pooling_host

    # two cliques connected by one edge
    edges = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [2, 3]])
    for method in ("mcl", "louvain"):
        cluster = community_detection(edges, 6, method=method)
        assert cluster[0] == cluster[1] == cluster[2]
        assert cluster[3] == cluster[4] == cluster[5]
        assert cluster[0] != cluster[3]

    pooled_edges, num_clusters = community_pooling_host(community_detection(edges, 6, method="mcl"), edges)
    assert num_clusters == 2
    assert pooled_edges.tolist() in ([[0, 1]], [[1, 0]])


def test_plot_graph(tmp_path) -> None:
    from deeprank2_tpu.utils.community_pooling import community_detection, plot_graph

    edges = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5], [2, 3]])
    cluster = community_detection(edges, 6, method="mcl")
    fname = str(tmp_path / "graph.png")
    plot_graph(edges, 6, cluster, fname=fname)
    import os

    assert os.path.getsize(fname) > 0
