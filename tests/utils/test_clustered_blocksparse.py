"""Clustered block-sparse fast path: collate + three models vs their COO twins.

The COO models are the oracle (themselves layer-parity-tested against the
torch reference math, tests/test_layer_parity.py); the block-sparse variants
must match them to float tolerance on identical parameters — forward AND
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.neuralnets.gnn.clustered_blocksparse import (
    FoutNetBlockSparse,
    GINetClusteredBlockSparse,
    SGATBlockSparse,
)
from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet
from deeprank2_tpu.neuralnets.gnn.ginet import GINet
from deeprank2_tpu.neuralnets.gnn.sgat import SGAT
from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_blocksparse_clustered


def _clustered_entries(num_graphs=3, edge_dim=1, seed=7, sizes=(180, 260, 140)):
    """Synthetic geometric graphs with synthetic (spatially contiguous)
    two-depth clusterings, mimicking precluster output."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    entries = []
    for g in range(num_graphs):
        n = sizes[g % len(sizes)]
        pos = rng.uniform(0, 22, size=(n, 3))
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        # spatial clusters: grid cells at two granularities
        cell0 = np.floor(pos / 6.0).astype(np.int64)
        _, c0 = np.unique(cell0[:, 0] * 10000 + cell0[:, 1] * 100 + cell0[:, 2], return_inverse=True)
        n_c0 = int(c0.max()) + 1
        # depth-1: coarser cells over cluster-mean positions
        psum = np.zeros((n_c0, 3))
        np.add.at(psum, c0, pos)
        pmean = psum / np.bincount(c0, minlength=n_c0)[:, None]
        cell1 = np.floor(pmean / 12.0).astype(np.int64)
        _, c1 = np.unique(cell1[:, 0] * 10000 + cell1[:, 1] * 100 + cell1[:, 2], return_inverse=True)
        entries.append(
            {
                "x": rng.normal(size=(n, 13)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.uniform(0.5, 3.0, size=(len(pairs), edge_dim)).astype(np.float32),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "cluster0": c0.astype(np.int32),
                "cluster1": c1.astype(np.int32),
                "entry_name": f"cbs-{g}",
            }
        )
    return entries


@pytest.mark.parametrize(
    ("bs_cls", "coo_cls", "weighted"),
    [
        (GINetClusteredBlockSparse, GINet, False),
        (FoutNetBlockSparse, FoutNet, False),
        (SGATBlockSparse, SGAT, True),
    ],
)
def test_clustered_blocksparse_matches_coo(bs_cls, coo_cls, weighted) -> None:
    entries = _clustered_entries(edge_dim=1)
    feat_dim, edge_dim = 13, 1

    model_bs = bs_cls(feat_dim, 2, edge_dim)
    model_coo = coo_cls(feat_dim, 2, edge_dim)
    params = model_bs.init(jax.random.PRNGKey(0))

    coo_batch, _ = collate_graphs(entries, pad_graphs=4)
    # f32 weight storage isolates the layout/aggregation logic exactly; the
    # production bf16 default's error is bounded in
    # test_weighted_bf16_storage_error below
    bs_batch, names = collate_graphs_blocksparse_clustered(
        entries, pad_graphs=4, with_edge_weights=weighted, weight_dtype=np.float32
    )
    assert names[:3] == [f"cbs-{g}" for g in range(3)]

    want = np.asarray(model_coo.apply(params, coo_batch, training=False))
    got = np.asarray(model_bs.apply(params, bs_batch, training=False))
    np.testing.assert_allclose(got[:3], want[:3], rtol=1e-4, atol=1e-4)

    def loss_coo(p):
        out = model_coo.apply(p, coo_batch, training=False)
        return (out[:3] ** 2).sum()

    def loss_bs(p):
        out = model_bs.apply(p, bs_batch, training=False)
        return (out[:3] ** 2).sum()

    g_coo = jax.grad(loss_coo)(params)
    g_bs = jax.grad(loss_bs)(params)
    flat_coo = jax.tree_util.tree_leaves_with_path(g_coo)
    flat_bs = dict(jax.tree_util.tree_leaves_with_path(g_bs))
    for path, leaf in flat_coo:
        np.testing.assert_allclose(
            np.asarray(flat_bs[path]), np.asarray(leaf), rtol=1e-3, atol=1e-3, err_msg=str(path)
        )


@pytest.mark.parametrize(
    ("bs_cls", "coo_cls", "weighted"),
    [
        (GINetClusteredBlockSparse, GINet, False),
        (FoutNetBlockSparse, FoutNet, False),
        (SGATBlockSparse, SGAT, True),
    ],
)
def test_slot8_matches_coo(bs_cls, coo_cls, weighted) -> None:
    """The slot8 (cluster-major 8-lane slot) layout: same COO oracle, same
    tolerance, forward AND gradients — the Pallas slot pool's XLA fallback
    carries the CPU path."""
    entries = _clustered_entries(edge_dim=1)
    model_bs = bs_cls(13, 2, 1)
    model_coo = coo_cls(13, 2, 1)
    params = model_bs.init(jax.random.PRNGKey(0))

    coo_batch, _ = collate_graphs(entries, pad_graphs=4)
    bs_batch, _ = collate_graphs_blocksparse_clustered(
        entries, pad_graphs=4, with_edge_weights=weighted, weight_dtype=np.float32, slot8=True
    )
    assert bs_batch.slot_cluster.size == bs_batch.x.shape[0] // 8
    assert bs_batch.x.shape[0] % 1024 == 0  # whole kernel groups

    want = np.asarray(model_coo.apply(params, coo_batch, training=False))
    got = np.asarray(model_bs.apply(params, bs_batch, training=False))
    np.testing.assert_allclose(got[:3], want[:3], rtol=1e-4, atol=1e-4)

    g_coo = jax.grad(lambda p: (model_coo.apply(p, coo_batch, training=False)[:3] ** 2).sum())(params)
    g_bs = jax.grad(lambda p: (model_bs.apply(p, bs_batch, training=False)[:3] ** 2).sum())(params)
    flat_bs = dict(jax.tree_util.tree_leaves_with_path(g_bs))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_coo):
        np.testing.assert_allclose(
            np.asarray(flat_bs[path]), np.asarray(leaf), rtol=1e-3, atol=1e-3, err_msg=str(path)
        )


def test_slot8_collate_bookkeeping() -> None:
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    batch, _ = collate_graphs_blocksparse_clustered(entries, pad_graphs=3, slot8=True)

    nm = np.asarray(batch.node_mask)
    c0 = np.asarray(batch.cluster0)
    sc = np.asarray(batch.slot_cluster)
    pooled_cap = batch.structure_p.padded_nodes
    rows = np.nonzero(nm)[0]
    # a real node's slot maps to the node's own pooled slot
    np.testing.assert_array_equal(sc[rows // 8], c0[rows])
    # slots with no real node map OOB
    live = np.zeros(len(sc), bool)
    live[rows // 8] = True
    assert (sc[~live] == pooled_cap).all()
    # members0s inverts slot_cluster (padded with the slot capacity)
    m0s = np.asarray(batch.members0s)
    assert m0s.shape[0] == pooled_cap
    for c in np.unique(sc[live]):
        want = np.sort(np.nonzero(sc == c)[0])
        got = np.sort(m0s[c][m0s[c] < len(sc)])
        np.testing.assert_array_equal(got, want)

    # requirements mirror the slot8 collate
    from deeprank2_tpu.ops.batch import clustered_blocksparse_requirements

    req = clustered_blocksparse_requirements(entries, slot8=True)
    batch2, _ = collate_graphs_blocksparse_clustered(entries, pad_tiles=req["tiles"], slot8=True)
    assert -(-req["tiles"] // 8) * 8 * 128 == batch2.x.shape[0]
    assert req["blocks"] <= batch2.structure.num_blocks
    assert req["members0s_s"] == batch2.members0s.shape[1]


def test_weighted_bf16_storage_error() -> None:
    """Production bf16 weight storage: forward error vs the f32-exact build
    stays within the ~0.4 % relative band bf16 mantissas imply."""
    entries = _clustered_entries(edge_dim=1)
    model = SGATBlockSparse(13, 2, 1)
    params = model.init(jax.random.PRNGKey(0))
    exact, _ = collate_graphs_blocksparse_clustered(entries, pad_graphs=4, with_edge_weights=True, weight_dtype=np.float32)
    prod, _ = collate_graphs_blocksparse_clustered(entries, pad_graphs=4, with_edge_weights=True)
    a = np.asarray(model.apply(params, exact, training=False))[:3]
    b = np.asarray(model.apply(params, prod, training=False))[:3]
    np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-2)
    assert np.abs(b - a).max() > 0.0  # the two builds really differ


def test_clustered_collate_bookkeeping() -> None:
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    batch, _ = collate_graphs_blocksparse_clustered(entries, pad_graphs=3)

    v0 = entries[0]["x"].shape[0]
    c0 = np.asarray(batch.cluster0)
    pm = np.asarray(batch.pooled_node_mask)
    pg = np.asarray(batch.pooled_node_graph)
    nm = np.asarray(batch.node_mask)
    ng = np.asarray(batch.node_graph)
    pooled_cap = batch.structure_p.padded_nodes

    # every real node maps to a real pooled slot of the same graph
    assert (c0[nm] < pooled_cap).all()
    assert pm[c0[nm]].all()
    np.testing.assert_array_equal(pg[c0[nm]], ng[nm])
    # padded nodes map OOB
    assert (c0[~nm] == pooled_cap).all()

    # degree equals the mirrored-edge count per node
    deg = np.asarray(batch.deg)
    want_deg = np.zeros(len(deg))
    # recompute through the same locality layout
    from deeprank2_tpu.ops.batch import blocksparse_layout

    layout = blocksparse_layout(entries, 128, 3)
    for i, j in layout["pairs"]:
        want_deg[i] += 1
        want_deg[j] += 1
    np.testing.assert_array_equal(deg, want_deg)

    # cluster1 of real pooled slots stays in-range and its graph matches
    c1 = np.asarray(batch.cluster1)
    c1g = np.asarray(batch.c1_graph)
    assert (c1[pm] < len(c1g)).all()
    np.testing.assert_array_equal(c1g[c1[pm]], pg[pm])


def test_requirements_match_collate() -> None:
    """clustered_blocksparse_requirements mirrors the collate's cluster math
    by re-implementation (no shared pass) — this pins them together so the
    sharded collation's shared caps can never under-provision a shard."""
    from deeprank2_tpu.ops.batch import clustered_blocksparse_requirements

    entries = _clustered_entries(num_graphs=3)
    req = clustered_blocksparse_requirements(entries)
    batch, _ = collate_graphs_blocksparse_clustered(entries)

    assert req["tiles"] * 128 == batch.x.shape[0]
    assert req["blocks"] <= batch.structure.num_blocks  # collate rounds to the grid-step quantum
    assert batch.structure.num_blocks - req["blocks"] < 128
    assert req["pooled_tiles"] * 128 == batch.structure_p.padded_nodes
    assert req["pooled_blocks"] <= batch.structure_p.num_blocks
    assert batch.structure_p.num_blocks - req["pooled_blocks"] < 128
    assert req["c1"] == batch.c1_graph.shape[0]
    assert req["members0_s"] == batch.members0.shape[1]
    assert req["members1_s"] == batch.members1.shape[1]


def test_member_matrix_fallback_scatter_parity() -> None:
    """One pathological cluster (most nodes in a single cluster) makes the
    collate decline the member matrix; the models must fall back to the
    scatter path and still match the COO oracle."""
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    # collapse entry 0 into two clusters: a giant one + a singleton
    v0 = entries[0]["x"].shape[0]
    c0 = np.zeros(v0, dtype=np.int32)
    c0[-1] = 1
    entries[0]["cluster0"] = c0
    entries[0]["cluster1"] = np.zeros(2, dtype=np.int32)

    bs_batch, _ = collate_graphs_blocksparse_clustered(entries, pad_graphs=2, weight_dtype=np.float32)
    assert bs_batch.members0.size == 0  # fallback engaged

    model_bs = GINetClusteredBlockSparse(13, 2, 1)
    model_coo = GINet(13, 2, 1)
    params = model_bs.init(jax.random.PRNGKey(1))
    coo_batch, _ = collate_graphs(entries, pad_graphs=2)
    want = np.asarray(model_coo.apply(params, coo_batch, training=False))
    got = np.asarray(model_bs.apply(params, bs_batch, training=False))
    np.testing.assert_allclose(got[:2], want[:2], rtol=1e-4, atol=1e-4)


def test_weighted_structure_row_sums() -> None:
    """Weighted BCSR: A_w @ 1 recovers the precomputed row sums (bf16 tol)."""
    from deeprank2_tpu.ops.block_sparse import bcsr_spmm_xla

    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    batch, _ = collate_graphs_blocksparse_clustered(entries, pad_graphs=2, with_edge_weights=True)
    ones = jnp.ones((batch.structure.padded_nodes, 1), jnp.float32)
    got = np.asarray(bcsr_spmm_xla(batch.structure, ones))[:, 0]
    np.testing.assert_allclose(got, np.asarray(batch.wsum), rtol=1e-2, atol=1e-2)

    ones_p = jnp.ones((batch.structure_p.padded_nodes, 1), jnp.float32)
    got_p = np.asarray(bcsr_spmm_xla(batch.structure_p, ones_p))[:, 0]
    np.testing.assert_allclose(got_p, np.asarray(batch.wsum_p), rtol=1e-2, atol=1e-2)
