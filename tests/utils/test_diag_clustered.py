"""GINetClusteredDiag (graph-diagonal clustered fast path) vs the COO oracle."""

import jax
import numpy as np
import pytest

import numpy as _np

from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet, FoutNetDiag
from deeprank2_tpu.neuralnets.gnn.ginet import GINet
from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDiag
from deeprank2_tpu.neuralnets.gnn.sgat import SGAT, SGATDiag
from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_diag_clustered, diag_clustered_requirements
from tests.utils.test_clustered_blocksparse import _clustered_entries


@pytest.mark.parametrize(
    ("diag_cls", "coo_cls", "weighted"),
    [(GINetClusteredDiag, GINet, False), (FoutNetDiag, FoutNet, False), (SGATDiag, SGAT, True)],
)
def test_diag_clustered_matches_coo(diag_cls, coo_cls, weighted) -> None:
    entries = _clustered_entries(edge_dim=1)
    model_d = diag_cls(13, 2, 1)
    model_coo = coo_cls(13, 2, 1)
    params = model_d.init(jax.random.PRNGKey(0))

    coo_batch, _ = collate_graphs(entries, pad_graphs=4)
    # f32 weight storage = the exact-oracle collate mode (bf16 storage error
    # is bounded separately below)
    d_batch, names = collate_graphs_diag_clustered(
        entries, pad_graphs=4, with_edge_weights=weighted, weight_dtype=_np.float32 if weighted else None
    )
    assert names[:3] == [f"cbs-{g}" for g in range(3)]
    assert d_batch.adj_i8.shape[1] % 8 == 0

    want = np.asarray(model_coo.apply(params, coo_batch, training=False))
    got = np.asarray(model_d.apply(params, d_batch, training=False))
    np.testing.assert_allclose(got[:3], want[:3], rtol=1e-4, atol=1e-4)

    g_coo = jax.grad(lambda p: (model_coo.apply(p, coo_batch, training=False)[:3] ** 2).sum())(params)
    g_d = jax.grad(lambda p: (model_d.apply(p, d_batch, training=False)[:3] ** 2).sum())(params)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(g_d))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_coo):
        np.testing.assert_allclose(
            np.asarray(flat_d[path]), np.asarray(leaf), rtol=1e-3, atol=1e-3, err_msg=str(path)
        )


def test_diag_clustered_collate_bookkeeping() -> None:
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    # explicit pure layout: the slot-space assertions below are about the
    # slot8 bookkeeping (the mixed region layout has its own test)
    batch, _ = collate_graphs_diag_clustered(entries, pad_graphs=3, min_slot_nodes=1)
    g_count, n_cap, _ = batch.adj_i8.shape
    k_cap = batch.pooled_mask.shape[1]

    assert not batch.region_caps
    nm = np.asarray(batch.node_mask)
    sc = np.asarray(batch.slot_cluster)
    # real slots map into their own graph's pooled range; padding slots OOB
    for g in range(g_count):
        rows = np.nonzero(nm[g])[0]
        slots = np.unique((g * n_cap + rows) // 8)
        assert ((sc[slots] >= g * k_cap) & (sc[slots] < (g + 1) * k_cap)).all()
    live = np.zeros(len(sc), bool)
    for g in range(g_count):
        rows = np.nonzero(nm[g])[0]
        live[np.unique((g * n_cap + rows) // 8)] = True
    assert (sc[~live] == g_count * k_cap).all()

    # pooled adjacency is symmetric, zero diagonal, zero on padded slots
    adj_p = np.asarray(batch.adj_p_i8)
    np.testing.assert_array_equal(adj_p, np.transpose(adj_p, (0, 2, 1)))
    assert (np.diagonal(adj_p, axis1=1, axis2=2) == 0).all()
    pm = np.asarray(batch.pooled_mask)
    assert (adj_p[~np.repeat(pm[:, :, None], k_cap, 2) & (adj_p > 0)] == 0).all() or (adj_p * ~pm[:, :, None]).sum() == 0

    # depth-1 ids of real pooled slots point at slots of the same graph
    c1 = np.asarray(batch.cluster1).reshape(g_count, k_cap)
    c1g = np.asarray(batch.c1_graph)
    for g in range(g_count):
        ids = c1[g][pm[g]]
        assert (ids < len(c1g)).all()
        np.testing.assert_array_equal(c1g[ids], g)

    # requirements mirror the collate
    req = diag_clustered_requirements(entries)
    batch2, _ = collate_graphs_diag_clustered(
        entries, pad_nodes=req["nodes"], pad_clusters=req["clusters"], pad_c1=req["c1"], min_slot_nodes=1
    )
    assert batch2.adj_i8.shape[1] == -(-req["nodes"] // 8) * 8
    assert batch2.pooled_mask.shape[1] == -(-req["clusters"] // 8) * 8
    assert batch2.c1_graph.shape[0] == req["c1"]
    assert req["members0s_s"] == batch2.members0s.shape[1]
    assert req["members1_s"] == batch2.members1.shape[1]


def test_sgat_diag_bf16_storage_error() -> None:
    """Production bf16 weighted-adjacency storage vs the f32-exact build:
    stays inside the bf16 band (mirrors the weighted-BCSR test)."""
    entries = _clustered_entries(edge_dim=1)
    model = SGATDiag(13, 2, 1)
    params = model.init(jax.random.PRNGKey(0))
    exact, _ = collate_graphs_diag_clustered(entries, pad_graphs=4, with_edge_weights=True, weight_dtype=_np.float32)
    prod, _ = collate_graphs_diag_clustered(entries, pad_graphs=4, with_edge_weights=True)
    a = np.asarray(model.apply(params, exact, training=False))[:3]
    b = np.asarray(model.apply(params, prod, training=False))[:3]
    np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-2)
    assert np.abs(b - a).max() > 0.0


@pytest.mark.parametrize("pad_graphs", [3])
def test_diag_clustered_padded_graphs_inert(pad_graphs) -> None:
    """Padding graphs must not change real predictions."""
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    model = GINetClusteredDiag(13, 2, 1)
    params = model.init(jax.random.PRNGKey(1))
    tight, _ = collate_graphs_diag_clustered(entries, pad_graphs=2)
    padded, _ = collate_graphs_diag_clustered(entries, pad_graphs=pad_graphs)
    a = np.asarray(model.apply(params, tight, training=False))[:2]
    b = np.asarray(model.apply(params, padded, training=False))[:2]
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_diag_clustered_gapped_cluster0_ids() -> None:
    """A cluster0 id with zero members (gapped ids) must not create a live
    phantom pooled slot: its pooled_mask entry stays False and it is kept out
    of the depth-1 mean (COO parity — the COO path's counts>0 masking makes
    empty clusters inert there)."""
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    # gap the ids: shift every cluster0 id >= 1 up by one, so id 1 is empty
    for e in entries:
        c0 = np.asarray(e["cluster0"], dtype=np.int64)
        c0 = np.where(c0 >= 1, c0 + 1, c0)
        n_c0 = int(c0.max()) + 1
        c1 = np.asarray(e["cluster1"], dtype=np.int64)
        # cluster1 must have one entry per depth-0 id incl. the empty one
        c1g = np.zeros(n_c0, dtype=np.int64)
        c1g[np.unique(c0)] = c1
        c1g[1] = c1[0]  # phantom cluster points at a real depth-1 id
        e["cluster0"] = c0.astype(np.int32)
        e["cluster1"] = c1g.astype(np.int32)

    batch, _ = collate_graphs_diag_clustered(entries, pad_graphs=2, min_slot_nodes=1)
    pm = np.asarray(batch.pooled_mask)
    sc = np.asarray(batch.slot_cluster)
    k_cap = pm.shape[1]
    c1_cap = batch.c1_graph.shape[0]
    for g, e in enumerate(entries):
        n_c0 = int(np.asarray(e["cluster0"]).max()) + 1
        # exactly the populated ids are live
        assert pm[g].sum() == n_c0 - 1
        # the masked-off slot has no member slots and is OOB in cluster1
        dead = np.nonzero(~pm[g][:n_c0])[0]
        assert dead.shape[0] == 1
        dead_global = g * k_cap + dead[0]
        assert not np.any(sc == dead_global)
        assert np.asarray(batch.cluster1)[dead_global] == c1_cap

    # the mixed region layout masks the phantom too (one dead pooled slot
    # per graph, kept out of cluster1)
    mixed, _ = collate_graphs_diag_clustered(entries, pad_graphs=2, min_slot_nodes=5)
    assert mixed.region_caps
    pm_m = np.asarray(mixed.pooled_mask)
    for g, e in enumerate(entries):
        n_c0 = int(np.asarray(e["cluster0"]).max()) + 1
        assert pm_m[g].sum() == n_c0 - 1

    # the model still matches the COO oracle on the gapped clustering
    # (default = auto layout)
    batch, _ = collate_graphs_diag_clustered(entries, pad_graphs=2)
    model_d = GINetClusteredDiag(13, 2, 1)
    model_coo = GINet(13, 2, 1)
    params = model_d.init(jax.random.PRNGKey(0))
    coo_batch, _ = collate_graphs(entries, pad_graphs=2)
    want = np.asarray(model_coo.apply(params, coo_batch, training=False))[:2]
    got = np.asarray(model_d.apply(params, batch, training=False))[:2]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_mixed_layout_tiny_clusters() -> None:
    """Tiny clusters (avg ~2.6 nodes — real MCL output on small residue
    graphs): the mixed layout must keep them densely packed (rows within
    ~1.2x of the node count instead of the pure-slot8 ~3x) and still match
    the COO oracle."""
    from deeprank2_tpu.ops.batch import _slot8_plan, diag_mixed_requirements

    rng = np.random.default_rng(3)
    entries = []
    for g in range(3):
        n = 120
        pos = rng.uniform(0, 18, (n, 3)).astype(np.float32)
        from scipy.spatial import cKDTree

        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        cell = np.floor(pos / 3.2).astype(np.int64)  # tiny spatial clusters
        _, c0 = np.unique(cell[:, 0] * 10000 + cell[:, 1] * 100 + cell[:, 2], return_inverse=True)
        n_c0 = int(c0.max()) + 1
        psum = np.zeros((n_c0, 3))
        np.add.at(psum, c0, pos)
        pmean = psum / np.bincount(c0, minlength=n_c0)[:, None]
        cell1 = np.floor(pmean / 8.0).astype(np.int64)
        _, c1 = np.unique(cell1[:, 0] * 10000 + cell1[:, 1] * 100 + cell1[:, 2], return_inverse=True)
        entries.append(
            {
                "x": rng.normal(size=(n, 13)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.uniform(0.5, 3.0, size=(len(pairs), 1)).astype(np.float32),
                "pos": pos,
                "y": float(g % 2),
                "cluster0": c0.astype(np.int32),
                "cluster1": c1.astype(np.int32),
                "entry_name": f"tiny-{g}",
            }
        )
    avg = np.mean([e["x"].shape[0] / (int(e["cluster0"].max()) + 1) for e in entries])
    assert avg < 4.0  # the regime this layout exists for

    # row inflation: mixed region layout vs pure slot8
    req = diag_mixed_requirements(entries, 5)
    mixed_cap = req["big"] + req["s4"] + req["s2"] + req["s1"]
    slot8_cap = max(_slot8_plan(e, 8)["cap"] for e in entries)
    assert mixed_cap <= 1.5 * 120
    assert slot8_cap > 1.8 * 120  # what the pure layout would pay

    model_d = GINetClusteredDiag(13, 2, 1)
    model_coo = GINet(13, 2, 1)
    params = model_d.init(jax.random.PRNGKey(0))
    coo_batch, _ = collate_graphs(entries, pad_graphs=3)
    d_batch, _ = collate_graphs_diag_clustered(entries, pad_graphs=3)
    assert d_batch.region_caps  # the mixed region layout actually engaged
    want = np.asarray(model_coo.apply(params, coo_batch, training=False))[:3]
    got = np.asarray(model_d.apply(params, d_batch, training=False))[:3]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    g_coo = jax.grad(lambda p: (model_coo.apply(p, coo_batch, training=False)[:3] ** 2).sum())(params)
    g_d = jax.grad(lambda p: (model_d.apply(p, d_batch, training=False)[:3] ** 2).sum())(params)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(g_d))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_coo):
        np.testing.assert_allclose(np.asarray(flat_d[path]), np.asarray(leaf), rtol=1e-3, atol=1e-3, err_msg=str(path))


def test_mixed_layout_large_threshold_clamps() -> None:
    """min_slot_nodes > 5 must not overflow the stride-4 region: sizes 5..8
    slot regardless (a stride-s class only holds clusters of size <= s).
    Without the clamp, a size-6 cluster under min_slot_nodes=9 overwrote
    neighbouring clusters' rows (round-5 self-review repro)."""
    entries = _clustered_entries(num_graphs=2, sizes=(150, 90))
    total = sum(e["x"].shape[0] for e in entries)
    batch, _ = collate_graphs_diag_clustered(entries, pad_graphs=2, min_slot_nodes=9)
    assert int(np.asarray(batch.node_mask).sum()) == total  # nothing overwritten

    model_d = GINetClusteredDiag(13, 2, 1)
    model_coo = GINet(13, 2, 1)
    params = model_d.init(jax.random.PRNGKey(0))
    coo_batch, _ = collate_graphs(entries, pad_graphs=2)
    want = np.asarray(model_coo.apply(params, coo_batch, training=False))[:2]
    got = np.asarray(model_d.apply(params, batch, training=False))[:2]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_mixed_layout_fuzz_matches_coo(seed) -> None:
    """Property check over random cluster-size distributions and layout
    thresholds: every (entries, min_slot_nodes) combination must match the
    COO oracle forward — layouts are representation, never semantics."""
    rng = np.random.default_rng(seed)
    entries = []
    for g in range(3):
        n_clusters = int(rng.integers(5, 25))
        sizes = rng.integers(1, 13, size=n_clusters)
        n = int(sizes.sum())
        c0 = np.repeat(np.arange(n_clusters), sizes)
        rng.shuffle(c0)
        pos = rng.uniform(0, 20, (n, 3)).astype(np.float32)
        from scipy.spatial import cKDTree

        pairs = cKDTree(pos).query_pairs(6.0, output_type="ndarray")
        if not len(pairs):
            pairs = np.array([[0, 1]])
        c1 = rng.integers(0, max(n_clusters // 3, 1), size=n_clusters)
        entries.append(
            {
                "x": rng.normal(size=(n, 13)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.uniform(0.5, 3.0, size=(len(pairs), 1)).astype(np.float32),
                "pos": pos,
                "y": float(g % 2),
                "cluster0": c0.astype(np.int32),
                "cluster1": c1.astype(np.int32),
                "entry_name": f"fz-{g}",
            }
        )
    model_d = GINetClusteredDiag(13, 2, 1)
    model_coo = GINet(13, 2, 1)
    params = model_d.init(jax.random.PRNGKey(0))
    coo_batch, _ = collate_graphs(entries, pad_graphs=3)
    want = np.asarray(model_coo.apply(params, coo_batch, training=False))[:3]
    for msn in (1, 3, 5, 9):
        d_batch, _ = collate_graphs_diag_clustered(entries, pad_graphs=3, min_slot_nodes=msn)
        got = np.asarray(model_d.apply(params, d_batch, training=False))[:3]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, err_msg=f"min_slot_nodes={msn}")
