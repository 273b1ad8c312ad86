"""Block-sparse (BCSR) SpMM path: builder, kernels, and GINet parity.

The Pallas kernel runs in interpret mode on CPU; the TPU path is exercised by
tests/perf/blocksparse_perf.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import deeprank2_tpu.ops.block_sparse as bs
from deeprank2_tpu.ops.block_sparse import (
    KBATCH,
    bcsr_spmm,
    bcsr_spmm_xla,
    build_blocksparse,
    locality_order,
)


def _geometric_graph(n, cutoff=4.5, seed=0, box=30.0):
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, box, size=(n, 3))
    order = locality_order(pos)
    pos = pos[order]
    pairs = cKDTree(pos).query_pairs(cutoff, output_type="ndarray")
    return pos, pairs


def _dense_adj(pairs, n):
    adj = np.zeros((n, n), np.float32)
    adj[pairs[:, 0], pairs[:, 1]] = 1.0
    adj[pairs[:, 1], pairs[:, 0]] = 1.0
    return adj


def _run_kernel_interpret(st, x):
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(
            bs._bcsr_spmm_tpu(
                st.blocks_t,
                st.block_col,
                st.batch_row,
                st.batch_chunk,
                st.visited,
                jnp.asarray(x),
                num_tiles=st.num_tiles,
                num_chunks=st.num_chunks,
                block=st.block,
                precision=jax.lax.Precision.HIGHEST,
            )
        )


def test_builder_matches_dense_adjacency() -> None:
    pos, pairs = _geometric_graph(500, seed=1)
    st = build_blocksparse(pairs, 500)
    n = st.padded_nodes
    adj = _dense_adj(pairs, n)
    # reconstruct dense adjacency from the transposed blocks (accumulating:
    # zero-pad blocks share coordinates with real blocks)
    got = np.zeros((n, n), np.float32)
    br = np.asarray(st.block_row)
    bc = np.asarray(st.block_col)
    blocks = np.asarray(st.blocks_t, dtype=np.float32)
    for k in range(st.num_blocks):
        got[br[k] * 128 : (br[k] + 1) * 128, bc[k] * 128 : (bc[k] + 1) * 128] += blocks[k].T
    np.testing.assert_array_equal(got, adj)

    # batch bookkeeping: a KBATCH multiple, uniform (row, chunk) per batch
    assert st.num_blocks % KBATCH == 0
    bchunk = np.asarray(st.batch_chunk)
    brow = np.asarray(st.batch_row)
    nonzero = np.asarray(blocks).any(axis=(1, 2))
    for b in range(st.num_blocks // KBATCH):
        rows = br[b * KBATCH : (b + 1) * KBATCH][nonzero[b * KBATCH : (b + 1) * KBATCH]]
        assert (rows == brow[b]).all()
    # every nonzero block's (chunk, row) is marked visited
    vis = np.asarray(st.visited)
    for b in range(st.num_blocks // KBATCH):
        assert vis[bchunk[b], brow[b]]
    # batches are grouped: same (chunk, row) never reappears after a change
    seen = set()
    prev = None
    for b in range(st.num_blocks // KBATCH):
        cur = (int(bchunk[b]), int(brow[b]))
        if cur != prev:
            assert cur not in seen
            seen.add(cur)
        prev = cur


def test_builder_trailing_pad_blocks_stay_in_chunk(monkeypatch) -> None:
    """Capacity-pad slots beyond the last real batch must point their
    block_col INTO the routed chunk: the kernel computes
    ``local = block_col - batch_chunk*CHUNK_TILES`` and a stale global-tile-0
    column under a chunk > 0 routing makes ``local`` negative (OOB xchunk
    read — round-2 advisor finding)."""
    monkeypatch.setattr(bs, "CHUNK_TILES", 2)
    pos, pairs = _geometric_graph(900, seed=8)
    st = build_blocksparse(pairs, 900)
    assert st.num_chunks > 1
    bc = np.asarray(st.block_col)
    bchunk = np.asarray(st.batch_chunk)
    local = bc - np.repeat(bchunk, KBATCH) * bs.CHUNK_TILES
    assert (local >= 0).all()
    assert (local < bs.CHUNK_TILES).all()


def test_spmm_xla_matches_dense() -> None:
    pos, pairs = _geometric_graph(700, seed=2)
    st = build_blocksparse(pairs, 700)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(st.padded_nodes, 24)).astype(np.float32)
    want = _dense_adj(pairs, st.padded_nodes) @ x
    got = np.asarray(bcsr_spmm_xla(st, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_spmm_kernel_interpret_matches_xla() -> None:
    pos, pairs = _geometric_graph(600, seed=3)
    st = build_blocksparse(pairs, 600, pad_blocks_to=8 * KBATCH)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(st.padded_nodes, 19)).astype(np.float32)  # odd F exercises sublane padding
    want = np.asarray(bcsr_spmm_xla(st, jnp.asarray(x)))
    try:
        got = _run_kernel_interpret(st, x)
    except NotImplementedError as e:  # pragma: no cover - interpreter support varies
        pytest.skip(f"pallas interpret mode unavailable here: {e}")
    # any OTHER failure (IndexError, XlaRuntimeError, ...) is a real kernel
    # bug and must fail the test — interpret mode is the kernel's only CPU
    # coverage (the round-2 trailing-pad OOB hid behind a bare except here)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_spmm_kernel_chunked_interpret(monkeypatch) -> None:
    """Multi-chunk path (x^T larger than one VMEM chunk) stays correct."""
    monkeypatch.setattr(bs, "CHUNK_TILES", 2)
    bs._bcsr_spmm_tpu.clear_cache()  # CHUNK_TILES is baked in at trace time
    try:
        pos, pairs = _geometric_graph(900, seed=8)
        st = build_blocksparse(pairs, 900)
        assert st.num_chunks > 1
        rng = np.random.default_rng(4)
        x = rng.normal(size=(st.padded_nodes, 16)).astype(np.float32)
        want = np.asarray(bcsr_spmm_xla(st, jnp.asarray(x)))
        try:
            got = _run_kernel_interpret(st, x)
        except NotImplementedError as e:  # pragma: no cover
            pytest.skip(f"pallas interpret mode unavailable here: {e}")
        np.testing.assert_allclose(got, want, atol=1e-4)
    finally:
        bs._bcsr_spmm_tpu.clear_cache()


def test_spmm_grad_is_transposed_spmm() -> None:
    pos, pairs = _geometric_graph(300, seed=4)
    st = build_blocksparse(pairs, 300)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(st.padded_nodes, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(st.padded_nodes, 8)).astype(np.float32))
    g = jax.grad(lambda x: (bcsr_spmm(st, x) * w).sum())(x)
    adj = _dense_adj(pairs, st.padded_nodes)
    np.testing.assert_allclose(np.asarray(g), adj.T @ np.asarray(w), atol=1e-4)


def test_empty_graph_structure() -> None:
    st = build_blocksparse(np.zeros((0, 2), np.int64), 10)
    x = jnp.ones((st.padded_nodes, 4), jnp.float32)
    out = bcsr_spmm(st, x)
    assert np.asarray(out).sum() == 0.0


def test_ginet_blocksparse_matches_coo() -> None:
    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet as GINetCOO
    from deeprank2_tpu.ops.batch import collate_graphs, collate_graphs_blocksparse

    rng = np.random.default_rng(5)
    entries = []
    for g in range(3):
        n = [180, 260, 140][g]
        pos = rng.uniform(0, 22, size=(n, 3))
        from scipy.spatial import cKDTree

        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, 38)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.normal(size=(len(pairs), 6)).astype(np.float32),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "entry_name": f"bs-{g}",
            }
        )

    feat_dim, edge_dim = 38, 6
    model_bs = GINetBlockSparse(feat_dim, 2, edge_dim)
    model_coo = GINetCOO(feat_dim, 2, edge_dim)
    params = model_bs.init(jax.random.PRNGKey(0))

    coo_batch, _ = collate_graphs(entries, pad_graphs=4)
    bs_batch, _ = collate_graphs_blocksparse(entries, pad_graphs=4)

    want = np.asarray(model_coo.apply(params, coo_batch, training=False))
    got = np.asarray(model_bs.apply(params, bs_batch, training=False))
    np.testing.assert_allclose(got[:3], want[:3], atol=1e-4)

    # gradients agree too (training signal parity)
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
        np.testing.assert_allclose(np.asarray(flat_bs[path]), np.asarray(leaf), atol=5e-3, err_msg=str(path))


def test_collate_blocksparse_sharded_matches_unsharded() -> None:
    """Sharded collation: rectangular stacked pytree; each shard's model
    output equals running that shard's graphs through unsharded collation."""
    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse, collate_graphs_blocksparse_sharded

    rng = np.random.default_rng(9)
    entries = []
    for g in range(5):
        n = [170, 260, 140, 300, 90][g]
        pos = rng.uniform(0, 24, size=(n, 3))
        from scipy.spatial import cKDTree

        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, 12)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "entry_name": f"s{g}",
            }
        )

    num_shards, per_shard = 3, 2
    stacked, names = collate_graphs_blocksparse_sharded(entries, num_shards, per_shard)
    assert stacked.x.shape[0] == num_shards
    assert len(names) == num_shards * per_shard
    assert sorted(n for n in names if n) == [f"s{g}" for g in range(5)]

    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(3))
    by_name = {e["entry_name"]: e for e in entries}
    for s in range(num_shards):
        shard_batch = jax.tree.map(lambda a: a[s], stacked)  # noqa: B023
        got = np.asarray(model.apply(params, shard_batch, training=False))
        shard_names = [n for n in names[s * per_shard : (s + 1) * per_shard] if n]
        if not shard_names:
            continue
        solo, _ = collate_graphs_blocksparse([by_name[n] for n in shard_names], pad_graphs=per_shard)
        want = np.asarray(model.apply(params, solo, training=False))
        np.testing.assert_allclose(got[: len(shard_names)], want[: len(shard_names)], atol=1e-4)


def test_collate_blocksparse_buckets() -> None:
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse

    rng = np.random.default_rng(6)
    entries = []
    for g in range(2):
        n = 150
        pos = rng.uniform(0, 20, size=(n, 3)).astype(np.float32)
        from scipy.spatial import cKDTree

        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, 8)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "pos": pos,
                "y": 1.0,
                "entry_name": f"e{g}",
            }
        )
    batch, names = collate_graphs_blocksparse(entries, pad_tiles=8, pad_blocks=64, pad_graphs=4)
    assert batch.x.shape[0] == 8 * 128
    # capacity rounds up to the KBATCH*SUPER grid-step quantum
    assert batch.structure.num_blocks == -(-64 // (bs.KBATCH * bs.SUPER)) * (bs.KBATCH * bs.SUPER)
    assert batch.num_graphs == 4
    assert names[:2] == ["e0", "e1"]
    # graphs never share a tile: each tile's nodes carry at most one graph id
    gid = np.asarray(batch.node_graph).reshape(8, 128)
    for t in range(8):
        real = gid[t][gid[t] < 4]
        assert len(set(real.tolist())) <= 1


def test_bcsr_spmm_transposed_io():
    """bcsr_spmm_t == bcsr_spmm modulo the transpose, forward and VJP."""
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.block_sparse import bcsr_spmm, bcsr_spmm_t, build_blocksparse

    rng = np.random.default_rng(4)
    n = 300
    und = rng.integers(0, n, size=(1500, 2))
    und = und[und[:, 0] != und[:, 1]]
    st = build_blocksparse(und, n)
    x = jnp.asarray(rng.normal(size=(st.padded_nodes, 24)), dtype=jnp.float32)

    out = bcsr_spmm(st, x)
    out_t = bcsr_spmm_t(st, x.T)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out).T, rtol=1e-5, atol=1e-5)

    g = jax.grad(lambda x: jnp.sum(jnp.cos(bcsr_spmm(st, x))))(x)
    g_t = jax.grad(lambda xt: jnp.sum(jnp.cos(bcsr_spmm_t(st, xt))))(x.T)
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g).T, rtol=1e-5, atol=1e-5)
