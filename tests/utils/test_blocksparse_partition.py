"""Multi-device block-sparse graph parallelism: partition correctness,
forward/grad parity vs the single-device model on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
from deeprank2_tpu.parallel.blocksparse_partition import (
    bcsr_spmm_sharded,
    make_blocksparse_ginet_forward,
    partition_blocksparse_batch,
)
from deeprank2_tpu.parallel.dp import default_mesh


def _entries(num_graphs=2, seed=0):
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    entries = []
    for g in range(num_graphs):
        n = [300, 220][g % 2] + 30 * g
        pos = rng.uniform(0, 26, size=(n, 3))
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, 12)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "entry_name": f"p{g}",
            }
        )
    return entries


def test_partition_spmm_matches_full() -> None:
    """Concatenating every shard's rectangular SpMM rows == the full SpMM."""
    from deeprank2_tpu.ops.block_sparse import bcsr_spmm_xla

    batch, _ = collate_graphs_blocksparse(_entries(2, seed=1))
    num_shards = 4
    part = partition_blocksparse_batch(batch, num_shards)

    st_full = batch.structure
    n_pad = part.structure.num_tiles * part.structure.block  # nt_pad * B
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_pad, 8)).astype(np.float32)
    want = np.asarray(bcsr_spmm_xla(st_full, jnp.asarray(x[: st_full.padded_nodes])))

    got_rows = []
    for d in range(num_shards):
        st_d = jax.tree.map(lambda a, d=d: a[d], part.structure)
        got_rows.append(np.asarray(bcsr_spmm_xla(st_d, jnp.asarray(x))))
    got = np.concatenate(got_rows)[: st_full.padded_nodes]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sharded_forward_matches_single_device() -> None:
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    entries = _entries(3, seed=2)
    batch, _ = collate_graphs_blocksparse(entries)
    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(0))
    want = np.asarray(model.apply(params, batch, training=False))

    num_shards = min(4, jax.device_count())
    mesh = default_mesh("bp", devices=jax.devices()[:num_shards])
    part = partition_blocksparse_batch(batch, num_shards)
    forward = make_blocksparse_ginet_forward(model, mesh=mesh)
    got = np.asarray(forward(params, part))
    np.testing.assert_allclose(got[:3], want[:3], atol=1e-4)


def test_sharded_grads_match_single_device() -> None:
    """The custom-VJP (gather + same local SpMM) gives the single-device
    parameter gradients — the training-signal parity of the sharded path."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    entries = _entries(2, seed=3)
    batch, _ = collate_graphs_blocksparse(entries)
    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(1))

    def loss_single(p):
        out = model.apply(p, batch, training=False)
        return (out[:2] ** 2).sum()

    g_single = jax.grad(loss_single)(params)

    num_shards = min(4, jax.device_count())
    mesh = default_mesh("bp", devices=jax.devices()[:num_shards])
    part = partition_blocksparse_batch(batch, num_shards)
    forward = make_blocksparse_ginet_forward(model, mesh=mesh)

    def loss_sharded(p):
        out = forward(p, part)
        return (out[:2] ** 2).sum()

    g_sharded = jax.grad(loss_sharded)(params)
    flat_single = jax.tree_util.tree_leaves_with_path(g_single)
    flat_sharded = dict(jax.tree_util.tree_leaves_with_path(g_sharded))
    for path, leaf in flat_single:
        np.testing.assert_allclose(np.asarray(flat_sharded[path]), np.asarray(leaf), atol=5e-3, err_msg=str(path))


def test_partitioned_collate_matches_batch_partition() -> None:
    """Collating straight into the partitioned form equals partitioning an
    already-collated batch (the Trainer path vs the standalone path)."""
    from deeprank2_tpu.parallel.blocksparse_partition import collate_graphs_blocksparse_partitioned

    entries = _entries(3, seed=6)
    batch, _ = collate_graphs_blocksparse(entries)
    want = partition_blocksparse_batch(batch, 4)
    got, names = collate_graphs_blocksparse_partitioned(entries, 4)
    assert names[:3] == [e["entry_name"] for e in entries]

    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(7))
    if jax.device_count() >= 2:
        mesh = default_mesh("bp", devices=jax.devices()[:4])
        fwd = make_blocksparse_ginet_forward(model, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(fwd(params, got))[:3], np.asarray(fwd(params, want))[:3], atol=1e-5
        )
    for path, leaf in jax.tree_util.tree_leaves_with_path(want):
        other = dict(jax.tree_util.tree_leaves_with_path(got))[path]
        assert np.asarray(other).shape == np.asarray(leaf).shape, path


def test_sharded_collate_respects_graph_capacity() -> None:
    """Regression: one big graph plus many small ones must not overfill a
    shard's graph slots (tile-greedy assignment previously could)."""
    from scipy.spatial import cKDTree

    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse_sharded

    rng = np.random.default_rng(11)
    entries = []
    sizes = [700] + [40] * 7  # 5 tiles + seven 1-tile graphs
    for g, n in enumerate(sizes):
        pos = rng.uniform(0, 40, size=(n, 3))
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, 6)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "entry_name": f"c{g}",
            }
        )
    stacked, names = collate_graphs_blocksparse_sharded(entries, 2, 4)
    assert sorted(n for n in names if n) == sorted(e["entry_name"] for e in entries)
    # every graph id in the node arrays is < pad_graphs (no silent drops)
    gid = np.asarray(stacked.node_graph)
    mask = np.asarray(stacked.node_mask)
    assert gid[mask].max() < 4

    with pytest.raises(ValueError, match="exceed"):
        collate_graphs_blocksparse_sharded(entries, 2, 2)


def test_sharded_spmm_grad_is_gathered_spmm() -> None:
    """Direct VJP check on one shard's rectangular slice under shard_map."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    batch, _ = collate_graphs_blocksparse(_entries(1, seed=4))
    num_shards = 2
    part = partition_blocksparse_batch(batch, num_shards)
    mesh = default_mesh("bp", devices=jax.devices()[:num_shards])
    axis = mesh.axis_names[0]

    n_pad = part.structure.num_tiles * part.structure.block
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(n_pad, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n_pad, 4)).astype(np.float32))

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis), P(axis)), out_specs=P(), check_rep=False)
    def grad_sharded(part, x_sh, w_sh):
        local = jax.tree.map(lambda a: a[0], part)

        def f(xl):
            out = bcsr_spmm_sharded(local.structure, xl, axis)
            return (out * w_sh[0]).sum()

        val, g = jax.value_and_grad(f)(x_sh[0])
        val = jax.lax.psum(val, axis)
        g_full = jax.lax.all_gather(g, axis, axis=0, tiled=True)
        return val, g_full

    x_sh = x.reshape(num_shards, -1, 4)
    w_sh = w.reshape(num_shards, -1, 4)
    _, g = grad_sharded(part, x_sh, w_sh)

    # dense oracle: grad = A^T w = A w (symmetric)
    from deeprank2_tpu.ops.block_sparse import bcsr_spmm_xla

    st_full = batch.structure
    aw = np.asarray(bcsr_spmm_xla(st_full, w[: st_full.padded_nodes]))
    np.testing.assert_allclose(np.asarray(g)[: st_full.padded_nodes], aw, atol=1e-4)
