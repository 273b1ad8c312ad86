"""Block-sparse ppermute ring halo exchange: bucket coverage, forward/grad
parity vs the single-device model, and empty-bucket skip flags — all on the
virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
from deeprank2_tpu.parallel.blocksparse_partition import (
    collate_graphs_blocksparse_ring,
    make_blocksparse_ginet_ring_forward,
    partition_blocksparse_batch_ring,
)
from deeprank2_tpu.parallel.dp import default_mesh

from tests.utils.test_blocksparse_partition import _entries


def test_ring_buckets_cover_all_blocks() -> None:
    """diag + off buckets partition the row slice's nonzero blocks exactly."""
    batch, _ = collate_graphs_blocksparse(_entries(2, seed=1))
    num_shards = 4
    ring = partition_blocksparse_batch_ring(batch, num_shards)

    full_nnz = int(np.asarray(batch.structure.blocks_t).sum())
    diag_nnz = int(np.asarray(ring.diag.blocks_t).sum())
    off_nnz = sum(int(np.asarray(st.blocks_t).sum()) for st in ring.off)
    assert diag_nnz + off_nnz == full_nnz

    # an off bucket flagged empty really has no blocks, and vice versa
    flags = np.asarray(ring.off_has_blocks)
    per_bucket = np.stack(
        [np.asarray(st.blocks_t).sum(axis=(1, 2, 3)) > 0 for st in ring.off], axis=1
    )  # [D, D-1]
    np.testing.assert_array_equal(flags, per_bucket)


def test_ring_spmm_matches_full() -> None:
    """Host-side emulation of the ring (bucket SpMMs summed per shard) == full SpMM."""
    from deeprank2_tpu.ops.block_sparse import bcsr_spmm_xla

    batch, _ = collate_graphs_blocksparse(_entries(2, seed=2))
    num_shards = 4
    ring = partition_blocksparse_batch_ring(batch, num_shards)
    st_full = batch.structure

    r_rows = ring.x.shape[1]
    n_pad = r_rows * num_shards
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n_pad, 8)).astype(np.float32)
    want = np.asarray(bcsr_spmm_xla(st_full, jnp.asarray(x[: st_full.padded_nodes])))

    x_sh = x.reshape(num_shards, r_rows, 8)
    got_rows = []
    for d in range(num_shards):
        acc = np.asarray(bcsr_spmm_xla(jax.tree.map(lambda a, d=d: a[d], ring.diag), jnp.asarray(x_sh[d])))
        for k in range(1, num_shards):
            s = (d - k) % num_shards
            bucket = jax.tree.map(lambda a, d=d: a[d], ring.off[k - 1])
            acc = acc + np.asarray(bcsr_spmm_xla(bucket, jnp.asarray(x_sh[s])))
        got_rows.append(acc)
    got = np.concatenate(got_rows)[: st_full.padded_nodes]
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("num_shards", [2, 4])
def test_ring_forward_matches_single_device(num_shards) -> None:
    if jax.device_count() < num_shards:
        pytest.skip("needs multiple devices")
    entries = _entries(3, seed=3)
    batch, _ = collate_graphs_blocksparse(entries)
    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(0))
    want = np.asarray(model.apply(params, batch, training=False))

    mesh = default_mesh("bp", devices=jax.devices()[:num_shards])
    ring = partition_blocksparse_batch_ring(batch, num_shards)
    forward = make_blocksparse_ginet_ring_forward(model, mesh=mesh)
    got = np.asarray(forward(params, ring))
    np.testing.assert_allclose(got[:3], want[:3], atol=1e-4)


def test_ring_grads_match_single_device() -> None:
    """The ring custom-VJP (same ring on the cotangent) gives the
    single-device parameter gradients."""
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    entries = _entries(2, seed=4)
    batch, _ = collate_graphs_blocksparse(entries)
    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(1))

    def loss_single(p):
        out = model.apply(p, batch, training=False)
        return (out[:2] ** 2).sum()

    g_single = jax.grad(loss_single)(params)

    num_shards = min(4, jax.device_count())
    mesh = default_mesh("bp", devices=jax.devices()[:num_shards])
    ring = partition_blocksparse_batch_ring(batch, num_shards)
    forward = make_blocksparse_ginet_ring_forward(model, mesh=mesh)

    def loss_ring(p):
        out = forward(p, ring)
        return (out[:2] ** 2).sum()

    g_ring = jax.grad(loss_ring)(params)
    flat_ring = dict(jax.tree_util.tree_leaves_with_path(g_ring))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_single):
        np.testing.assert_allclose(np.asarray(flat_ring[path]), np.asarray(leaf), atol=5e-3, err_msg=str(path))


def test_ring_collate_matches_batch_partition() -> None:
    """Collating straight into the ring form equals partitioning an
    already-collated batch (the Trainer path vs the standalone path)."""
    entries = _entries(3, seed=6)
    batch, _ = collate_graphs_blocksparse(entries)
    want = partition_blocksparse_batch_ring(batch, 4)
    got, names = collate_graphs_blocksparse_ring(entries, 4)
    assert names[:3] == [e["entry_name"] for e in entries]
    got_leaves = dict(jax.tree_util.tree_leaves_with_path(got))
    for path, leaf in jax.tree_util.tree_leaves_with_path(want):
        assert np.asarray(got_leaves[path]).shape == np.asarray(leaf).shape, path

    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(7))
    if jax.device_count() >= 4:
        mesh = default_mesh("bp", devices=jax.devices()[:4])
        fwd = make_blocksparse_ginet_ring_forward(model, mesh=mesh)
        np.testing.assert_allclose(
            np.asarray(fwd(params, got))[:3], np.asarray(fwd(params, want))[:3], atol=1e-5
        )


def test_off_capacity_smaller_than_diag() -> None:
    """For locality-ordered geometric graphs the off-diagonal buckets must be
    much thinner than the diagonal one — the premise that makes the ring
    cheaper than all_gather. Capacities are per ring step (unrolled loop)."""
    batch, _ = collate_graphs_blocksparse(_entries(4, seed=8))
    ring = partition_blocksparse_batch_ring(batch, 4)
    assert max(st.blocks_t.shape[1] for st in ring.off) <= ring.diag.blocks_t.shape[1]


def test_ring_single_shard_degenerates_to_local() -> None:
    batch, _ = collate_graphs_blocksparse(_entries(1, seed=9))
    ring = partition_blocksparse_batch_ring(batch, 1)
    assert ring.off == ()

    model = GINetBlockSparse(12, 2, 1)
    params = model.init(jax.random.PRNGKey(2))
    want = np.asarray(model.apply(params, batch, training=False))
    mesh = default_mesh("bp", devices=jax.devices()[:1])
    fwd = make_blocksparse_ginet_ring_forward(model, mesh=mesh)
    np.testing.assert_allclose(np.asarray(fwd(params, ring))[:1], want[:1], atol=1e-4)


# The Trainer integration smoke test lives in tests/test_trainer.py
# (test_graph_parallel_blocksparse_ring) next to the all_gather GP variant.
