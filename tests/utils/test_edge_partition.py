"""Edge-partitioned graph parallelism: sharded forward must equal single-device."""

import jax
import numpy as np
import pytest


@pytest.mark.parametrize("num_shards", [2, 8])
def test_edge_partitioned_forward_matches(num_shards) -> None:
    if jax.device_count() < num_shards:
        pytest.skip("not enough devices")
    from deeprank2_tpu.parallel.edge_partition import edge_partition_scaling_report

    report = edge_partition_scaling_report(num_shards)
    assert report["max_abs_err"] < 1e-5


def test_partition_covers_all_edges() -> None:
    from deeprank2_tpu.ops.synthetic import synthetic_entries as _synthetic_entries
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.parallel.edge_partition import partition_graph_batch

    entries = _synthetic_entries(4, 32, 8, 2)
    batch, _ = collate_graphs(entries, pad_graphs=4)
    part = partition_graph_batch(batch, 4)

    total_real = int(np.asarray(batch.edge_mask).sum())
    assert int(np.asarray(part.edge_mask).sum()) == total_real
    # every local edge's destination belongs to its shard
    v_per = part.x.shape[1]
    for d in range(4):
        mask = np.asarray(part.edge_mask[d])
        rows = np.asarray(part.edge_row_local[d])[mask]
        assert (rows >= 0).all()
        assert (rows < v_per).all()


def test_hybrid_mesh() -> None:
    from deeprank2_tpu.parallel.cluster import hybrid_mesh, initialize

    initialize()  # no-op single process
    mesh = hybrid_mesh()
    assert mesh.axis_names == ("dp", "gp")
    assert mesh.devices.size == jax.device_count()

    mesh2 = hybrid_mesh(dp=2, gp=jax.device_count() // 2) if jax.device_count() >= 2 else hybrid_mesh()
    assert mesh2.devices.size == jax.device_count()


@pytest.mark.parametrize("num_shards", [2, 8])
def test_ring_forward_matches(num_shards) -> None:
    """ppermute ring halo exchange == single-device forward."""
    if jax.device_count() < num_shards:
        pytest.skip("not enough devices")
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.synthetic import synthetic_entries
    from deeprank2_tpu.parallel.dp import default_mesh
    from deeprank2_tpu.parallel.edge_partition import make_ring_ginet_forward, partition_graph_batch_ring

    model = GINet(8, 2, 2)
    params = model.init(jax.random.PRNGKey(0))
    entries = synthetic_entries(6, 32, 8, 2, seed=5)
    batch, _ = collate_graphs(entries, pad_graphs=6)
    reference = np.asarray(model.apply(params, batch))

    mesh = default_mesh("gp", devices=jax.devices()[:num_shards])
    part = partition_graph_batch_ring(batch, num_shards)
    forward = make_ring_ginet_forward(model, mesh=mesh)
    out = np.asarray(forward(params, part))
    assert np.abs(out - reference).max() < 1e-5


def test_ring_partition_covers_all_edges() -> None:
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.synthetic import synthetic_entries
    from deeprank2_tpu.parallel.edge_partition import partition_graph_batch_ring

    entries = synthetic_entries(4, 32, 8, 2)
    batch, _ = collate_graphs(entries, pad_graphs=4)
    part = partition_graph_batch_ring(batch, 4)
    assert int(np.asarray(part.edge_mask).sum()) == int(np.asarray(batch.edge_mask).sum())
