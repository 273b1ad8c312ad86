"""Clustered block-sparse data parallelism parity on the virtual mesh.

Same gate as tests/ops/test_blocked_dp.py: sharded collation + the shard_map
DP step must match the single-device clustered models to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprank2_tpu.neuralnets.gnn.clustered_blocksparse import (
    FoutNetBlockSparse,
    GINetClusteredBlockSparse,
    SGATBlockSparse,
)
from deeprank2_tpu.ops.batch import (
    collate_graphs_blocksparse_clustered,
    collate_graphs_blocksparse_clustered_sharded,
)
from deeprank2_tpu.ops.losses import CrossEntropyLoss
from deeprank2_tpu.parallel.dp import default_mesh, make_dp_eval_step

import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "utils"))
from test_clustered_blocksparse import _clustered_entries  # noqa: E402


@pytest.mark.parametrize(
    ("cls", "weighted"),
    [(GINetClusteredBlockSparse, False), (FoutNetBlockSparse, False), (SGATBlockSparse, True)],
)
def test_clustered_dp_matches_single_device(cls, weighted) -> None:
    num_shards, per_shard = 4, 2
    entries = _clustered_entries(num_graphs=7, sizes=(180, 260, 140, 200, 90, 160, 230))
    model = cls(13, 2, 1)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = CrossEntropyLoss()
    mesh = default_mesh(devices=jax.devices()[:num_shards])

    stacked, names = collate_graphs_blocksparse_clustered_sharded(
        entries, num_shards, per_shard, with_edge_weights=weighted, weight_dtype=np.float32
    )
    assert sorted(n for n in names if n) == sorted(e["entry_name"] for e in entries)

    def compute_loss(p, batch, rng, training):
        pred = model.apply(p, batch, training=training, rng=rng)
        return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask), pred

    eval_step = make_dp_eval_step(compute_loss, mesh=mesh)
    _, preds = eval_step(params, stacked)
    preds = np.asarray(preds)  # [D, G, C]
    by_name = {e["entry_name"]: e for e in entries}
    checked = 0
    for s in range(num_shards):
        shard_names = [n for n in names[s * per_shard : (s + 1) * per_shard] if n]
        if not shard_names:
            continue
        solo, _ = collate_graphs_blocksparse_clustered(
            [by_name[n] for n in shard_names], pad_graphs=per_shard, with_edge_weights=weighted, weight_dtype=np.float32
        )
        want = np.asarray(model.apply(params, solo, training=False))
        np.testing.assert_allclose(preds[s, : len(shard_names)], want[: len(shard_names)], rtol=5e-4, atol=5e-4)
        checked += len(shard_names)
    assert checked == len(entries)


def test_diag_mixed_sharded_matches_single_device() -> None:
    """The MIXED region layout through the DP-sharded diag collate: one
    layout/cap decision across shards, per-shard predictions equal the
    single-device model on the same entries."""
    from scipy.spatial import cKDTree

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDiag
    from deeprank2_tpu.ops.batch import collate_graphs_diag_clustered, collate_graphs_diag_clustered_sharded

    rng = np.random.default_rng(5)
    entries = []
    for g in range(6):
        n = 90 + 10 * g
        pos = rng.uniform(0, 16, (n, 3)).astype(np.float32)
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        cell = np.floor(pos / 3.2).astype(np.int64)  # tiny clusters -> mixed
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
                "entry_name": f"dm-{g}",
            }
        )

    num_shards, per_shard = 4, 2
    model = GINetClusteredDiag(13, 2, 1)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = CrossEntropyLoss()
    mesh = default_mesh(devices=jax.devices()[:num_shards])

    stacked, names = collate_graphs_diag_clustered_sharded(entries, num_shards, per_shard)
    assert stacked.region_caps  # mixed engaged, one decision across shards

    def compute_loss(p, batch, rng, training):
        pred = model.apply(p, batch, training=training, rng=rng)
        return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask), pred

    eval_step = make_dp_eval_step(compute_loss, mesh=mesh)
    _, preds = eval_step(params, stacked)
    preds = np.asarray(preds)
    by_name = {e["entry_name"]: e for e in entries}
    checked = 0
    for s in range(num_shards):
        shard_names = [n for n in names[s * per_shard : (s + 1) * per_shard] if n]
        if not shard_names:
            continue
        solo, _ = collate_graphs_diag_clustered([by_name[n] for n in shard_names], pad_graphs=per_shard)
        want = np.asarray(model.apply(params, solo, training=False))
        np.testing.assert_allclose(preds[s, : len(shard_names)], want[: len(shard_names)], rtol=5e-4, atol=5e-4)
        checked += len(shard_names)
    assert checked == len(entries)
