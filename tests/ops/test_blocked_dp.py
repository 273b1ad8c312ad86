"""Blocked-edge data parallelism parity on the virtual 8-device mesh.

`collate_graphs_blocked_sharded` + the shard_map DP step must agree with the
single-device blocked model to float tolerance — the same gate every other
parallel path passes (cf. tests/utils/test_blocksparse_partition.py). Closes
the round-2 finding that this path was exercised only by an isfinite check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetworkBlocked
from deeprank2_tpu.ops.batch import collate_graphs_blocked, collate_graphs_blocked_sharded
from deeprank2_tpu.ops.losses import CrossEntropyLoss
from deeprank2_tpu.ops.optim import Adam
from deeprank2_tpu.parallel.dp import default_mesh, make_dp_eval_step, make_dp_train_step


def _entries(num_graphs, feat_dim=11, edge_dim=4, seed=3):
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    entries = []
    for g in range(num_graphs):
        n = int(rng.integers(60, 240))
        pos = rng.uniform(0, 22, size=(n, 3))
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, feat_dim)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.normal(size=(len(pairs), edge_dim)).astype(np.float32),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "entry_name": f"be-{g}",
            }
        )
    return entries


def test_blocked_dp_matches_single_device() -> None:
    num_shards, per_shard = 4, 2
    entries = _entries(7)
    feat_dim, edge_dim = 11, 4
    model = VanillaNetworkBlocked(feat_dim, 2, edge_dim)
    params = model.init(jax.random.PRNGKey(0))
    loss_fn = CrossEntropyLoss()
    mesh = default_mesh(devices=jax.devices()[:num_shards])

    stacked, names = collate_graphs_blocked_sharded(entries, num_shards, per_shard)
    assert sorted(n for n in names if n) == sorted(e["entry_name"] for e in entries)

    def compute_loss(p, batch, rng, training):
        pred = model.apply(p, batch, training=training, rng=rng)
        return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask), pred

    # ---- eval parity: every shard's predictions match the single-device
    # blocked model on that shard's graphs --------------------------------
    eval_step = make_dp_eval_step(compute_loss, mesh=mesh)
    _, preds = eval_step(params, stacked)
    preds = np.asarray(preds)  # [D, G, C] (shard_map concatenates the pred[None] leading axes)
    by_name = {e["entry_name"]: e for e in entries}
    for s in range(num_shards):
        shard_names = [n for n in names[s * per_shard : (s + 1) * per_shard] if n]
        if not shard_names:
            continue
        solo, _ = collate_graphs_blocked([by_name[n] for n in shard_names], pad_graphs=per_shard)
        want = np.asarray(model.apply(params, solo, training=False))
        np.testing.assert_allclose(preds[s, : len(shard_names)], want[: len(shard_names)], rtol=1e-5, atol=1e-5)

    # ---- train-step parity: the DP update equals the pmean of per-shard
    # gradients applied by the same optimizer -----------------------------
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    train_step = make_dp_train_step(compute_loss, optimizer, mesh=mesh)
    rng = jax.random.PRNGKey(9)
    new_params, _, dp_loss, _, _ = train_step(params, opt_state, rng, stacked)

    # manual replication of the sharded computation on one device,
    # including the per-shard rng fold (parallel/dp.py:49-51)
    _, shard_base = jax.random.split(rng)
    grads_sum = None
    losses = []
    for s in range(num_shards):
        local = jax.tree.map(lambda a: a[s], stacked)  # noqa: B023
        shard_rng = jax.random.fold_in(shard_base, s)
        (loss_s, _), g = jax.value_and_grad(
            lambda p: compute_loss(p, local, shard_rng, True), has_aux=True  # noqa: B023
        )(params)
        losses.append(float(loss_s))
        grads_sum = g if grads_sum is None else jax.tree.map(jnp.add, grads_sum, g)
    grads_mean = jax.tree.map(lambda a: a / num_shards, grads_sum)
    want_params, _ = optimizer.step(params, grads_mean, opt_state)

    np.testing.assert_allclose(float(dp_loss), np.mean(losses), rtol=1e-6, atol=1e-6)
    flat_got = jax.tree_util.tree_leaves_with_path(new_params)
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want_params))
    for path, leaf in flat_got:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_want[path]), rtol=1e-4, atol=2e-6, err_msg=str(path)
        )
