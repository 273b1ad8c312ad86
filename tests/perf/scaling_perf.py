"""Scaling-efficiency harness: edges/s of the dense DP train step vs shard count.

The BASELINE north-star metric is edges/s scaling efficiency across chips
(>= 80 % target). On this box only one real TPU chip is reachable, so run the
harness on the virtual CPU mesh for shape/collective validation:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python tests/perf/scaling_perf.py

On a real multi-chip slice it measures the true numbers unchanged.

Timing is honest for remote-tunnel devices: steps chained in a jitted scan,
clock stopped by a data-dependent value transfer.
"""

from __future__ import annotations

import time


def dp_scaling_report(shard_counts=(1, 2, 4, 8), graphs_per_shard: int = 64, steps_per_call: int = 10, calls: int = 3) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense_sharded
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.ops.synthetic import synthetic_entries
    from deeprank2_tpu.parallel.dp import default_mesh, make_dp_train_step

    feat_dim, edge_dim = 38, 6
    model = GINetDense(feat_dim, 2, edge_dim)
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    loss_fn = CrossEntropyLoss()

    def compute_loss(params, batch, rng, training):
        pred = model.apply(params, batch, training=training, rng=rng)
        return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask), pred

    reports = []
    for num_shards in shard_counts:
        if num_shards > jax.device_count():
            continue
        # weak scaling: constant work per shard
        entries = synthetic_entries(graphs_per_shard * num_shards, 160, feat_dim, edge_dim, seed=7)
        real_edges = int(sum(2 * e["edge_index"].shape[0] for e in entries))
        batch, _ = collate_graphs_dense_sharded(entries, num_shards, graphs_per_shard, pad_nodes=160)
        batch = jax.device_put(batch)

        mesh = default_mesh(devices=jax.devices()[:num_shards])
        step = make_dp_train_step(compute_loss, optimizer, mesh=mesh)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(1)

        params, opt_state, loss, _pred, rng = step(params, opt_state, rng, batch)
        float(loss)  # force compile + completion
        t0 = time.perf_counter()
        for _ in range(steps_per_call * calls):
            params, opt_state, loss, _pred, rng = step(params, opt_state, rng, batch)
        float(loss)
        dt = time.perf_counter() - t0

        edges_per_s = real_edges * steps_per_call * calls / dt
        reports.append({"shards": num_shards, "edges_per_s": edges_per_s, "graphs": graphs_per_shard * num_shards})

    base = reports[0]["edges_per_s"] if reports else 1.0
    for r in reports:
        # weak scaling: ideal throughput grows linearly with shards
        r["efficiency"] = r["edges_per_s"] / (base * r["shards"])
    return reports


if __name__ == "__main__":
    import os

    import jax

    if os.environ.get("_SCALING_PERF_CPU") == "1":
        # child: pin the CPU backend before any device query (the
        # JAX_PLATFORMS env var does not override this box's TPU plugin;
        # jax.config.update does — same approach as tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    elif jax.device_count() < 8:
        # single-chip box: re-exec onto an 8-device virtual CPU mesh
        import subprocess
        import sys

        env = dict(os.environ, _SCALING_PERF_CPU="1", XLA_FLAGS=os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")
        raise SystemExit(subprocess.call([sys.executable, __file__], env=env))

    if os.environ.get("_SCALING_PERF_CPU") == "1":
        print(
            "# virtual 8-device CPU mesh (2 physical cores): validates the "
            "sharded collation + collectives; efficiency numbers reflect core "
            "oversubscription, not ICI scaling — run on a real slice for those"
        )
    for r in dp_scaling_report():
        print(
            f"shards={r['shards']:2d} graphs={r['graphs']:4d} "
            f"edges/s={r['edges_per_s']:.3e} efficiency={r['efficiency']:.2f}"
        )
