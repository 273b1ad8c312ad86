"""One-off sweep: dense GINet train-step time across {backend} x {compute_dtype}.

    python tests/perf/dense_sweep.py

Timing protocol follows sol_perf.py (scan-chained steps, data-dependent sync).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def measure(compute_dtype, backend, num_graphs=512, nodes=160, steps_per_call=50, calls=4):
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn import ginet_dense
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    ginet_dense.set_dense_tower_backend(backend)
    feat_dim, edge_dim = 38, 6
    entries = synthetic_entries(num_graphs, nodes, feat_dim, edge_dim, seed=7)
    batch, _ = collate_graphs_dense(entries, pad_graphs=num_graphs, pad_nodes=nodes)
    real_edges = int(sum(2 * e["edge_index"].shape[0] for e in entries))
    batch = jax.device_put(batch)

    model = GINetDense(feat_dim, 2, edge_dim, compute_dtype=compute_dtype)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    @jax.jit
    def train_chunk(carry, batch):
        def train_step(carry, _):
            params, opt_state, rng = carry
            next_rng, step_rng = jax.random.split(rng)

            def compute(p):
                pred = model.apply(p, batch, training=True, rng=step_rng)
                return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

            loss, grads = jax.value_and_grad(compute)(params)
            params, opt_state = optimizer.step(params, grads, opt_state)
            return (params, opt_state, next_rng), loss

        carry, losses = jax.lax.scan(train_step, carry, None, length=steps_per_call)
        return carry, losses[-1]

    carry = (params, opt_state, jax.random.PRNGKey(1))
    carry, loss = train_chunk(carry, batch)
    float(loss)

    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, loss = train_chunk(carry, batch)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    step_s = best_dt / (steps_per_call * calls)
    return {"step_us": round(step_s * 1e6, 1), "edges_per_s": round(real_edges / step_s / 1e9, 3)}


def main():
    import jax.numpy as jnp

    for backend in ("xla", "pallas"):
        for name, cd in (("f32", None), ("bf16", jnp.bfloat16)):
            r = measure(cd, backend)
            print(json.dumps({"backend": backend, "compute": name, **r}), flush=True)


if __name__ == "__main__":
    main()
