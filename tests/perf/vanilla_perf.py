"""Per-edge-feature model throughput: blocked one-hot-matmul path vs COO.

One atomic-resolution-sized graph (default 100k nodes, ~3.3M pairs at protein
density, 4.5 Å cutoff), VanillaNetwork full train step (fwd + bwd + Adam) —
the model family whose messages consume per-edge features and therefore
cannot ride the adjacency-SpMM paths (reference:
deeprank2/neuralnets/gnn/vanilla_gnn.py:10-41).

    python tests/perf/vanilla_perf.py [num_nodes] [--coo] [--bf16]

Timing follows bench.py: steps chained in a jitted ``lax.scan``, clock
stopped by a data-dependent ``float(loss)``, best of two windows.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.perf.blocksparse_perf import geometric_entry  # noqa: E402


def main() -> None:
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000
    use_coo = "--coo" in sys.argv
    bf16 = "--bf16" in sys.argv

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]

    if use_coo:
        from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetwork
        from deeprank2_tpu.ops.batch import collate_graphs

        batch, _ = collate_graphs([entry])
        model = VanillaNetwork(feat_dim, 2, edge_dim)
        label = "coo"
    else:
        from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import VanillaNetworkBlocked
        from deeprank2_tpu.ops.batch import collate_graphs_blocked

        batch, _ = collate_graphs_blocked([entry])
        st = batch.structure
        print(
            f"# {num_nodes} nodes, {real_edges} edges, {st.num_slabs} slabs, "
            f"slab fill {real_edges / st.row_local.shape[0]:.3f}",
            file=sys.stderr,
        )
        model = VanillaNetworkBlocked(feat_dim, 2, edge_dim, compute_dtype=jnp.bfloat16 if bf16 else None)
        label = "blocked" + ("_bf16" if bf16 else "")

    batch = jax.device_put(batch)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    steps_per_call = 20 if use_coo else 50

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

    calls = 2 if use_coo else 4
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, loss = train_chunk(carry, batch)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    edges_per_s = real_edges * steps_per_call * calls / best_dt
    print(
        json.dumps(
            {
                "path": label,
                "num_nodes": num_nodes,
                "real_edges": real_edges,
                "step_ms": round(best_dt / (steps_per_call * calls) * 1e3, 3),
                "edges_per_s": round(edges_per_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
