"""Large-graph GINet training throughput: BCSR block-sparse vs COO path.

One atomic-resolution-sized graph (default 100k nodes, ~3.3M edges at
protein density with a 4.5 Å cutoff — far beyond the dense ``[G,N,N]``
layout's reach), full train step (fwd + bwd + Adam).

    python tests/perf/blocksparse_perf.py [num_nodes] [--coo]

Timing follows bench.py: steps chained in a jitted ``lax.scan``, clock
stopped by a data-dependent ``float(loss)``, best of two windows.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# repo-root import bootstrap (NOT via the PYTHONPATH env var, which breaks
# the axon TPU plugin's subprocess discovery on this box)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def geometric_entry(n: int, feat_dim: int = 38, edge_dim: int = 6, seed: int = 0) -> dict:
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    side = (n / 0.09) ** (1 / 3)  # ~protein atom density
    pos = rng.uniform(0, side, size=(n, 3))
    pairs = cKDTree(pos).query_pairs(4.5, output_type="ndarray")
    return {
        "x": rng.normal(size=(n, feat_dim)).astype(np.float32),
        "edge_index": pairs.astype(np.int64),
        "edge_attr": rng.normal(size=(len(pairs), edge_dim)).astype(np.float32),
        "pos": pos.astype(np.float32),
        "y": 1.0,
        "entry_name": "slab",
    }


def main() -> None:
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000
    use_coo = "--coo" in sys.argv

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]

    if use_coo:
        from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet as Model
        from deeprank2_tpu.ops.batch import collate_graphs

        batch, _ = collate_graphs([entry])
        label = "coo"
    else:
        from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse as Model
        from deeprank2_tpu.ops.batch import collate_graphs_blocksparse

        batch, _ = collate_graphs_blocksparse([entry])
        st = batch.structure
        fill = real_edges / (st.num_blocks * st.block * st.block)
        print(
            f"# {num_nodes} nodes, {real_edges} edges, {st.num_tiles} tiles, "
            f"{st.num_blocks} blocks, fill {fill:.3f}",
            file=sys.stderr,
        )
        label = "blocksparse"

    batch = jax.device_put(batch)
    model = Model(feat_dim, 2, edge_dim)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    # this box's TPU tunnel adds ~27 ms fixed latency per dispatched call;
    # chain enough steps per call that the recorded number is device time
    steps_per_call = 50

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

    calls = 4
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
