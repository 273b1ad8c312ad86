"""Clustered GINet at PPI scale: graph-diagonal fast path vs the batched
dense formulation.

512 graphs x 160 nodes (the dense bench shape) with spatial ~6-node
clusters (MCL community shapes). The batched ``[G, N, F]`` clustered dense
model spends ~7.4 ms of its 10.4 ms step in ``G*N``-row XLA scatters
(profiled round 4); ``GINetClusteredDiag`` replaces them with the slot8
discipline: cluster-major 8-lane slots, graph-diagonal Pallas aggregation
on both the full and the collate-precomputed pooled adjacency, and the
slot-pool kernel for depth-0 community pooling.

    python tests/perf/diag_clustered_perf.py [--batched] [--fout | --sgat]

Timing follows bench.py (scan-chained, data-dependent sync, best of three).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def ppi_clustered_entries(num_graphs: int = 512, nodes: int = 160, feat_dim: int = 38, cell: float = 10.0, seed: int = 0) -> list[dict]:
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    entries = []
    for g in range(num_graphs):
        pos = rng.uniform(0, 24, (nodes, 3)).astype(np.float32)
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        cell0 = np.floor(pos / cell).astype(np.int64)
        _, c0 = np.unique(cell0[:, 0] * 10000 + cell0[:, 1] * 100 + cell0[:, 2], return_inverse=True)
        n_c0 = int(c0.max()) + 1
        psum = np.zeros((n_c0, 3))
        np.add.at(psum, c0, pos)
        pmean = psum / np.bincount(c0, minlength=n_c0)[:, None]
        cell1 = np.floor(pmean / (2 * cell)).astype(np.int64)
        _, c1 = np.unique(cell1[:, 0] * 10000 + cell1[:, 1] * 100 + cell1[:, 2], return_inverse=True)
        entries.append(
            {
                "x": rng.normal(size=(nodes, feat_dim)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.uniform(0.5, 3.0, size=(len(pairs), 1)).astype(np.float32),
                "pos": pos,
                "y": float(g % 2),
                "cluster0": c0.astype(np.int32),
                "cluster1": c1.astype(np.int32),
                "entry_name": f"g{g}",
            }
        )
    return entries


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    batched = "--batched" in sys.argv
    feat_dim = 38
    cell = float(sys.argv[sys.argv.index("--cell") + 1]) if "--cell" in sys.argv else 10.0
    entries = ppi_clustered_entries(feat_dim=feat_dim, cell=cell)
    sizes = [e["x"].shape[0] / (int(e["cluster0"].max()) + 1) for e in entries]
    print(f"# cell={cell} avg cluster size {sum(sizes)/len(sizes):.2f}", file=sys.stderr, flush=True)
    real_edges = 2 * sum(e["edge_index"].shape[0] for e in entries)

    fout = "--fout" in sys.argv
    sgat = "--sgat" in sys.argv
    label = "fout" if fout else "sgat" if sgat else "ginet"
    if batched:
        from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNetDense
        from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDense
        from deeprank2_tpu.neuralnets.gnn.sgat import SGATDense
        from deeprank2_tpu.ops.batch import collate_graphs_dense

        batch, _ = collate_graphs_dense(entries, with_clusters=True, with_edge_weights=sgat, with_diag_operands=False)
        cls = FoutNetDense if fout else SGATDense if sgat else GINetClusteredDense
        model = cls(feat_dim, 2, 1)
        name, steps, calls = label + "_clustered_dense_batched", 100, 2
    else:
        from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNetDiag
        from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDiag
        from deeprank2_tpu.neuralnets.gnn.sgat import SGATDiag
        from deeprank2_tpu.ops.batch import collate_graphs_diag_clustered

        msn = int(sys.argv[sys.argv.index("--minslot") + 1]) if "--minslot" in sys.argv else None
        batch, _ = collate_graphs_diag_clustered(entries, with_edge_weights=sgat, min_slot_nodes=msn)
        print(f"# n_cap={batch.adj_i8.shape[1]} region_caps={batch.region_caps}", file=sys.stderr, flush=True)
        cls = FoutNetDiag if fout else SGATDiag if sgat else GINetClusteredDiag
        model = cls(feat_dim, 2, 1)
        name, steps, calls = label + "_clustered_diag", 250, 2

    batch_d = jax.device_put(batch)
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

        carry, losses = jax.lax.scan(train_step, carry, None, length=steps)
        return carry, losses[-1]

    carry = (params, opt_state, jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    carry, loss = train_chunk(carry, batch_d)
    float(loss)
    print(f"# {name} compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, loss = train_chunk(carry, batch_d)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    step_s = best / (steps * calls)
    device = jax.devices()[0]
    print(
        json.dumps(
            {
                "device_kind": getattr(device, "device_kind", str(device)),
                "real_edges": real_edges,
                name: {"step_ms": round(step_s * 1e3, 3), "edges_per_s": round(real_edges / step_s, 1)},
            }
        )
    )


if __name__ == "__main__":
    main()
