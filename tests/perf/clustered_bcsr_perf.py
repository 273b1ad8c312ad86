"""Clustered-model training throughput at atomic scale: block-sparse vs COO.

One 100k-node geometric graph with synthetic spatial two-depth clusters
(grid cells — MCL/Louvain cluster shapes without the host-side cost; the
aggregation work per edge is identical). Measures the full train step for
GINetClusteredBlockSparse / FoutNetBlockSparse / SGATBlockSparse and, with
``--coo``, the clustered COO twin as the baseline ratio (VERDICT round-2
gate: each fast path >= 10x COO on a 100k-node graph).

    python tests/perf/clustered_bcsr_perf.py [num_nodes] [--coo]
        [--profile DIR] [--only NAME]

Timing follows bench.py (scan-chained, data-dependent sync, best of two).
``--profile DIR`` wraps one timed window per model in ``jax.profiler.trace``
(summarize with ``python tests/perf/parse_trace.py DIR 150``); ``--only``
filters to models whose key contains NAME.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.perf.blocksparse_perf import geometric_entry  # noqa: E402


def clustered_entry(n: int, feat_dim: int = 38, edge_dim: int = 1, seed: int = 0) -> dict:
    entry = geometric_entry(n, feat_dim, edge_dim, seed)
    pos = entry["pos"]
    cell0 = np.floor(pos / 8.0).astype(np.int64)
    _, c0 = np.unique(cell0[:, 0] * 1_000_000 + cell0[:, 1] * 1000 + cell0[:, 2], return_inverse=True)
    n_c0 = int(c0.max()) + 1
    psum = np.zeros((n_c0, 3))
    np.add.at(psum, c0, pos)
    pmean = psum / np.bincount(c0, minlength=n_c0)[:, None]
    cell1 = np.floor(pmean / 16.0).astype(np.int64)
    _, c1 = np.unique(cell1[:, 0] * 1_000_000 + cell1[:, 1] * 1000 + cell1[:, 2], return_inverse=True)
    entry["cluster0"] = c0.astype(np.int32)
    entry["cluster1"] = c1.astype(np.int32)
    # scalar positive edge weights for the sGAT path
    entry["edge_attr"] = np.abs(entry["edge_attr"]) + 0.1
    return entry


def main() -> None:
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000
    use_coo = "--coo" in sys.argv
    profile_dir = sys.argv[sys.argv.index("--profile") + 1] if "--profile" in sys.argv else None
    only = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else None

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat_dim, edge_dim = 38, 1
    entry = clustered_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]

    if use_coo:
        from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet
        from deeprank2_tpu.neuralnets.gnn.ginet import GINet
        from deeprank2_tpu.neuralnets.gnn.sgat import SGAT
        from deeprank2_tpu.ops.batch import collate_graphs

        batch, _ = collate_graphs([entry])
        models = {"ginet_clustered_coo": GINet, "foutnet_coo": FoutNet, "sgat_coo": SGAT}
        steps_per_call, calls = 2, 2
    else:
        from deeprank2_tpu.neuralnets.gnn.clustered_blocksparse import (
            FoutNetBlockSparse,
            GINetClusteredBlockSparse,
            SGATBlockSparse,
        )
        from deeprank2_tpu.ops.batch import collate_graphs_blocksparse_clustered

        models = {
            "ginet_clustered_bcsr": GINetClusteredBlockSparse,
            "foutnet_bcsr": FoutNetBlockSparse,
            "sgat_bcsr": SGATBlockSparse,
        }
        # 250-step chunks: at 50 steps/call the tunnel's host dispatch adds
        # ~25 us/step against a ~1.6 ms device step (the dense path's
        # round-4 protocol lesson, ROADMAP)
        steps_per_call, calls = 250, 2

    loss_fn = CrossEntropyLoss()
    results = {}
    for name, cls in models.items():
        if only and only not in name:
            continue
        if not use_coo:
            weighted = getattr(cls, "clustered_blocksparse_edge_weights", False)
            slot8 = getattr(cls, "clustered_blocksparse_slot8", False) and "--noslot8" not in sys.argv
            batch, _ = collate_graphs_blocksparse_clustered([entry], with_edge_weights=weighted, slot8=slot8)
        batch_d = jax.device_put(batch)
        model = cls(feat_dim, 2, edge_dim)
        params = model.init(jax.random.PRNGKey(0))
        optimizer = Adam(lr=1e-3, weight_decay=1e-5)
        opt_state = optimizer.init(params)

        @jax.jit
        def train_chunk(carry, batch, model=model, optimizer=optimizer):
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
        t0 = time.perf_counter()
        carry, loss = train_chunk(carry, batch_d)
        float(loss)
        print(f"# {name} compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

        best_dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(calls):
                carry, loss = train_chunk(carry, batch_d)
            float(loss)
            best_dt = min(best_dt, time.perf_counter() - t0)
        if profile_dir:
            with jax.profiler.trace(profile_dir):
                for _ in range(calls):
                    carry, loss = train_chunk(carry, batch_d)
                float(loss)
        step_s = best_dt / (steps_per_call * calls)
        results[name] = {
            "step_ms": round(step_s * 1e3, 3),
            "edges_per_s": round(real_edges / step_s, 1),
        }
        if not use_coo:
            # adjacency-stream roofline: the full + pooled block streams,
            # read twice per step (fwd + symmetric-VJP bwd). GINet/FoutNet
            # blocks are int8 0/1; sGAT's WEIGHTED adjacency must carry the
            # edge scalar per cell, so its blocks are bf16 — twice the
            # bytes, which is the whole of its throughput gap vs GINet
            # (round-4 decomposition: its conv1 SpMM pair measures ~91 % of
            # this bound; per-block int8 quantization would halve it but
            # breaks the 1e-3 parity gate at the distance-weight dynamic
            # range).
            adj_bytes = 2 * (batch.structure.blocks_t.nbytes + batch.structure_p.blocks_t.nbytes)
            bound_s = adj_bytes / 819e9
            results[name]["adj_stream_bound_ms"] = round(bound_s * 1e3, 3)
            results[name]["pct_of_adj_stream_bound"] = round(100.0 * bound_s / step_s, 1)

    device = jax.devices()[0]
    print(
        json.dumps(
            {
                "device_kind": getattr(device, "device_kind", str(device)),
                "num_nodes": num_nodes,
                "real_edges": real_edges,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
