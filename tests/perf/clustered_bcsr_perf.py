"""Clustered-model training throughput at atomic scale: block-sparse vs COO.

One 100k-node geometric graph with synthetic spatial two-depth clusters
(grid cells — MCL/Louvain cluster shapes without the host-side cost; the
aggregation work per edge is identical). Measures the full train step for
GINetClusteredBlockSparse / FoutNetBlockSparse / SGATBlockSparse and, with
``--coo``, the clustered COO twin as the baseline ratio (VERDICT round-2
gate: each fast path >= 10x COO on a 100k-node graph).

    python tests/perf/clustered_bcsr_perf.py [num_nodes] [--coo]
        [--profile DIR] [--only NAME] [--pin]

``--pin`` measures the per-component decomposition of the clustered GINet
step instead of the model sweep: the raw conv1 SpMM at TWO run-padding
geometries (kbatch 8 and 16 on the same graph — two equations in the
per-sub-batch overhead rate, so the DMA-issue/scalar rate is MEASURED,
not asserted), the slot-pool forward+backward kernels standalone, and the
slot member combine standalone; prints the component sum against the full
train step.

Protocol caveat, measured round 5: the raw ``v = spmm(v)`` scan's
sequential dependence + elementwise carry inflate the standalone rate to
~109 ns/sub-batch; the IN-MODEL rate from profiled train steps at the
same two geometries (jax.profiler per-op totals: K16 pair 1196 us over
922 us stream / 1440 subs; K8 pair 1100 us over 788 us stream / 2523
subs) solves to a consistent **60-62 ns/sub-batch** — use the in-model
number for rooflines, the standalone pair for regression tracking.

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


def _time_fn(fn, *args, steps=50, calls=3):
    """sol_perf protocol: scan-chained steps, data-dependent sync, best of 3."""
    import time

    out = fn(*args)
    float(out[1] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        float(out[1] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    return best / (steps * calls) * 1e6


def pin(num_nodes: int) -> None:
    """Measured per-component decomposition of the clustered GINet step."""
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops import block_sparse as bs
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse_clustered
    from deeprank2_tpu.ops.pallas_slotpool import slot_group_max
    from deeprank2_tpu.ops.pooling import member_max_pool

    steps = 50
    feat_dim, edge_dim = 38, 1
    entry = clustered_entry(num_nodes, feat_dim, edge_dim)
    batch, _ = collate_graphs_blocksparse_clustered([entry], slot8=True)
    batch = jax.device_put(batch)
    st = batch.structure
    vpad = st.padded_nodes
    results: dict = {"num_nodes": num_nodes}

    # (1) raw conv1-shaped SpMM at two run-padding geometries -> solve
    #     t = stream/BW + num_subs * rate for the per-sub overhead rate
    order = bs.locality_order(entry["pos"])
    inv = __import__("numpy").empty(len(order), "int64")
    inv[order] = __import__("numpy").arange(len(order))
    pairs = inv[__import__("numpy").asarray(entry["edge_index"], "int64")]
    points = {}
    for kb in (8, 16):
        st_kb = bs.build_blocksparse(pairs, vpad, kbatch=kb)
        v0 = jnp.ones((32, vpad), jnp.float32)

        @jax.jit
        def raw(v, st_arg):
            def one(v, _):
                return bs.bcsr_spmm_t(st_arg, v) * 0.125, ()

            v, _ = jax.lax.scan(one, v, None, length=steps)
            return v.sum()

        # structure passed as an ARGUMENT: a closure would bake the blocks
        # into the program as constants (~300 MB upload per compile)
        us = _time_fn(raw, v0, jax.device_put(st_kb), steps=steps)
        points[kb] = {
            "spmm_us": round(us, 1),
            "stream_us": round(st_kb.blocks_t.nbytes / 819e9 * 1e6, 1),
            "num_subs": st_kb.num_blocks // kb,
        }
    d_t = points[8]["spmm_us"] - points[16]["spmm_us"]
    d_stream = points[8]["stream_us"] - points[16]["stream_us"]
    d_subs = points[8]["num_subs"] - points[16]["num_subs"]
    rate_ns = (d_t - d_stream) / d_subs * 1e3
    results["spmm_geometries"] = points
    results["per_sub_overhead_ns"] = round(rate_ns, 1)

    # (2) slot-pool kernels standalone (bench activation shape [32, V])
    h = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (32, vpad), jnp.float32))
    mask = batch.node_mask.astype(jnp.float32)[None, :]
    h = h * mask

    @jax.jit
    def pool_fwd(h):
        def one(h, _):
            p = slot_group_max(h, mask)
            # cheap data dependence (a [F, V/8] slice write, ~2 us) so the
            # scan cannot hoist the pool; a full h*c pass would cost ~34 us
            return jax.lax.dynamic_update_slice(h, p, (0, 0)), ()

        h, _ = jax.lax.scan(one, h, None, length=steps)
        return h.sum()

    @jax.jit
    def pool_fwdbwd(h):
        def one(h, _):
            g = jax.grad(lambda x: (slot_group_max(x, mask) ** 2).sum())(h)
            return g, ()

        h, _ = jax.lax.scan(one, h, None, length=steps)
        return h.sum()

    fwd_us = _time_fn(pool_fwd, h, steps=steps)
    fwdbwd_us = _time_fn(pool_fwdbwd, h, steps=steps)
    results["slot_pool_fwd_us"] = round(fwd_us, 1)
    results["slot_pool_bwd_us"] = round(fwdbwd_us - fwd_us, 1)

    # (3) slot member combine standalone (the [V/8] -> [C] stage)
    p8 = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (vpad // 8, 32), jnp.float32))

    @jax.jit
    def combine(p):
        def one(p, _):
            c = member_max_pool(p, batch.members0s, batch.slot_cluster)
            return jax.lax.dynamic_update_slice(p, c, (0, 0)), ()

        p, _ = jax.lax.scan(one, p, None, length=steps)
        return p.sum()

    @jax.jit
    def combine_bwd(p):
        def one(p, _):
            g = jax.grad(lambda x: (member_max_pool(x, batch.members0s, batch.slot_cluster) ** 2).sum())(p)
            return g, ()

        p, _ = jax.lax.scan(one, p, None, length=steps)
        return p.sum()

    c_us = _time_fn(combine, p8, steps=steps)
    cb_us = _time_fn(combine_bwd, p8, steps=steps)
    results["combine_fwd_us"] = round(c_us, 1)
    results["combine_bwd_us"] = round(cb_us - c_us, 1)

    # the production conv1 SpMM (slot8 layout, ~+10 % blocks vs the raw
    # locality order above)
    v0 = jnp.ones((32, vpad), jnp.float32)

    @jax.jit
    def raw_slot8(v, st_arg):
        def one(v, _):
            return bs.bcsr_spmm_t(st_arg, v) * 0.125, ()

        v, _ = jax.lax.scan(one, v, None, length=steps)
        return v.sum()

    slot8_us = _time_fn(raw_slot8, v0, batch.structure, steps=steps)
    results["spmm_slot8_us"] = round(slot8_us, 1)
    results["spmm_slot8_stream_us"] = round(batch.structure.blocks_t.nbytes / 819e9 * 1e6, 1)

    # component sum vs the measured full step: the conv1 SpMM pair on the
    # production slot8 structure (= fwd + symmetric-VJP bwd, same kernel),
    # the pooled small SpMM pair (~25 us, profiled round 4), the pooling
    # kernels, and glue as the residual vs the model sweep's step time
    results["component_sum_us"] = round(2 * slot8_us + fwdbwd_us + cb_us + 25.0, 1)
    print(json.dumps(results))


def main() -> None:
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000
    if "--pin" in sys.argv:
        pin(num_nodes)
        return
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
