"""One-variant-per-process timing harness for the dense tower and BCSR paths.

    python tests/perf/variant_perf.py <variant>

Dense variants (512 graphs x 160 nodes, full train step):
    dense_xla_f32 | dense_xla_bf16 | dense_pallas_f32 | dense_pallas_bf16
BCSR variants (100k-node atomic graph, full train step):
    bcsr_f32_highest | bcsr_f32_default | bcsr_bf16
BCSR raw SpMM (fwd only, F=64):
    spmm_f32_highest | spmm_bf16

Fresh process per variant (long-lived processes on this box can degrade to a
slow dispatch mode); timing protocol follows bench.py (scan-chained steps,
clock stopped by a data-dependent value transfer, best of two windows).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def _time_train(model, batch, real_edges, steps_per_call=50, calls=8):
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    batch = jax.device_put(batch)
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
    return {"step_us": round(step_s * 1e6, 1), "edges_per_s": round(real_edges / step_s, 1)}


def dense(variant: str) -> dict:
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense, set_dense_tower_backend
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    feat_dim, edge_dim = 38, 6
    entries = synthetic_entries(512, 160, feat_dim, edge_dim, seed=7)
    batch, _ = collate_graphs_dense(entries, pad_graphs=512, pad_nodes=160)
    real_edges = int(sum(2 * e["edge_index"].shape[0] for e in entries))
    backend, dtype = variant.split("_")[1:]
    set_dense_tower_backend(backend)
    model = GINetDense(feat_dim, 2, edge_dim, compute_dtype=jnp.bfloat16 if dtype == "bf16" else None)
    return _time_train(model, batch, real_edges)


def bcsr(variant: str) -> dict:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
    from tests.perf.blocksparse_perf import geometric_entry

    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(100_000, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]
    batch, _ = collate_graphs_blocksparse([entry])
    kw = {}
    if variant.endswith("bf16"):
        kw = {"compute_dtype": jnp.bfloat16, "precision": jax.lax.Precision.DEFAULT}
    elif variant.endswith("default"):
        kw = {"precision": jax.lax.Precision.DEFAULT}
    model = GINetBlockSparse(feat_dim, 2, edge_dim, **kw)
    st = batch.structure
    out = _time_train(model, batch, real_edges, steps_per_call=50, calls=4)
    out["num_blocks"] = st.num_blocks
    out["block_bytes"] = int(st.blocks_t.size)
    return out


def spmm(variant: str) -> dict:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.block_sparse import bcsr_spmm, build_blocksparse, locality_order
    from tests.perf.blocksparse_perf import geometric_entry

    entry = geometric_entry(100_000, 38, 6)
    order = locality_order(entry["pos"])
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order))
    pairs = inv[entry["edge_index"]]
    st = build_blocksparse(pairs, 100_000)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(st.padded_nodes, 64)).astype(np.float32))
    kw = {"compute_dtype": jnp.bfloat16, "precision": jax.lax.Precision.DEFAULT} if variant.endswith("bf16") else {}

    @jax.jit
    def run(x):
        def body(h, _):
            return bcsr_spmm(st, h, **kw), None

        h, _ = jax.lax.scan(body, x, None, length=20)
        return h

    out = run(x)
    float(out[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    spmm_s = best / 20
    real_edges = 2 * entry["edge_index"].shape[0]
    return {
        "spmm_us": round(spmm_s * 1e6, 1),
        "edges_per_s": round(real_edges / spmm_s, 1),
        "num_blocks": st.num_blocks,
        "block_bytes": int(st.blocks_t.size),
    }


def tower(variant: str) -> dict:
    """Isolated tower cost: fwd (or fwd+w-grads) of the fused two-layer pass."""
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops import pallas_ginet
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(512, 160, 38, 6, seed=7)
    batch, _ = collate_graphs_dense(entries, pad_graphs=512, pad_nodes=160)
    real_edges = int(sum(2 * e["edge_index"].shape[0] for e in entries))
    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.normal(size=(38, 32)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32) * 0.1)
    x, adj = jax.device_put(batch.x), jax.device_put(batch.adj)
    mask = jax.device_put(batch.node_mask.astype(jnp.float32))

    _, backend, dtype, mode = variant.split("_")
    cd = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    if backend == "pallas":
        f = lambda w1, w2, x, adj, mask: pallas_ginet.ginet_tower_pooled(w1, w2, x, adj, mask, compute_dtype=cd)
    else:
        f = lambda w1, w2, x, adj, mask: pallas_ginet.ginet_tower_pooled_reference(w1, w2, x, adj, mask)

    steps = 50

    @jax.jit
    def run(carry, x, adj, mask):
        def body(carry, _):
            w1, w2 = carry
            if mode == "grad":
                loss, (g1, g2) = jax.value_and_grad(lambda w1, w2: (f(w1, w2, x, adj, mask) ** 2).sum(), argnums=(0, 1))(w1, w2)
                return (w1 - 1e-9 * g1, w2 - 1e-9 * g2), loss
            out = f(w1, w2, x, adj, mask)
            s = out.sum()
            return (w1 - 1e-20 * s, w2), s

        carry, vals = jax.lax.scan(body, carry, None, length=steps)
        return carry, vals[-1]

    carry = (w1, w2)
    carry, v = run(carry, x, adj, mask)
    float(v)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            carry, v = run(carry, x, adj, mask)
        float(v)
        best = min(best, time.perf_counter() - t0)
    call_s = best / (steps * 4)
    return {"call_us": round(call_s * 1e6, 1), "edges_per_s": round(real_edges / call_s, 1)}


def main() -> None:
    variant = sys.argv[1]
    if variant.startswith("dense"):
        res = dense(variant)
    elif variant.startswith("bcsr"):
        res = bcsr(variant)
    elif variant.startswith("tower"):
        res = tower(variant)
    else:
        res = spmm(variant)
    res["variant"] = variant
    print(json.dumps(res))


if __name__ == "__main__":
    main()
