"""Decompose the dense GINet train step: where do the non-roofline us go?

Times (a) the raw 4-pass adjacency stream (the quantity the HBM bound prices),
(b) forward-only, (c) forward+backward, (d) the full train step — all with the
sol_perf protocol (scan-chained, data-dependent sync).

    python tests/perf/dense_decompose.py

Round-3 history: the residual above the 235 us bound was ~170 us of XLA
dot-emitter layout copies of the backward cotangents — every batched
cotangent has two matmul consumers with conflicting operand layouts, and
three formulation rewrites (symmetric VJP, transposed [G,C,N] tower, custom
weight-grad) all measured as no-ops because the emitter re-normalizes
batched operand order internally.

Round-4 CLOSURE: the batch dimension itself was removed. The model now runs
flat ([F, G*N] activations, 2-D XLA contractions) with the per-graph
aggregation in a graph-diagonal Pallas kernel (ops/diag_spmm.py: int8
adjacency stream, fused relu/mask epilogues, per-graph pooling summed
in-kernel) — 284 us = 82.9 % of the 4-pass bound at the 500-step-chunk
protocol, vs 363 us for the best batched XLA formulation. The remaining gap
is ~27 us/step of host chunk dispatch over this box's tunnel plus ~15 us of
XLA glue around the four kernel calls (device trace shows ~250 us device
time, zero idle inside a chunk).

Note for future work: layer 1's aggregation commutes with its weight apply
(relu(m . (W^T X) A) == relu(m . W^T (X A)) per graph), and X A is constant
per batch — precomputing it would drop layer 1's two adjacency passes
entirely. Left unimplemented: it only pays when a collated batch is reused
across many steps (true for this bench and for multi-epoch training with a
device-batch cache, false for the Trainer's per-epoch re-collation), and
pricing the bound around it would redefine the step boundary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def _time_chunk(fn, carry, batch, steps=50, calls=4):
    import jax

    fn = jax.jit(fn)
    carry, out = fn(carry, batch)
    float(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, out = fn(carry, batch)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best / (steps * calls) * 1e6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    steps = 50
    entries = synthetic_entries(512, 160, 38, 6, seed=7)
    batch, _ = collate_graphs_dense(entries, pad_graphs=512, pad_nodes=160)
    batch = jax.device_put(batch)
    model = GINetDense(38, 2, 6)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    # (a) raw adjacency stream: 4 bare adj@v matmuls per step (the bound's 4
    # passes), v [G, N, 64] — measures the achievable streaming rate alone
    v0 = jnp.ones((512, 160, 64), jnp.bfloat16)

    def raw(carry, batch):
        def one(v, _):
            for _ in range(4):
                v = jax.lax.dot_general(
                    batch.adj, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.bfloat16
                )
                v = v * (1.0 / 64.0)  # keep values bounded
            return v, ()

        v, _ = jax.lax.scan(one, carry, None, length=steps)
        return v, v.astype(jnp.float32).sum()

    us_raw = _time_chunk(raw, v0, batch, steps)

    def fwd_only(carry, batch):
        def one(c, _):
            rng, = c
            nrng, srng = jax.random.split(rng)
            pred = model.apply(params, batch, training=True, rng=srng)
            return (nrng,), loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        c, losses = jax.lax.scan(one, carry, None, length=steps)
        return c, losses[-1]

    us_fwd = _time_chunk(fwd_only, (jax.random.PRNGKey(1),), batch, steps)

    def fwd_bwd(carry, batch):
        def one(c, _):
            p, rng = c
            nrng, srng = jax.random.split(rng)

            def compute(p):
                pred = model.apply(p, batch, training=True, rng=srng)
                return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

            loss, grads = jax.value_and_grad(compute)(p)
            # fold grads into params so the scan carries real data dependencies
            p = jax.tree.map(lambda a, g: a - 0.0 * g, p, grads)
            return (p, nrng), loss

        c, losses = jax.lax.scan(one, carry, None, length=steps)
        return c, losses[-1]

    us_fwd_bwd = _time_chunk(fwd_bwd, (params, jax.random.PRNGKey(1)), batch, steps)

    def full(carry, batch):
        def one(c, _):
            p, s, rng = c
            nrng, srng = jax.random.split(rng)

            def compute(p):
                pred = model.apply(p, batch, training=True, rng=srng)
                return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

            loss, grads = jax.value_and_grad(compute)(p)
            p, s = optimizer.step(p, grads, s)
            return (p, s, nrng), loss

        c, losses = jax.lax.scan(one, carry, None, length=steps)
        return c, losses[-1]

    us_full = _time_chunk(full, (params, opt_state, jax.random.PRNGKey(1)), batch, steps)

    print(
        json.dumps(
            {
                "raw_4pass_adj_us": round(us_raw, 1),
                "fwd_only_us": round(us_fwd, 1),
                "fwd_bwd_us": round(us_fwd_bwd, 1),
                "full_step_us": round(us_full, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
