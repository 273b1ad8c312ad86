"""Decompose the BCSR GINet train step: where do the non-roofline ms go?

Times (a) the raw fw=32 SpMM, (b) the raw fw=64 SpMM, (c) forward-only,
(d) the full train step — sol_perf protocol (scan-chained, data-dependent
sync). Each raw SpMM is also priced against its own share of the HBM bound
so the kernel's streaming efficiency separates from the XLA glue around it.

Kernel geometry is sweepable without editing code:

    DR2_BCSR_KBATCH=8 DR2_BCSR_SUPER=8 python tests/perf/bcsr_decompose.py [num_nodes]
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
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.ops import block_sparse as bs
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from tests.perf.bcsr_sol import bcsr_bound_bytes
    from tests.perf.blocksparse_perf import geometric_entry
    from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS

    steps = 50
    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]
    batch, _ = collate_graphs_blocksparse([entry])
    batch = jax.device_put(batch)
    st = batch.structure
    print(
        f"# kbatch={bs.KBATCH} super={bs.SUPER} chunk_tiles={bs.CHUNK_TILES} "
        f"blocks={st.num_blocks} grid_steps_per_spmm={st.num_blocks // (bs.KBATCH * bs.SUPER)}",
        file=sys.stderr,
        flush=True,
    )

    model = GINetBlockSparse(feat_dim, 2, edge_dim)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)

    def one_spmm_bound_us(fw: int) -> float:
        b = bcsr_bound_bytes(st, (fw,))
        return b["bound_bytes"] / 2 / (peak * 1e9) * 1e6  # /2: bound prices fwd+VJP

    results = {}
    for fw in (32, 64):
        v0 = jnp.ones((fw, st.padded_nodes), jnp.float32)

        def raw(carry, batch, fw=fw):
            def one(v, _):
                v = bs.bcsr_spmm_t(batch.structure, v, precision=jax.lax.Precision.HIGHEST)
                return v * (1.0 / 8.0), ()

            v, _ = jax.lax.scan(one, carry, None, length=steps)
            return v, v.sum()

        us = _time_chunk(raw, v0, batch, steps)
        results[f"raw_spmm_fw{fw}_us"] = round(us, 1)
        results[f"raw_spmm_fw{fw}_bound_us"] = round(one_spmm_bound_us(fw), 1)

    def fwd_only(carry, batch):
        def one(c, _):
            (rng,) = c
            nrng, srng = jax.random.split(rng)
            pred = model.apply(params, batch, training=True, rng=srng)
            return (nrng,), loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

        c, losses = jax.lax.scan(one, carry, None, length=steps)
        return c, losses[-1]

    results["fwd_us"] = round(_time_chunk(fwd_only, (jax.random.PRNGKey(1),), batch, steps), 1)

    def train(carry, batch):
        def one(c, _):
            params, opt_state, rng = c
            nrng, srng = jax.random.split(rng)

            def compute(p):
                pred = model.apply(p, batch, training=True, rng=srng)
                return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask)

            loss, grads = jax.value_and_grad(compute)(params)
            params, opt_state = optimizer.step(params, grads, opt_state)
            return (params, opt_state, nrng), loss

        c, losses = jax.lax.scan(one, carry, None, length=steps)
        return c, losses[-1]

    step_us = _time_chunk(train, (params, opt_state, jax.random.PRNGKey(1)), batch, steps)
    results["train_us"] = round(step_us, 1)

    bound = bcsr_bound_bytes(st, (32, 64))
    sol_us = bound["bound_bytes"] / (peak * 1e9) * 1e6
    spmm_us = 2 * (results["raw_spmm_fw32_us"] + results["raw_spmm_fw64_us"])
    print(
        json.dumps(
            {
                "device_kind": getattr(device, "device_kind", str(device)),
                "num_nodes": num_nodes,
                "kbatch": bs.KBATCH,
                "super": bs.SUPER,
                "chunk_tiles": bs.CHUNK_TILES,
                "num_blocks": st.num_blocks,
                **results,
                "four_spmm_us": round(spmm_us, 1),
                "glue_us": round(step_us - spmm_us, 1),
                "bound_us": round(sol_us, 1),
                "pct_speed_of_light": round(100.0 * sol_us / step_us, 1),
                "edges_per_s": round(real_edges / (step_us / 1e6), 1),
                "padding": padding_fractions(entry, num_nodes),
            }
        )
    )


def padding_fractions(entry: dict, num_nodes: int, num_shards: int = 8) -> dict:
    """Zero-block padding fractions at this shape (host arithmetic only):
    the single-chip structure's run padding, and the 8-shard ring partition's
    total padded fraction with the per-step auto-kbatch quanta
    (round-4 verdict #7 gate: ring <= 25 %). ``required_blocks(kbatch=1)``
    is the real unique-block denominator."""
    import numpy as np

    from deeprank2_tpu.ops import block_sparse as bs
    from deeprank2_tpu.parallel.blocksparse_partition import _choose_quanta

    order = bs.locality_order(entry["pos"])
    inv = np.empty(len(order), np.int64)
    inv[order] = np.arange(len(order))
    pairs = inv[np.asarray(entry["edge_index"], np.int64)]

    real_full = bs.required_blocks(pairs, num_nodes, kbatch=1)
    padded_full = bs.required_blocks(pairs, num_nodes)

    block = bs.DEFAULT_BLOCK
    nt = -(-num_nodes // block)
    r_per = -(-nt // num_shards)
    nn_pad = r_per * num_shards * block
    ranges = [(d * r_per, (d + 1) * r_per) for d in range(num_shards)]

    # mirror _build_ring_structures' bucketing + auto-quanta choices,
    # including the kb*sb capacity floor the builder rounds to
    real_ring = padded_ring = 0
    for k in range(num_shards):
        rc = [(r, r) for r in ranges] if k == 0 else [(ranges[d], ranges[(d - k) % num_shards]) for d in range(num_shards)]
        kb, sb = _choose_quanta([pairs] * num_shards, nn_pad, block, rc)
        cap = max(bs.required_blocks(pairs, nn_pad, row_tile_range=r, col_tile_range=c, kbatch=kb) for r, c in rc)
        cap = -(-cap // (kb * sb)) * (kb * sb)
        padded_ring += cap * num_shards
        real_ring += sum(bs.required_blocks(pairs, nn_pad, row_tile_range=r, col_tile_range=c, kbatch=1) for r, c in rc)

    return {
        "kbatch": bs.KBATCH,
        "full_real_blocks": real_full,
        "full_padded_frac": round(padded_full / real_full - 1.0, 3),
        "ring_shards": num_shards,
        "ring_real_blocks": real_ring,
        "ring_padded_frac": round(padded_ring / real_ring - 1.0, 3),
    }


if __name__ == "__main__":
    main()

# ---------------------------------------------------------------------------
# Round-4 note — the near-f32 residual vs the bf16 twin is PINNED IRREDUCIBLE
# at this kernel design: the f32 step exceeds the bf16 step by almost exactly
# the extra hi/lo MXU MAC time (measured 3.21-3.22 ms vs 2.78-2.79 ms; the
# ~0.44 ms delta == the doubled per-block matmul work at peak), so the second
# pass does not overlap the stream no matter how it is issued. A widened
# single-operand variant (hi stacked atop lo as one [2fw, N] chunk — one
# full-height dot per block instead of two half-height ones, hi+lo folded
# once per run at flush) measured 81.2-81.5 % SoL vs the two-dot form's
# 82.6-83.1 % — slightly WORSE, confirming the binding resource is the
# kernel's in-order issue stream, which the extra MACs lengthen linearly
# regardless of dot shape. Closing the gap needs int8-rate math for the
# second pass or out-of-order MXU issue, neither available on v5e.
