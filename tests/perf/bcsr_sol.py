"""Speed-of-light analysis of the BCSR (atomic-graph) GINet train step.

The block-sparse train step's HBM traffic is dominated by streaming the int8
adjacency blocks through the SpMM kernel: the two fused-tower layers cost one
SpMM forward each, and their VJPs are the same SpMM on the cotangent
(symmetry), so the blocks stream FOUR times per step. Second-order terms
that still matter at atomic scale are priced too:

- x^T chunk DMAs: the kernel re-loads the resident x^T chunk when the
  column chunk changes (blocks are sorted by (chunk, row tile), so that's
  once per chunk per SpMM) — ``num_chunks * fw * chunk_bytes``;
- slab round-trip: the kernel emits one [fw, rows] f32 slab per chunk;
  the masked XLA sum re-reads them (+1 write of the collapsed result).

    python tests/perf/bcsr_sol.py [num_nodes]

Timing protocol follows bench.py (scan-chained, data-dependent sync).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.perf.blocksparse_perf import geometric_entry  # noqa: E402
from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS  # noqa: E402


def bcsr_bound_bytes(structure, feat_widths: tuple[int, ...], compute_itemsize: int = 4) -> dict:
    """HBM-traffic lower bound for one train step (two layers fwd+bwd).

    ``feat_widths``: the sublane-padded SpMM feature widths per layer
    (32, 64 for the GINet tower pair); each width is streamed twice (fwd +
    VJP). ``compute_itemsize``: 4 for f32 chunks, 2 for bf16.
    """
    from deeprank2_tpu.ops.block_sparse import CHUNK_TILES

    b = structure.block
    nb = structure.num_blocks
    nc = structure.num_chunks
    rows = structure.padded_rows
    chunk_cols = min(CHUNK_TILES, structure.num_tiles) * b

    block_bytes = nb * b * b * structure.blocks_t.dtype.itemsize
    passes = 2 * len(feat_widths)  # fwd + VJP per layer
    total = passes * block_bytes
    detail = {"adj_stream": passes * block_bytes, "x_chunks": 0, "slabs": 0}
    for fw in feat_widths:
        sublane = 16 if compute_itemsize == 2 else 8
        fwp = fw + (-fw) % sublane
        # fwd + VJP for this layer: chunk DMAs and slab write+read+result
        detail["x_chunks"] += 2 * nc * fwp * chunk_cols * compute_itemsize
        detail["slabs"] += 2 * (2 * nc + 1) * fwp * rows * 4
    total += detail["x_chunks"] + detail["slabs"]
    return {"bound_bytes": total, **detail}


def main() -> None:
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000

    import jax
    import jax.numpy as jnp

    # matmul-precision variants of the SpMM (0/1 adjacency is lossless in
    # bf16; only the x operand loses bits below HIGHEST)
    precision = jax.lax.Precision.HIGHEST
    compute_dtype = None
    label = "f32_highest"
    if "--high" in sys.argv:
        precision, label = jax.lax.Precision.HIGH, "f32_high"
    if "--default" in sys.argv:
        precision, label = jax.lax.Precision.DEFAULT, "f32_default"
    if "--bf16" in sys.argv:
        compute_dtype, label = jnp.bfloat16, "bf16"

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat_dim, edge_dim = 38, 6
    t0 = time.perf_counter()
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]
    print(f"# geometry {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    batch, _ = collate_graphs_blocksparse([entry])
    print(f"# collate {time.perf_counter() - t0:.1f}s, blocks {batch.structure.num_blocks}", file=sys.stderr, flush=True)
    batch = jax.device_put(batch)

    model = GINetBlockSparse(feat_dim, 2, edge_dim, precision=precision, compute_dtype=compute_dtype)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    steps_per_call, calls = 50, 4

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
    t0 = time.perf_counter()
    carry, loss = train_chunk(carry, batch)
    float(loss)
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, loss = train_chunk(carry, batch)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    step_s = best_dt / (steps_per_call * calls)

    bound = bcsr_bound_bytes(batch.structure, (32, 64), compute_itemsize=2 if compute_dtype is not None else 4)
    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    sol_s = bound["bound_bytes"] / (peak * 1e9)

    print(
        json.dumps(
            {
                "device_kind": getattr(device, "device_kind", str(device)),
                "variant": label,
                "num_nodes": num_nodes,
                "real_edges": real_edges,
                "num_blocks": batch.structure.num_blocks,
                "step_ms": round(step_s * 1e3, 3),
                "edges_per_s": round(real_edges / step_s, 1),
                "hbm_bound_bytes": bound["bound_bytes"],
                "hbm_bound_ms": round(sol_s * 1e3, 3),
                "pct_speed_of_light": round(100.0 * sol_s / step_s, 1),
                "bound_detail": {k: v for k, v in bound.items() if k != "bound_bytes"},
                "peak_hbm_gbps": peak,
            }
        )
    )


if __name__ == "__main__":
    main()
