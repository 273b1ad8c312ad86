"""Speed-of-light analysis of the blocked-edge (VanillaNetworkBlocked) step.

The blocked kernels' HBM traffic is layout-determined: Mosaic re-fetches an
input block exactly when its BlockSpec index differs from the previous grid
step, and every (index-changing) fetch/write is computable host-side from the
structure's ``step_row``/``sub_col`` arrays. ``blocked_bound_bytes`` prices
that exactly — per-slab streams (locals + edge features), per-run node tiles
(xr/xc/g gathers, output flushes), the visited-mask passes, and the node-MLP
x/concat traffic around the kernel — for the two message layers fwd+bwd.

    python tests/perf/blocked_sol.py [num_nodes] [--bf16]

Timing protocol follows bench.py (scan-chained, data-dependent sync).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tests.perf.blocksparse_perf import geometric_entry  # noqa: E402
from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS  # noqa: E402


def blocked_bound_bytes(structure, m: int, feat_dim: int) -> dict:
    """HBM-traffic lower bound for one VanillaNetworkBlocked train step
    (two message layers, fwd + bwd) given this structure's slab layout."""
    from deeprank2_tpu.ops.blocked_edges import EDGE_TILE, K_SUB, TILE_E

    tile = EDGE_TILE
    ns = structure.num_slabs
    fe_pad = structure.eattr_t.shape[0]
    m_pad = m + (-m) % 8
    v_pad = structure.padded_nodes
    tile_bytes = m_pad * tile * 4

    step_row = np.asarray(structure.step_row)
    sub_col = np.asarray(structure.sub_col)
    row_changes = int(1 + np.count_nonzero(step_row[1:] != step_row[:-1]))
    col_changes = 0
    for k in range(K_SUB):
        sc = sub_col[k::K_SUB]
        col_changes += int(1 + np.count_nonzero(sc[1:] != sc[:-1]))

    per_slab = (4 + 4 + 4 * fe_pad) * TILE_E  # row_local + col_local + eattr_t

    fwd = ns * per_slab + row_changes * tile_bytes + col_changes * tile_bytes
    fwd += row_changes * tile_bytes  # output flushes
    fwd += 2 * m_pad * v_pad * 4  # visited-mask pass over out (read+write)

    # bwd streams 3 row-tile inputs (xr, xc@row, g@row), 3 col-tile input
    # sets (xc, xr, g), writes dxr + dxc per run, plus two mask passes
    bwd = ns * per_slab + 3 * row_changes * tile_bytes + 3 * col_changes * tile_bytes
    bwd += 2 * row_changes * tile_bytes
    bwd += 4 * m_pad * v_pad * 4

    # around the kernel, per layer fwd: read x [V, F] twice (xr/xc matmuls),
    # write xr + xc [V, M]; concat + node MLP: read msg_sums + x, write h.
    # bwd mirrors it. (F = feat_dim for layer 1, F = feat_dim after node MLP
    # too — the node MLP maps back to F channels.)
    glue = 2 * (2 * v_pad * feat_dim * 4 + 2 * v_pad * m_pad * 4 + 2 * v_pad * (feat_dim + m_pad) * 4)

    total = 2 * (fwd + bwd) + glue
    return {
        "bound_bytes": total,
        "slab_stream": 2 * 2 * ns * per_slab,
        "node_tiles": 2 * ((4 * row_changes + 4 * col_changes) * tile_bytes + 2 * row_changes * tile_bytes),
        "mask_passes": 2 * 6 * m_pad * v_pad * 4,
        "glue": glue,
        "row_changes": row_changes,
        "col_changes": col_changes,
    }


def main() -> None:
    num_nodes = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100_000
    bf16 = "--bf16" in sys.argv

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import MESSAGE_SIZE, VanillaNetworkBlocked
    from deeprank2_tpu.ops.batch import collate_graphs_blocked
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]
    batch, _ = collate_graphs_blocked([entry])
    batch = jax.device_put(batch)

    model = VanillaNetworkBlocked(feat_dim, 2, edge_dim, compute_dtype=jnp.bfloat16 if bf16 else None)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    steps_per_call, calls = 20, 3

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

    bound = blocked_bound_bytes(batch.structure, MESSAGE_SIZE, feat_dim)
    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    sol_s = bound["bound_bytes"] / (peak * 1e9)
    print(
        json.dumps(
            {
                "device_kind": getattr(device, "device_kind", str(device)),
                "variant": "bf16" if bf16 else "f32",
                "num_nodes": num_nodes,
                "real_edges": real_edges,
                "num_slabs": batch.structure.num_slabs,
                "step_ms": round(step_s * 1e3, 3),
                "edges_per_s": round(real_edges / step_s, 1),
                "hbm_bound_ms": round(sol_s * 1e3, 3),
                "pct_speed_of_light": round(100.0 * sol_s / step_s, 1),
                "bound_detail": {k: v for k, v in bound.items() if k != "bound_bytes"},
            }
        )
    )


if __name__ == "__main__":
    main()
