"""Speed-of-light analysis of the dense GINet train step (BASELINE %SoL metric).

Measures the full jitted train step (fwd + CrossEntropy + bwd + Adam) at the
bench configuration and compares it against the HBM-traffic lower bound of
the algorithm: the block-dense aggregation reads the ``[G, N, N]`` adjacency
four times per step (two forward layers + their two backward contractions);
everything else (node blocks, activations, parameters) is second-order.

    python tests/perf/sol_perf.py          # runs on the real TPU chip

Honest timing for this box's TPU tunnel: steps chained in a jitted lax.scan,
clock stopped by a data-dependent value transfer (block_until_ready can
return early here). 500-step chunks: at 50 steps/call the host-side chunk
dispatch costs ~25 us/step against a ~250 us device step (profiled round 4 —
the device "Steps" track shows zero idle inside a chunk); steady-state
training runs long scans, so the longer chunk is the representative number.
"""

from __future__ import annotations

import json
import time

# peak HBM bandwidth per chip, GB/s (device kind -> spec sheet value)
PEAK_HBM_GBPS = {
    "TPU v5e": 819.0,
    "TPU v5 lite": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6e": 1640.0,
}
DEFAULT_PEAK_GBPS = 819.0


def sol_report(num_graphs: int = 512, nodes: int = 160, steps_per_call: int = 500, calls: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    feat_dim, edge_dim = 38, 6
    entries = synthetic_entries(num_graphs, nodes, feat_dim, edge_dim, seed=7)
    batch, _ = collate_graphs_dense(entries, pad_graphs=num_graphs, pad_nodes=nodes)
    real_edges = int(sum(2 * e["edge_index"].shape[0] for e in entries))
    batch = jax.device_put(batch)

    model = GINetDense(feat_dim, 2, edge_dim)
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

    t0 = time.perf_counter()
    for _ in range(calls):
        carry, loss = train_chunk(carry, batch)
    float(loss)
    step_s = (time.perf_counter() - t0) / (steps_per_call * calls)

    adj_bytes = batch.adj.size * batch.adj.dtype.itemsize
    x_bytes = batch.x.size * batch.x.dtype.itemsize
    h_bytes = num_graphs * nodes * (32 + 64) * 4  # h1/h2 activations, f32
    # lower bound: 4 adjacency passes + x fwd/bwd + activations saved fwd, read bwd
    bound_bytes = 4 * adj_bytes + 2 * x_bytes + 2 * h_bytes
    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    sol_s = bound_bytes / (peak * 1e9)

    return {
        "device_kind": getattr(device, "device_kind", str(device)),
        "step_us": round(step_s * 1e6, 1),
        "edges_per_s": round(real_edges / step_s, 1),
        "hbm_bound_bytes": bound_bytes,
        "hbm_bound_us": round(sol_s * 1e6, 1),
        "pct_speed_of_light": round(100.0 * sol_s / step_s, 1),
        "peak_hbm_gbps": peak,
    }


if __name__ == "__main__":
    print(json.dumps(sol_report()))
