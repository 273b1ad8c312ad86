"""3D-CNN (grid path) training throughput: full train step (fwd+bwd+Adam).

Reference benchmark grid configuration (README.md:436-444 / tests/perf/
ppi_perf.py:22-34): 35x30x30 boxes, 33 mapped PPI features. Reports grids/s
for CnnClassification at a given batch size.

    python tests/perf/cnn_perf.py [batch_size]

Timing follows bench.py: steps chained in a jitted ``lax.scan``, clock
stopped by a data-dependent ``float(loss)``, best of two windows.

Round-4 profile note (v5e, batch 128): the step is bound by XLA's conv3d
lowering at tiny channel counts, not bandwidth — conv1's weight-grad runs
895 us and its forward 618 us (~6 % MXU utilization at C_out=4), and a
bf16 variant measured SLOWER both with per-step casts (2.21 vs 2.07 ms)
and with the grid batch stored bf16 (so the f32 x stream is not the
constraint either). A custom small-channel conv kernel is the only lever;
at 62-64k grids/s the path is far past any current need.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# repo-root import bootstrap (NOT via the PYTHONPATH env var, which breaks
# the axon TPU plugin's subprocess discovery on this box)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification
    from deeprank2_tpu.ops.batch import GridBatch
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    num_features, box = 33, (35, 30, 30)
    rng = np.random.default_rng(7)
    batch = GridBatch(
        x=rng.normal(size=(batch_size, num_features, *box)).astype(np.float32),
        y=(rng.uniform(size=batch_size) < 0.5).astype(np.float32),
        y_mask=np.ones(batch_size, dtype=bool),
    )
    batch = jax.device_put(batch)

    model = CnnClassification(num_features, box)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    loss_fn = CrossEntropyLoss()

    steps_per_call = 50

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

    calls = 4
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, loss = train_chunk(carry, batch)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)

    step_s = best_dt / (steps_per_call * calls)
    print(
        json.dumps(
            {
                "path": "cnn3d",
                "batch_size": batch_size,
                "box": list(box),
                "num_features": num_features,
                "step_ms": round(step_s * 1e3, 3),
                "grids_per_s": round(batch_size / step_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
