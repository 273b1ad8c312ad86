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


def grid_batch(batch_size: int, num_features: int, box: tuple[int, int, int], seed: int = 7):
    from deeprank2_tpu.ops.batch import GridBatch

    rng = np.random.default_rng(seed)
    return GridBatch(
        x=rng.normal(size=(batch_size, num_features, *box)).astype(np.float32),
        y=(rng.uniform(size=batch_size) < 0.5).astype(np.float32),
        y_mask=np.ones(batch_size, dtype=bool),
    )


def cnn_hbm_floor_bytes(batch_size: int, num_features: int, box: tuple[int, int, int], itemsize: int = 4) -> int:
    """HBM-stream floor for one CnnClassification/CnnRegression train step.

    The conv stack's arithmetic intensity is ~7 MACs per streamed byte
    (conv1: k^3*C_in*C_out = 1056 MACs per C_in*itemsize = 132-byte input
    column), an order of magnitude below the v5e ridge (~120 MACs/byte at
    bf16 peak) — so an IDEAL kernel for this architecture is HBM-bound and
    the stream is the honest denominator (the MAC term at peak is ~0.1 ms
    against a ~1.6 ms stream at batch 128). Terms, each tensor priced once
    per use across fwd+bwd (weights are KBs — ignored):

      x      read by conv1 fwd and again by conv1's weight-grad (first
             layer: no input-grad)                                     2*X
      h1     written fwd (kept for the pool/relu backward), read by
             pool1 fwd, read once more by a fused backward (argmax
             recompute + dh1p routing straight into the weight-grad —
             no materialized dh1)                                      3*H1
      h1p    written fwd, read by conv2 fwd, read by conv2 grads        3*H1p
      h2     same role as h1 around pool2                              3*H2
      flat/FC tiny (84-dim)                                            ~0
    """
    w, h, d = box
    c1 = (w - 1, h - 1, d - 1)  # conv k=2 valid
    p1 = tuple(c // 2 for c in c1)
    c2 = tuple(p - 1 for p in p1)
    x_b = batch_size * num_features * w * h * d * itemsize
    h1_b = batch_size * 4 * c1[0] * c1[1] * c1[2] * itemsize
    h1p_b = batch_size * 4 * p1[0] * p1[1] * p1[2] * itemsize
    h2_b = batch_size * 5 * c2[0] * c2[1] * c2[2] * itemsize
    return 2 * x_b + 3 * (h1_b + h1p_b + h2_b)


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 128

    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    num_features, box = 33, (35, 30, 30)
    batch = jax.device_put(grid_batch(batch_size, num_features, box))

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
    from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS

    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    floor_s = cnn_hbm_floor_bytes(batch_size, num_features, box) / (peak * 1e9)
    print(
        json.dumps(
            {
                "path": "cnn3d",
                "batch_size": batch_size,
                "box": list(box),
                "num_features": num_features,
                "step_ms": round(step_s * 1e3, 3),
                "grids_per_s": round(batch_size / step_s, 1),
                "hbm_floor_ms": round(floor_s * 1e3, 3),
                "pct_of_hbm_floor": round(100.0 * floor_s / step_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
