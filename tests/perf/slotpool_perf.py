"""Slot-pool kernel micro-benchmark on the real TPU.

Compares, at the 100k-node clustered bench shape (fwd + VJP per step):

- ``slotpool``: the Pallas 8-lane slot max (ops/pallas_slotpool.py) plus the
  small member-matrix combine over slot partials — the slot-layout pipeline.
- ``member``: the round-3 member-matrix pool over node rows (current path).
- ``xla_reshape``: the 3-D reshape lane-group formulation (the measured
  90-180 us/pass XLA wall that motivated the kernel).

    python tests/perf/slotpool_perf.py [--profile DIR]

Timing: scan-chained chunks, data-dependent sync, best of three.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.pallas_slotpool import TILE, slot_group_max
    from deeprank2_tpu.ops.pooling import member_max_pool

    profile_dir = sys.argv[sys.argv.index("--profile") + 1] if "--profile" in sys.argv else None

    rng = np.random.default_rng(0)
    feat = 32
    # 2197 clusters of ~45.5 nodes in 8-lane slots = the clustered bench shape
    n_c0 = 2197
    sizes = rng.integers(25, 70, n_c0)
    nslots = -(-sizes // 8)
    s_total = int(nslots.sum())
    vp = -(-(8 * s_total) // TILE) * TILE
    s_cap = vp // 8
    c_cap = -(-n_c0 // 128) * 128

    # slot layout bookkeeping
    slot_cluster = np.full(s_cap, c_cap, np.int32)
    base = 0
    s_max = int(nslots.max())
    members_s = np.full((c_cap, s_max), s_cap, np.int32)
    for c in range(n_c0):
        slot_cluster[base : base + nslots[c]] = c
        members_s[c, : nslots[c]] = np.arange(base, base + nslots[c])
        base += nslots[c]
    mask = np.zeros(vp, np.float32)
    for c in range(n_c0):
        pass  # mask built from sizes below
    mask3 = np.zeros((s_cap, 8), np.float32)
    base = 0
    for c in range(n_c0):
        for k in range(nslots[c]):
            fill = min(8, sizes[c] - 8 * k)
            mask3[base + k, :fill] = 1.0
        base += nslots[c]
    mask = mask3.reshape(-1)

    h = np.abs(rng.standard_normal((feat, vp)).astype(np.float32)) * mask[None, :]
    mask_row = mask.reshape(1, vp)

    # node-level member matrix for the current path
    node_cluster = np.full(vp, c_cap, np.int32)
    for s in range(s_cap):
        node_cluster[8 * s : 8 * s + 8] = slot_cluster[s]
    node_cluster = np.where(mask > 0, node_cluster, c_cap).astype(np.int32)
    n_max = int(sizes.max())
    members_n = np.full((c_cap, n_max), vp, np.int32)
    for c in range(n_c0):
        rows = np.nonzero(node_cluster == c)[0]
        members_n[c, : len(rows)] = rows

    dev = jax.devices()[0]
    h_d, mask_d = jax.device_put((h, mask_row), dev)
    members_s_d, slot_cluster_d = jax.device_put((members_s, slot_cluster), dev)
    members_n_d, node_cluster_d = jax.device_put((members_n, node_cluster), dev)

    def slotpool(hh):
        p8 = slot_group_max(hh, mask_d)  # [F, S]
        hp = member_max_pool(p8.T, members_s_d, slot_cluster_d)  # [C, F]
        return hp.T

    def member(hh):
        return member_max_pool(hh.T, members_n_d, node_cluster_d).T

    def xla_reshape(hh):
        h3 = hh.reshape(feat, vp // 8, 8)
        return h3.max(axis=2)

    variants = {"slotpool": slotpool, "member": member, "xla_reshape": xla_reshape}
    steps, calls = 200, 3
    results = {}
    for name, fn in variants.items():

        @jax.jit
        def chunk(carry, fn=fn):
            def body(c, _):
                out, grad = jax.value_and_grad(lambda x: (fn(x) ** 2).sum())(c)
                return c + 1e-12 * grad, out

            c, outs = jax.lax.scan(body, carry, None, length=steps)
            return c, outs[-1]

        carry = h_d
        t0 = time.perf_counter()
        carry, out = chunk(carry)
        float(out)
        print(f"# {name} compile {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(calls):
                carry, out = chunk(carry)
            float(out)
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best / (steps * calls) * 1e6, 2)
        if profile_dir:
            with jax.profiler.trace(f"{profile_dir}/{name}"):
                carry, out = chunk(carry)
                float(out)

    print(json.dumps({"device": getattr(dev, "device_kind", str(dev)), "vp": vp, "us_per_step": results}))


if __name__ == "__main__":
    main()
