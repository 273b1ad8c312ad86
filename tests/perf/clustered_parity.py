"""On-hardware parity check of the clustered fast paths (slot8 + diag).

Runs on the real TPU:

    python tests/perf/clustered_parity.py

1. ``slot_group_max``'s Mosaic kernel vs the XLA reshape oracle — expected
   BIT-EXACT forward and backward (the kernel's three-term bf16 selection
   splits reconstruct f32 exactly; see ops/pallas_slotpool.py).
2. ``GINetClusteredDiag`` and ``GINetClusteredBlockSparse`` (slot8) forward
   vs the COO clustered GINet on the same parameters, within the 1e-3
   accuracy-gate tolerance (the CPU test suite checks the same thing on the
   XLA fallbacks; this checks the REAL kernels).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.ops.pallas_slotpool import TILE, _xla_fwd, slot_group_max, supports

    rng = np.random.default_rng(0)
    feat, vp = 32, 8 * TILE
    h = np.abs(rng.standard_normal((feat, vp)).astype(np.float32))
    mask = (rng.random(vp) > 0.1).astype(np.float32)
    h[:, 100:108] = 0.0
    h[3, 200] = h[3, 201] = 5.0
    h = h * mask[None, :]
    h_d = jax.device_put(jnp.asarray(h))
    mask_row = jax.device_put(jnp.asarray(mask.reshape(1, vp)))
    assert supports(vp), "slot kernel path not engaged"

    # all three strides (8 = slot8 layout; 2/4 = the mixed size-class
    # regions), each bit-exact vs the XLA oracle + the full-cotangent
    # winner rule (the round-5 convention — every valid max lane gets g)
    kernel_fwd_err = kernel_bwd_err = 0.0
    for slot in (8, 4, 2):
        pooled = slot_group_max(h_d, mask_row, slot=slot)
        ref = _xla_fwd(h_d, mask_row, slot)
        kernel_fwd_err = max(kernel_fwd_err, float(jnp.abs(pooled - ref).max()))

        w = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
        g_kernel = jax.grad(lambda x, slot=slot, w=w: (slot_group_max(x, mask_row, slot=slot) * w).sum())(h_d)
        h3 = h_d.reshape(feat, vp // slot, slot)
        m3 = mask_row.reshape(1, vp // slot, slot)
        g_oracle = ((h3 == ref[:, :, None]) * m3 * w[:, :, None]).reshape(feat, vp)
        kernel_bwd_err = max(kernel_bwd_err, float(jnp.abs(g_kernel - g_oracle).max()))

    # model-level: both clustered fast paths vs the COO oracle on hardware
    from tests.utils.test_clustered_blocksparse import _clustered_entries

    from deeprank2_tpu.neuralnets.gnn.clustered_blocksparse import GINetClusteredBlockSparse
    from deeprank2_tpu.neuralnets.gnn.ginet import GINet
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDiag
    from deeprank2_tpu.ops.batch import (
        collate_graphs,
        collate_graphs_blocksparse_clustered,
        collate_graphs_diag_clustered,
    )

    entries = _clustered_entries(num_graphs=3, edge_dim=1, sizes=(180, 260, 140))
    coo_model = GINet(13, 2, 1)
    params = coo_model.init(jax.random.PRNGKey(0))
    coo_batch = jax.device_put(collate_graphs(entries, pad_graphs=4)[0])
    want = np.asarray(coo_model.apply(params, coo_batch, training=False))[:3]

    diag_batch = jax.device_put(collate_graphs_diag_clustered(entries, pad_graphs=4)[0])
    diag = np.asarray(GINetClusteredDiag(13, 2, 1).apply(params, diag_batch, training=False))[:3]
    bs_batch = jax.device_put(collate_graphs_blocksparse_clustered(entries, pad_graphs=4, slot8=True)[0])
    bs = np.asarray(GINetClusteredBlockSparse(13, 2, 1).apply(params, bs_batch, training=False))[:3]

    result = {
        "device_kind": getattr(jax.devices()[0], "device_kind", "?"),
        "slot_kernel_fwd_max_err": kernel_fwd_err,
        "slot_kernel_bwd_max_err": kernel_bwd_err,
        "diag_vs_coo_max_err": float(np.abs(diag - want).max()),
        "bcsr_slot8_vs_coo_max_err": float(np.abs(bs - want).max()),
    }
    print(json.dumps(result))
    assert kernel_fwd_err == 0.0, "slot kernel forward must be bit-exact"
    assert kernel_bwd_err == 0.0, "slot kernel backward must be bit-exact"
    assert result["diag_vs_coo_max_err"] < 1e-3
    assert result["bcsr_slot8_vs_coo_max_err"] < 1e-3
    print("clustered on-hardware parity OK")


if __name__ == "__main__":
    main()
