"""Decompose the blocked-edge (VanillaNetworkBlocked) step: why is it far
below its HBM bound, and what is its real hardware floor?

    python tests/perf/blocked_decompose.py          # measures on the TPU

Round-4 findings (v5e, 100k-node graph, bf16, defaults 256/1024/4):

1. **Step time is geometry-invariant.** Sweeping EDGE_TILE x TILE_E x K_SUB
   over {256/2048/8: 19.49 ms, 256/1024/4: 19.77, 256/1024/8: 20.85,
   128/1024/8: 20.45, 128/2048/16: 20.69, 128/1024/4: 20.44} moves slab
   count 2310..6205 and the priced HBM stream by +-40 % while the step stays
   within +-4 %. The path is therefore neither per-slab-overhead- nor
   HBM-bound (round-3's TILE_E=2048 lever is a no-op now that its compile
   is fast).
2. **One-hot synthesis costs ~5 ms of the 19.8.** Replacing the iota-compare
   one-hot generation with a constant (DR2_BLOCKED_DEBUG=noonehot; wrong
   results, same shapes) measures 14.8 ms.
3. **The remaining ~15 ms is the gather/scatter MACs themselves.** The
   kernel's design trades FLOPs for gathers: every edge costs ~11 M x tile
   MAC-units across the four passes (fwd: dst+src gathers + scatter; bwd:
   pre recompute, dmsg gather, dxr scatter, and the mirror's three gathers +
   scatter). At the bench shape that is 1.03e12 MACs -> 10.5 ms at v5e bf16
   PEAK, before any utilization loss from m_pad=40-row operands.

Corrected floor: compute-aware, ``max(hbm_s, mxu_peak_s + onehot_vpu_s)``
(the one-hot synthesis feeds the dots, so VPU and MXU serialize on the
dependency chain; HBM overlaps both). bench.py reports the blocked path
against this floor alongside the HBM-only number. At 19.7 ms vs a 13.4 ms
floor the kernel runs at ~68 % of what this algorithm can do on this chip —
the remaining distance to the HBM bound is irreducible MXU work, the price
of running per-edge-feature message passing on a systolic array at 17x the
COO path's throughput.

Round-5: the "stream precomputed one-hot planes from HBM" lever (round-4
verdict #4, the admitted untried item) is REJECTED by arithmetic before
burning a compile: a slab needs its row plane ([EDGE_TILE=256, TILE_E=2048])
plus K_SUB source planes (together another [256, 2048]) = 1 MB/slab even at
int8; the bench graph's 6.55 M directed edges make 3200 slabs, and both the
forward and the mirror-fused backward consume the planes, so the stream is
2 x 3200 x 1 MB = 6.4 GB = ~7.8 ms at 819 GB/s — MORE than the ~4.9 ms of
iota-compare synthesis it would replace (finding 2 above), before counting
the doubled VMEM working set crowding the pipeline. Collate-time one-hot
planes only pay off when edges-per-node is high enough that planes are
REUSED across slabs; at ~33 edges/node each (node-tile, edge-slab) pair is
touched ~once. Synthesis stays in-kernel.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

VPU_ELEMS_PER_S = 962e9  # v5e: 8 sublanes x 128 lanes x ~940 MHz
PEAK_MACS = {"TPU v5 lite": 98.5e12, "TPU v5e": 98.5e12}  # bf16 MAC/s


def blocked_compute_floor_s(structure, m: int, device_kind: str = "TPU v5 lite", split: bool = False) -> dict:
    """Compute-aware floor for one VanillaNetworkBlocked train step."""
    from deeprank2_tpu.ops.blocked_edges import EDGE_TILE, K_SUB, TILE_E

    ns = structure.num_slabs
    m_pad = m + (-m) % 8
    fe_pad = structure.eattr_t.shape[0]
    passes = 2 if split else 1  # hi/lo doubles every gather/scatter dot
    # per slab MAC-units: fwd 3 gather/scatter dots + 1 thin; bwd 8 + 2 thin
    macs = 2 * ns * TILE_E * (11 * m_pad * EDGE_TILE * passes + 3 * m_pad * fe_pad)
    mxu_s = macs / PEAK_MACS.get(device_kind, 98.5e12)
    # one-hot synthesis: 2 one-hot matrices per edge slab (row+col sides),
    # reused by fwd's scatter and regenerated in bwd. Priced at ONE bf16
    # VPU op per cell (2 cells/lane) — the measured cost (full - noonehot =
    # 4.76 ms) matches this rate to within 3 %, so Mosaic's iota+compare+
    # convert emits ~one packed op per cell.
    onehot_elems = 2 * ns * (2 * EDGE_TILE * TILE_E) * 2  # 2 layers x (fwd+bwd)
    vpu_s = onehot_elems / (2 * VPU_ELEMS_PER_S)
    return {"mxu_s": mxu_s, "onehot_vpu_s": vpu_s, "compute_floor_s": mxu_s + vpu_s}


def main() -> None:
    out = {}
    for label, env in (("full", {}), ("noonehot", {"DR2_BLOCKED_DEBUG": "noonehot"})):
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "blocked_sol.py"), "--bf16"],
            env={**os.environ, **env},
            capture_output=True,
            text=True,
            timeout=900,
            check=False,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out[label] = json.loads(line)["step_ms"]

    from deeprank2_tpu.ops.batch import collate_graphs_blocked
    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import MESSAGE_SIZE
    from tests.perf.blocksparse_perf import geometric_entry

    entry = geometric_entry(100_000, 38, 6)
    batch, _ = collate_graphs_blocked([entry])
    floor = blocked_compute_floor_s(batch.structure, MESSAGE_SIZE)
    out["onehot_ms_measured"] = round(out["full"] - out["noonehot"], 2)
    out.update({k: round(v * 1e3, 2) for k, v in floor.items()})
    out["pct_of_compute_floor"] = round(100.0 * floor["compute_floor_s"] * 1e3 / out["full"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
