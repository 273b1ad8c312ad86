"""Benchmark: GINet training on one chip — dense (PPI-scale) and BCSR
(atomic-scale) paths, each reported as edges/s AND % of its HBM-roofline
speed-of-light (the BASELINE.json north-star metric "SpMM %SoL per chip").

Prints ONE JSON line. Driver-facing keys: ``metric``/``value``/``unit`` are
the dense-path training throughput (comparable across rounds);
``vs_baseline`` is the dense step's fraction of its own HBM-traffic lower
bound (1.0 = at the roofline) — the reference publishes no training-speed
numbers (BASELINE.md), so the roofline is the honest denominator. The
``dense`` and ``bcsr`` objects carry the full {edges/s, %SoL} pairs.

Bound definitions (see tests/perf/sol_perf.py and tests/perf/bcsr_sol.py):
- dense: 4 adjacency passes (2 fwd layers + their VJPs) + x fwd/bwd + saved
  activations, priced at the collate's bf16 adjacency. Since round 4 the
  measured path is the graph-diagonal Pallas kernel (ops/diag_spmm.py):
  flat [F, G*N] activations, int8 adjacency stream, fused relu/mask and
  per-graph pooling — 82.9 % of the bound (tests/perf/dense_decompose.py
  records the path here, including the measured dead ends).
- bcsr: 4 int8 block-stream passes + x^T chunk DMAs + slab round-trips.
- blocked: HBM bound plus a compute-aware floor (the binding one for that
  kernel; tests/perf/blocked_decompose.py).

Measurement notes:
- Steps are chained inside a jitted ``lax.scan`` so per-call dispatch latency
  over the TPU tunnel is amortized; the clock is stopped by ``float(loss)``
  (block_until_ready can return early on this box).
- Batches are passed as arguments (never closed over) so they are not baked
  into the program or re-uploaded.
- Best of two fully-measured windows guards against transient slow dispatch.
"""

from __future__ import annotations

import json
import time


def _train_chunk_fn(model, optimizer, loss_fn, steps_per_call):
    import jax
    import jax.numpy as jnp

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

    return train_chunk


def _measure(model, batch, steps_per_call, calls):
    import jax

    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam

    params = model.init(jax.random.PRNGKey(0))
    optimizer = Adam(lr=1e-3, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    train_chunk = _train_chunk_fn(model, optimizer, CrossEntropyLoss(), steps_per_call)

    carry = (params, opt_state, jax.random.PRNGKey(1))
    carry, loss = train_chunk(carry, batch)
    float(loss)

    best_dt = float("inf")
    for _ in range(3):  # best of three windows: tunnel dispatch jitter is ~4 %
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, loss = train_chunk(carry, batch)
        float(loss)
        best_dt = min(best_dt, time.perf_counter() - t0)
    return best_dt / (steps_per_call * calls)


def dense_result() -> dict:
    import jax

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense
    from deeprank2_tpu.ops.synthetic import synthetic_entries
    from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS

    feat_dim, edge_dim = 38, 6
    num_graphs, nodes = 512, 160
    entries = synthetic_entries(num_graphs, nodes, feat_dim, edge_dim, seed=7)
    batch, _ = collate_graphs_dense(entries, pad_graphs=num_graphs, pad_nodes=nodes)
    real_edges = int(sum(2 * e["edge_index"].shape[0] for e in entries))
    batch = jax.device_put(batch)

    # 500-step chunks: the host-side chunk dispatch over this box's TPU
    # tunnel costs ~25 us/step at 50 steps/call against a ~250 us device
    # step (profiled round 4 — the device "Steps" track shows zero idle
    # inside a chunk); steady-state training runs long scans, so the longer
    # chunk is the representative number. The ms-scale BCSR/blocked steps
    # below keep 50-step chunks (dispatch is <1 % there).
    step_s = _measure(GINetDense(feat_dim, 2, edge_dim), batch, steps_per_call=500, calls=3)

    adj_bytes = batch.adj.size * batch.adj.dtype.itemsize
    x_bytes = batch.x.size * batch.x.dtype.itemsize
    h_bytes = num_graphs * nodes * (32 + 64) * 4
    bound_bytes = 4 * adj_bytes + 2 * x_bytes + 2 * h_bytes
    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    sol_s = bound_bytes / (peak * 1e9)
    out = {
        "edges_per_s": round(real_edges / step_s, 1),
        "step_us": round(step_s * 1e6, 1),
        "pct_speed_of_light": round(100.0 * sol_s / step_s, 1),
        "hbm_bound_us": round(sol_s * 1e6, 1),
    }

    # bf16 fast-training variant (single-pass kernel matmuls; ~bf16-epsilon
    # activations) against a tighter bound with 2-byte x/activation terms —
    # mirrors the bcsr bf16 row. Its raw step beats the f32-priced bound.
    import jax.numpy as jnp

    step16_s = _measure(GINetDense(feat_dim, 2, edge_dim, compute_dtype=jnp.bfloat16), batch, steps_per_call=500, calls=3)
    sol16_s = (4 * adj_bytes + x_bytes + h_bytes) / (peak * 1e9)
    out["bf16"] = {
        "edges_per_s": round(real_edges / step16_s, 1),
        "step_us": round(step16_s * 1e6, 1),
        "pct_speed_of_light": round(100.0 * sol16_s / step16_s, 1),
        "hbm_bound_us": round(sol16_s * 1e6, 1),
    }
    return out


def bcsr_result(num_nodes: int = 100_000) -> dict:
    import jax

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
    from tests.perf.bcsr_sol import bcsr_bound_bytes
    from tests.perf.blocksparse_perf import geometric_entry
    from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS

    import jax.numpy as jnp

    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]
    batch, _ = collate_graphs_blocksparse([entry])
    batch = jax.device_put(batch)

    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)

    step_s = _measure(GINetBlockSparse(feat_dim, 2, edge_dim), batch, steps_per_call=50, calls=3)
    bound = bcsr_bound_bytes(batch.structure, (32, 64))
    sol_s = bound["bound_bytes"] / (peak * 1e9)
    out = {
        "num_nodes": num_nodes,
        # round-5 geometry note: KBATCH=8 stores ~22 % fewer padded blocks
        # than round 4's 16, so the HBM bound (the pct denominator) SHRANK
        # while step_ms/edges_per_s improved — compare those across rounds.
        # The near-f32 residual vs its own bound is the pinned-irreducible
        # second MXU pass (tests/perf/bcsr_decompose.py round-4 tail note);
        # the bf16 row shows the stream ceiling.
        "edges_per_s": round(real_edges / step_s, 1),
        "step_ms": round(step_s * 1e3, 3),
        "pct_speed_of_light": round(100.0 * sol_s / step_s, 1),
        "hbm_bound_ms": round(sol_s * 1e3, 3),
    }

    # bf16 fast-training variant (single-pass MXU; x truncated to bf16,
    # ~0.4 % relative on activations) against its own tighter bound
    step_s = _measure(GINetBlockSparse(feat_dim, 2, edge_dim, compute_dtype=jnp.bfloat16), batch, steps_per_call=50, calls=3)
    bound16 = bcsr_bound_bytes(batch.structure, (32, 64), compute_itemsize=2)
    sol16_s = bound16["bound_bytes"] / (peak * 1e9)
    out["bf16"] = {
        "edges_per_s": round(real_edges / step_s, 1),
        "step_ms": round(step_s * 1e3, 3),
        "pct_speed_of_light": round(100.0 * sol16_s / step_s, 1),
        "hbm_bound_ms": round(sol16_s * 1e3, 3),
    }
    return out


def blocked_result(num_nodes: int = 100_000) -> dict:
    """VanillaNetworkBlocked (per-edge-feature fast path) train step, bf16 and
    f32-near-exact variants, against the layout-exact HBM bound
    (tests/perf/blocked_sol.py). NOTE: this kernel trades FLOPs for gathers
    (one-hot MXU matmuls), so it is MXU/overhead-bound, not HBM-bound — its
    %SoL is structurally lower than the SpMM paths'."""
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.vanilla_gnn import MESSAGE_SIZE, VanillaNetworkBlocked
    from deeprank2_tpu.ops.batch import collate_graphs_blocked
    from tests.perf.blocked_sol import blocked_bound_bytes
    from tests.perf.blocksparse_perf import geometric_entry
    from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS

    feat_dim, edge_dim = 38, 6
    entry = geometric_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]
    batch, _ = collate_graphs_blocked([entry])
    batch = jax.device_put(batch)

    from tests.perf.blocked_decompose import blocked_compute_floor_s

    bound = blocked_bound_bytes(batch.structure, MESSAGE_SIZE, feat_dim)
    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    sol_s = bound["bound_bytes"] / (peak * 1e9)

    # Two denominators per variant: the HBM-only bound (pct_speed_of_light —
    # structurally unreachable for this kernel, which trades FLOPs for
    # gathers and is MXU/VPU-bound), and the round-4 compute-aware floor
    # (gather/scatter MACs at peak + one-hot synthesis at the measured
    # packed-VPU rate; tests/perf/blocked_decompose.py derives and validates
    # it — step time is invariant to slab geometry, so the HBM bound is not
    # the binding constraint). Both the bf16 and f32 rows use f32-byte HBM
    # pricing; the f32 row's compute floor doubles the MAC term (hi/lo).
    out = {"num_nodes": num_nodes, "bound_note": "HBM bound f32-byte for both variants; compute floor is the binding one"}
    for label, cd in (("bf16", jnp.bfloat16), ("f32", None)):
        model = VanillaNetworkBlocked(feat_dim, 2, edge_dim, compute_dtype=cd)
        step_s = _measure(model, batch, steps_per_call=20, calls=3)
        dk = getattr(device, "device_kind", "TPU v5 lite")
        floor_s = blocked_compute_floor_s(batch.structure, MESSAGE_SIZE, dk, split=cd is None)["compute_floor_s"]
        floor_s = max(floor_s, sol_s)
        out[label] = {
            "edges_per_s": round(real_edges / step_s, 1),
            "step_ms": round(step_s * 1e3, 3),
            "pct_speed_of_light": round(100.0 * sol_s / step_s, 1),
            "hbm_bound_ms": round(sol_s * 1e3, 3),
            "pct_of_compute_floor": round(100.0 * floor_s / step_s, 1),
            "compute_floor_ms": round(floor_s * 1e3, 3),
        }
    return out


def clustered_result(num_nodes: int = 100_000) -> dict:
    """Clustered (community-pooling) fast-path train steps at atomic scale —
    full graph + depth-0-pooled graph both on BCSR, Pallas slot8 pooling —
    for the whole model family: GINetClusteredBlockSparse, FoutNetBlockSparse,
    SGATBlockSparse. The COO twins measured 4.4-5.9M edges/s on this graph
    (tests/perf/clustered_bcsr_perf.py --coo). GINet's numbers stay at the
    top level (round-over-round continuity); each model also gets its own
    sub-object so regressions in any family member are driver-visible."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.clustered_blocksparse import (
        FoutNetBlockSparse,
        GINetClusteredBlockSparse,
        SGATBlockSparse,
    )
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse_clustered
    from tests.perf.clustered_bcsr_perf import clustered_entry

    feat_dim, edge_dim = 38, 1
    entry = clustered_entry(num_nodes, feat_dim, edge_dim)
    real_edges = 2 * entry["edge_index"].shape[0]

    out: dict = {
        "num_nodes": num_nodes,
        "bound_note": (
            "round-5 KBATCH=8 layout stores ~22% fewer padded blocks than round 4, so the "
            "adj-stream denominator SHRANK while steps got faster (1.538->1.43 ms GINet); "
            "compare step_ms/edges_per_s across rounds and judge efficiency by "
            "pct_of_component_floor (stream + measured 62ns/sub-batch overhead + pool floors; "
            "decomposition: tests/perf/clustered_bcsr_perf.py --pin)"
        ),
    }
    for key, cls in (
        ("ginet", GINetClusteredBlockSparse),
        ("foutnet", FoutNetBlockSparse),
        ("sgat", SGATBlockSparse),
    ):
        # slot8 = the production layout (cluster-major 8-lane slots + Pallas
        # slot pooling — what Trainer collates for these models); sGAT's
        # weighted adjacency carries the edge scalar per cell (bf16 blocks)
        weighted = getattr(cls, "clustered_blocksparse_edge_weights", False)
        batch, _ = collate_graphs_blocksparse_clustered([entry], with_edge_weights=weighted, slot8=True)
        batch = jax.device_put(batch)
        step_s = _measure(cls(feat_dim, 2, edge_dim), batch, steps_per_call=250, calls=2)
        # adjacency-stream roofline (full + pooled block streams, read twice
        # — fwd + symmetric-VJP bwd; the slot8 layout carries ~+10 % blocks
        # vs the unslotted order and the bound prices the REAL stream).
        # NOTE round 5: the KBATCH=8 layout stores ~22 % fewer padded
        # blocks than round 4's KBATCH=16, so this denominator SHRANK while
        # the step got faster — compare step_ms/edges_per_s across rounds,
        # not this percentage.
        adj_bytes = 2 * (batch.structure.blocks_t.nbytes + batch.structure_p.blocks_t.nbytes)
        bound_s = adj_bytes / 819e9
        # component floor: the stream plus the kernel's measured per-sub-
        # batch overhead (60-62 ns/sub, solved from profiled train steps at
        # two run-padding geometries — tests/perf/clustered_bcsr_perf.py
        # --pin protocol note) plus the pooling stages' own floors (slot
        # kernel HBM stream; member gathers at the measured ~1.3 ns/row
        # XLA row-gather rate, round 3). Everything here recomputes from
        # the live batch shapes; only the two rates are pinned constants.
        subs = batch.structure.num_blocks / batch.structure.kbatch + batch.structure_p.num_blocks / batch.structure_p.kbatch
        h_bytes = 32 * batch.structure.padded_nodes * 4
        slotpool_s = (2 * h_bytes + 3 * h_bytes / 8) / 819e9  # fwd read + bwd read/write + compact-side traffic
        gather_rows = batch.members0s.size + batch.slot_cluster.size + 2 * batch.members1.size
        combine_s = gather_rows * 1.3e-9
        floor_s = bound_s + 2 * subs * 62e-9 + slotpool_s + combine_s
        out[key] = {
            "edges_per_s": round(real_edges / step_s, 1),
            "step_ms": round(step_s * 1e3, 3),
            "adj_stream_bound_ms": round(bound_s * 1e3, 3),
            "pct_of_adj_stream_bound": round(100.0 * bound_s / step_s, 1),
            "component_floor_ms": round(floor_s * 1e3, 3),
            "pct_of_component_floor": round(100.0 * floor_s / step_s, 1),
        }
        if key == "ginet":
            # bf16 fast-training variant (single-pass MXU instead of the
            # near-f32 hi/lo pair; same convention as the dense/bcsr rows)
            import jax.numpy as jnp

            step16_s = _measure(cls(feat_dim, 2, edge_dim, compute_dtype=jnp.bfloat16), batch, steps_per_call=250, calls=2)
            out[key]["bf16"] = {
                "edges_per_s": round(real_edges / step16_s, 1),
                "step_ms": round(step16_s * 1e3, 3),
            }
    out.update(out["ginet"])
    return out


def clustered_ppi_result() -> dict:
    """The clustered model family at PPI scale (512 graphs x 160 nodes) on
    the graph-diagonal + slot-pool machinery: GINetClusteredDiag,
    FoutNetDiag, SGATDiag. The batched dense clustered formulations measure
    ~10.0-10.6 ms on this batch (G*N-row scatters — recorded round-4
    measurements, tests/perf/diag_clustered_perf.py --batched); these paths
    replace every scatter with slot-aligned kernels. GINet's numbers stay at
    the top level (continuity), each model gets a sub-object."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNetDiag
    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetClusteredDiag
    from deeprank2_tpu.neuralnets.gnn.sgat import SGATDiag
    from deeprank2_tpu.ops.batch import collate_graphs_diag_clustered
    from tests.perf.diag_clustered_perf import ppi_clustered_entries

    feat_dim = 38
    entries = ppi_clustered_entries(feat_dim=feat_dim)
    real_edges = 2 * sum(e["edge_index"].shape[0] for e in entries)

    # recorded round-4 batched-dense measurements per model (the formulation
    # these fast paths replace), tests/perf/diag_clustered_perf.py --batched
    batched_ref_ms = {"ginet": 10.58, "foutnet": 10.04, "sgat": 10.14}
    out: dict = {"num_graphs": len(entries)}
    for key, cls in (("ginet", GINetClusteredDiag), ("foutnet", FoutNetDiag), ("sgat", SGATDiag)):
        weighted = key == "sgat"
        batch, _ = collate_graphs_diag_clustered(entries, with_edge_weights=weighted)
        batch = jax.device_put(batch)
        step_s = _measure(cls(feat_dim, 2, 1), batch, steps_per_call=250, calls=2)
        out[key] = {
            "edges_per_s": round(real_edges / step_s, 1),
            "step_ms": round(step_s * 1e3, 3),
            "batched_dense_step_ms_r4": batched_ref_ms[key],
        }
    out.update(out["ginet"])
    return out


def cnn_result(batch_size: int = 128) -> dict:
    """CnnClassification train step (reference grid protocol: 35x30x30 boxes,
    33 mapped features) against its HBM-stream floor.

    Why HBM is the honest floor (the blocked_decompose discipline — price
    the binding constraint, not a convenient one): the conv stack does ~7
    MACs per streamed byte (conv1: 1056 MACs per 132-byte input column),
    far below the v5e ridge (~120 MACs/byte at bf16 peak), so an ideal
    kernel is bandwidth-bound; the MAC term at peak is ~0.1 ms vs the
    ~1.6 ms stream. The floor prices each tensor crossing HBM once per use
    (x read fwd + once more for conv1's weight-grad; h1 written fwd and
    read/written through the pool backward and weight-grad; conv2/pool2/FC
    terms analogous, all small). XLA's actual conv3d lowering is
    compute-limited at C_out=4/5 (~6 % MXU utilization — round-4 profile,
    tests/perf/cnn_perf.py), which is what the gap to 100 % is made of."""
    import jax

    from deeprank2_tpu.neuralnets.cnn.model3d import CnnClassification
    from tests.perf.cnn_perf import cnn_hbm_floor_bytes, grid_batch
    from tests.perf.sol_perf import DEFAULT_PEAK_GBPS, PEAK_HBM_GBPS

    num_features, box = 33, (35, 30, 30)
    batch = jax.device_put(grid_batch(batch_size, num_features, box))
    step_s = _measure(CnnClassification(num_features, box), batch, steps_per_call=50, calls=4)
    device = jax.devices()[0]
    peak = PEAK_HBM_GBPS.get(getattr(device, "device_kind", ""), DEFAULT_PEAK_GBPS)
    floor_s = cnn_hbm_floor_bytes(batch_size, num_features, box) / (peak * 1e9)
    return {
        "batch_size": batch_size,
        "box": list(box),
        "num_features": num_features,
        "grids_per_s": round(batch_size / step_s, 1),
        "step_ms": round(step_s * 1e3, 3),
        "hbm_floor_ms": round(floor_s * 1e3, 3),
        "pct_of_hbm_floor": round(100.0 * floor_s / step_s, 1),
    }


def featurization_result() -> dict:
    """Featurization speed on the vendored 1ATN corpus, reference protocol
    (/root/reference/tests/perf/ppi_perf.py:22-34: atomic resolution, 5.5 Å
    cutoff, the 6-module feature set; grid 35x30x30 Gaussian) — makes the
    README's featurization-speedup claims driver-visible round-over-round.
    Reference baselines (README.md / BASELINE.md, Apple M1 Pro, 1 CPU):
    graph-only 2.99 s/structure, graph+grid 11.35 s/structure."""
    import glob
    import os

    from tests.perf.ppi_perf import run

    from tests.perf.srv_perf import run as srv_run

    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "tests", "data", "pdb", "1ATN", "*.pdb")))
    graph = run(files)
    grid = run(files[:2], with_grid=True)
    # SRV protocol (reference srv_perf.py:67-81): 10 A residue graphs around
    # variant residues of the vendored 101M
    srv_pdb = os.path.join(root, "tests", "data", "pdb", "101M", "101M.pdb")
    srv_graph = srv_run(srv_pdb, [20, 25, 27, 64, 89, 101, 118, 136])
    srv_grid = srv_run(srv_pdb, [20, 25, 27], with_grid=True)
    return {
        "protocol": "atomic, 5.5A, 6 feature modules (reference ppi_perf); SRV 10A residue (srv_perf)",
        "graph_s_per_structure": round(graph["time_mean_s"], 3),
        "graph_std_s": round(graph["time_std_s"], 3),
        "graph_mb_per_structure": round(graph["mb_mean"], 3),
        "graph_grid_s_per_structure": round(grid["time_mean_s"], 3),
        "ref_graph_s_per_structure": 2.99,
        "ref_graph_grid_s_per_structure": 11.35,
        "speedup_graph": round(2.99 / graph["time_mean_s"], 1),
        "speedup_graph_grid": round(11.35 / grid["time_mean_s"], 1),
        "srv_graph_s_per_structure": round(srv_graph["time_mean_s"], 3),
        "srv_graph_grid_s_per_structure": round(srv_grid["time_mean_s"], 3),
        "ref_srv_graph_s_per_structure": 2.20,
        "ref_srv_graph_grid_s_per_structure": 2.85,
        "speedup_srv_graph": round(2.20 / srv_graph["time_mean_s"], 1),
        "speedup_srv_graph_grid": round(2.85 / srv_grid["time_mean_s"], 1),
    }


def main() -> None:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    dense = dense_result()
    bcsr = bcsr_result()
    blocked = blocked_result()
    clustered = clustered_result()
    clustered_ppi = clustered_ppi_result()
    cnn = cnn_result()
    featurization = featurization_result()
    print(
        json.dumps(
            {
                "metric": "ginet_train_edges_per_s",
                "value": dense["edges_per_s"],
                "unit": "edges/s",
                # vs_baseline == pct_sol: the dense step's fraction of its HBM
                # bound. (Definition changed in round 2 — round-1 BENCH files
                # used a ratio to a 1M-edges/s floor; compare r01 via
                # edges_per_s, not vs_baseline.)
                "vs_baseline": round(dense["pct_speed_of_light"] / 100.0, 3),
                "pct_sol": round(dense["pct_speed_of_light"] / 100.0, 3),
                "dense": dense,
                "bcsr": bcsr,
                "blocked": blocked,
                "clustered": clustered,
                "clustered_ppi": clustered_ppi,
                "cnn": cnn,
                "featurization": featurization,
            }
        )
    )


if __name__ == "__main__":
    main()
