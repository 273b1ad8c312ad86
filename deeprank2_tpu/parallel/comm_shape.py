"""Communication-shape analysis of the multi-chip paths.

Compiles the sharded train/forward programs for a given device count and
reports, from the optimized HLO, how many collectives of each kind they issue
and how many bytes ride them. This is the harness that keeps the first real
multi-chip run turn-key: the *shape* of the communication (op counts, halo
bytes, how they scale with the mesh) is validated as a regression test on the
virtual CPU mesh, where timing is meaningless but structure is exact.

The reference has no distributed backend at all (SURVEY §2.2); these programs
are the TPU-native scale-out design (DP via shard_map+pmean, edge-partitioned
graph parallelism with all_gather halos, block-sparse ppermute ring).
"""

from __future__ import annotations

import re
from typing import Any

COLLECTIVE_OPS = ("all-reduce", "all-gather", "collective-permute", "all-to-all", "reduce-scatter")

_DTYPE_BYTES = {
    "f64": 8, "s64": 8, "u64": 8,
    "f32": 4, "s32": 4, "u32": 4,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_OP_RE = re.compile(
    r"=\s+(?P<type>\([^)]*\)|\S+)\s+(?P<op>" + "|".join(COLLECTIVE_OPS) + r")(?P<start>-start)?\("
)
_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _type_bytes(type_str: str) -> int:
    """Total bytes of an HLO result type (handles tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> dict[str, dict[str, int]]:
    """Count collectives and their result bytes in optimized HLO text."""
    stats = {op: {"count": 0, "bytes": 0} for op in COLLECTIVE_OPS}
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if m:
            stats[m.group("op")]["count"] += 1
            stats[m.group("op")]["bytes"] += _type_bytes(m.group("type"))
    return stats


def compiled_stats(jitted, *args) -> dict[str, dict[str, int]]:
    """Lower + compile a jitted callable on real args; parse its collectives."""
    compiled = jitted.lower(*args).compile()
    return collective_stats(compiled.as_text())


# ---------------------------------------------------------------------------
# Per-path reports
# ---------------------------------------------------------------------------


def dp_train_report(num_shards: int, graphs_per_shard: int = 4, nodes: int = 32) -> dict[str, Any]:
    """Collective shape of the dense DP train step at ``num_shards``."""
    import jax
    import jax.numpy as jnp

    from deeprank2_tpu.neuralnets.gnn.ginet_dense import GINetDense
    from deeprank2_tpu.ops.batch import collate_graphs_dense_sharded
    from deeprank2_tpu.ops.losses import CrossEntropyLoss
    from deeprank2_tpu.ops.optim import Adam
    from deeprank2_tpu.ops.synthetic import synthetic_entries
    from deeprank2_tpu.parallel.dp import default_mesh, make_dp_train_step

    feat_dim, edge_dim = 7, 3
    model = GINetDense(feat_dim, 2, edge_dim)
    optimizer = Adam(lr=1e-3)
    loss_fn = CrossEntropyLoss()

    def compute_loss(params, batch, rng, training):
        pred = model.apply(params, batch, training=training, rng=rng)
        return loss_fn(pred, batch.y.astype(jnp.int32), batch.y_mask), pred

    entries = synthetic_entries(graphs_per_shard * num_shards, nodes, feat_dim, edge_dim, seed=3)
    batch, _ = collate_graphs_dense_sharded(entries, num_shards, graphs_per_shard, pad_nodes=nodes)
    mesh = default_mesh(devices=jax.devices()[:num_shards])
    step = make_dp_train_step(compute_loss, optimizer, mesh=mesh)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = optimizer.init(params)
    stats = compiled_stats(step, params, opt_state, jax.random.PRNGKey(1), batch)
    return {"path": "dp_dense_train", "shards": num_shards, **stats}


def edge_partition_report(num_shards: int, ring: bool = False, num_graphs: int = 4, nodes_per_graph: int = 48) -> dict[str, Any]:
    """Collective shape of the edge-partitioned (or ring) GINet forward."""
    import jax

    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs
    from deeprank2_tpu.ops.synthetic import synthetic_entries
    from deeprank2_tpu.parallel.dp import default_mesh
    from deeprank2_tpu.parallel.edge_partition import (
        make_edge_partitioned_ginet_forward,
        make_ring_ginet_forward,
        partition_graph_batch,
        partition_graph_batch_ring,
    )

    feat_dim, edge_dim = 7, 3
    entries = synthetic_entries(num_graphs, nodes_per_graph, feat_dim, edge_dim, seed=5)
    batch, _ = collate_graphs(entries)
    mesh = default_mesh(devices=jax.devices()[:num_shards])
    model = GINet(feat_dim, 2, edge_dim)
    params = model.init(jax.random.PRNGKey(0))
    if ring:
        part = partition_graph_batch_ring(batch, num_shards)
        fwd = make_ring_ginet_forward(model, mesh=mesh)
    else:
        part = partition_graph_batch(batch, num_shards)
        fwd = make_edge_partitioned_ginet_forward(model, mesh=mesh)
    stats = compiled_stats(fwd, params, part)
    return {"path": "ring_halo_fwd" if ring else "edge_partition_fwd", "shards": num_shards, **stats}


def blocksparse_ring_report(num_shards: int, seed: int = 1) -> dict[str, Any]:
    """Collective shape of the block-sparse ppermute-ring forward."""
    import jax
    import numpy as np
    from scipy.spatial import cKDTree

    from deeprank2_tpu.neuralnets.gnn.ginet_blocksparse import GINetBlockSparse
    from deeprank2_tpu.ops.batch import collate_graphs_blocksparse
    from deeprank2_tpu.parallel.blocksparse_partition import (
        make_blocksparse_ginet_ring_forward,
        partition_blocksparse_batch_ring,
    )
    from deeprank2_tpu.parallel.dp import default_mesh

    rng = np.random.default_rng(seed)
    entries = []
    for g in range(2):
        n = 260 + 40 * g
        pos = rng.uniform(0, 25, size=(n, 3))
        pairs = cKDTree(pos).query_pairs(5.0, output_type="ndarray")
        entries.append(
            {
                "x": rng.normal(size=(n, 7)).astype(np.float32),
                "edge_index": pairs.astype(np.int64),
                "edge_attr": rng.normal(size=(len(pairs), 3)).astype(np.float32),
                "pos": pos.astype(np.float32),
                "y": float(g % 2),
                "entry_name": f"g{g}",
            }
        )
    batch, _ = collate_graphs_blocksparse(entries)
    ring = partition_blocksparse_batch_ring(batch, num_shards)
    mesh = default_mesh(devices=jax.devices()[:num_shards])
    model = GINetBlockSparse(7, 2, 3)
    params = model.init(jax.random.PRNGKey(0))
    fwd = make_blocksparse_ginet_ring_forward(model, mesh=mesh)
    stats = compiled_stats(fwd, params, ring)
    return {"path": "blocksparse_ring_fwd", "shards": num_shards, **stats}
