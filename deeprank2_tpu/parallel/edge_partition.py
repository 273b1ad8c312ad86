"""Edge-partitioned graph parallelism over a device mesh.

The scale-out axis for graphs too large (or batches too wide) for one chip
(BASELINE north star; the reference has no equivalent — nn.DataParallel is its
only multi-device mode):

- node rows are sharded contiguously across the mesh axis; every device owns
  ``V / D`` rows of the node features;
- edges are partitioned by their *destination* row's owner, so the segment-sum
  aggregation is entirely local;
- the only communication per layer is an ``all_gather`` of the (already
  node-transformed, low-dimensional) per-node tensors over ICI, overlapped by
  XLA with the local gather/compute.

``partition_graph_batch`` reshapes a padded :class:`GraphBatch` into per-device
shards; :func:`make_edge_partitioned_ginet_forward` runs the (no-cluster) GINet
dual-tower forward under ``shard_map`` and returns per-graph outputs replicated
on every device.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.batch import GraphBatch
from deeprank2_tpu.ops.segment import segment_mean, segment_sum
from deeprank2_tpu.parallel.dp import default_mesh


@jax.tree_util.register_dataclass
@dataclass
class EdgePartitionedBatch:
    """A GraphBatch re-laid-out for edge partitioning.

    All arrays carry a leading device axis ``D``; rows are *local* (relative to
    the shard's node base), cols are *global* node indices.
    """

    x: jax.Array  # f32 [D, Vd, F] sharded node features
    edge_row_local: jax.Array  # i32 [D, Ed] local destination row (OOB = Vd)
    edge_col: jax.Array  # i32 [D, Ed] global source node (OOB = V)
    edge_attr: jax.Array  # f32 [D, Ed, Fe]
    edge_mask: jax.Array  # bool [D, Ed]
    node_graph: jax.Array  # i32 [D, Vd] graph id per local node (OOB = G)
    node_mask: jax.Array  # bool [D, Vd]
    num_graphs: int = field(metadata={"static": True})


def partition_graph_batch(batch: GraphBatch, num_shards: int) -> EdgePartitionedBatch:
    """Shard a padded GraphBatch by node rows / destination-edge owner."""
    num_nodes = batch.num_nodes
    v_per = -(-num_nodes // num_shards)
    v_cap = v_per * num_shards

    x = np.asarray(batch.x)
    if v_cap > num_nodes:
        pad = v_cap - num_nodes
        x = np.pad(x, ((0, pad), (0, 0)))
        node_graph = np.pad(np.asarray(batch.node_graph), (0, pad), constant_values=batch.num_graphs)
        node_mask = np.pad(np.asarray(batch.node_mask), (0, pad))
    else:
        node_graph = np.asarray(batch.node_graph)
        node_mask = np.asarray(batch.node_mask)

    rows = np.asarray(batch.edge_index[0])
    cols = np.asarray(batch.edge_index[1])
    mask = np.asarray(batch.edge_mask)
    owner = np.where(mask, rows // v_per, -1)

    counts = [int((owner == d).sum()) for d in range(num_shards)]
    e_per = max(max(counts), 1)

    edge_row_local = np.full((num_shards, e_per), v_per, dtype=np.int32)
    edge_col = np.full((num_shards, e_per), v_cap, dtype=np.int32)
    edge_attr = np.zeros((num_shards, e_per, batch.edge_attr.shape[1]), dtype=np.float32)
    edge_mask = np.zeros((num_shards, e_per), dtype=bool)
    for d in range(num_shards):
        sel = np.flatnonzero(owner == d)
        edge_row_local[d, : len(sel)] = rows[sel] - d * v_per
        edge_col[d, : len(sel)] = cols[sel]
        edge_attr[d, : len(sel)] = np.asarray(batch.edge_attr)[sel]
        edge_mask[d, : len(sel)] = True

    return EdgePartitionedBatch(
        x=x.reshape(num_shards, v_per, -1),
        edge_row_local=edge_row_local,
        edge_col=edge_col,
        edge_attr=edge_attr,
        edge_mask=edge_mask,
        node_graph=node_graph.reshape(num_shards, v_per),
        node_mask=node_mask.reshape(num_shards, v_per),
        num_graphs=batch.num_graphs,
    )


def _ginet_conv_sharded(params, x_local, batch: EdgePartitionedBatch, axis: str):
    """One GINet conv with sharded nodes: all_gather the per-node transforms,
    local gather + masked segment-sum (math identical to ginet.ginet_conv;
    attention elided — identically 1.0 with zero gradient, see ginet.py)."""
    v_local = x_local.shape[0]

    fcx_local = nn.linear(params["fc"], x_local)  # [Vd, out]

    # ICI collective: gather the (low-dim) transformed node tensor
    fcx_full = jax.lax.all_gather(fcx_local, axis, axis=0, tiled=True)  # [V, out]

    row = batch.edge_row_local[0]
    col = batch.edge_col[0]
    mask = batch.edge_mask[0]
    safe_col = jnp.clip(col, 0, fcx_full.shape[0] - 1)

    h = fcx_full[safe_col]
    h = h * mask[:, None]
    return segment_sum(h, row, v_local)


def make_edge_partitioned_ginet_forward(model, mesh: Mesh | None = None, axis: str = "gp"):
    """Jitted edge-partitioned forward for the no-cluster GINet.

    Returns ``fn(params, part_batch) -> [G, out]`` with the output replicated.
    """
    mesh = mesh or default_mesh(axis)
    axis = mesh.axis_names[0]  # follow the mesh's own axis name

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_rep=False,
    )
    def forward(params, part):
        x_local = part.x[0]
        node_graph = part.node_graph[0]
        node_mask = part.node_mask[0]

        def tower(conv1, conv2):
            h = nn.relu(_ginet_conv_sharded(conv1, x_local, part, axis))
            h = nn.relu(_ginet_conv_sharded(conv2, h, part, axis))
            h = h * node_mask[:, None]
            # per-graph mean over ALL shards: psum of sums and counts
            sums = segment_sum(h, node_graph, part.num_graphs)
            counts = segment_sum(node_mask.astype(jnp.float32), node_graph, part.num_graphs)
            sums = jax.lax.psum(sums, axis)
            counts = jax.lax.psum(counts, axis)
            return sums / jnp.maximum(counts, 1.0)[:, None]

        pooled = tower(params["conv1"], params["conv2"])
        pooled_ext = tower(params["conv1_ext"], params["conv2_ext"])
        h = jnp.concatenate([pooled, pooled_ext], axis=1)
        h = nn.relu(nn.linear(params["fc1"], h))
        return nn.linear(params["fc2"], h)

    return jax.jit(forward)


@jax.tree_util.register_dataclass
@dataclass
class RingPartitionedBatch:
    """Edge partition bucketed by (destination owner, source owner) for the
    ppermute ring: shard ``d``'s bucket ``s`` holds the edges whose destination
    lives on ``d`` and whose source lives on ``s``, with *source-local* column
    indices — so ring step ``k`` (holding shard ``(d - k) % D``'s node block)
    aggregates bucket ``(d - k) % D`` directly from the rotating buffer.
    """

    x: jax.Array  # f32 [D, Vd, F]
    edge_row_local: jax.Array  # i32 [D, S, Eb] destination row, local to d (OOB = Vd)
    edge_col_local: jax.Array  # i32 [D, S, Eb] source row, local to s (OOB = Vd)
    edge_mask: jax.Array  # bool [D, S, Eb]
    node_graph: jax.Array  # i32 [D, Vd]
    node_mask: jax.Array  # bool [D, Vd]
    num_graphs: int = field(metadata={"static": True})


def partition_graph_batch_ring(batch: GraphBatch, num_shards: int) -> RingPartitionedBatch:
    """Bucket a padded GraphBatch by (dest owner, source owner) for ring halo
    exchange. Bucket capacity is the max over all (d, s) pairs."""
    num_nodes = batch.num_nodes
    v_per = -(-num_nodes // num_shards)
    v_cap = v_per * num_shards

    x = np.asarray(batch.x)
    node_graph = np.asarray(batch.node_graph)
    node_mask = np.asarray(batch.node_mask)
    if v_cap > num_nodes:
        pad = v_cap - num_nodes
        x = np.pad(x, ((0, pad), (0, 0)))
        node_graph = np.pad(node_graph, (0, pad), constant_values=batch.num_graphs)
        node_mask = np.pad(node_mask, (0, pad))

    rows = np.asarray(batch.edge_index[0])
    cols = np.asarray(batch.edge_index[1])
    mask = np.asarray(batch.edge_mask)
    dest_owner = np.where(mask, rows // v_per, -1)
    src_owner = np.where(mask, cols // v_per, -1)

    counts = np.zeros((num_shards, num_shards), dtype=np.int64)
    for d in range(num_shards):
        for s in range(num_shards):
            counts[d, s] = int(((dest_owner == d) & (src_owner == s)).sum())
    e_cap = max(int(counts.max()), 1)

    edge_row_local = np.full((num_shards, num_shards, e_cap), v_per, dtype=np.int32)
    edge_col_local = np.full((num_shards, num_shards, e_cap), v_per, dtype=np.int32)
    edge_mask = np.zeros((num_shards, num_shards, e_cap), dtype=bool)
    for d in range(num_shards):
        for s in range(num_shards):
            sel = np.flatnonzero((dest_owner == d) & (src_owner == s))
            edge_row_local[d, s, : len(sel)] = rows[sel] - d * v_per
            edge_col_local[d, s, : len(sel)] = cols[sel] - s * v_per
            edge_mask[d, s, : len(sel)] = True

    return RingPartitionedBatch(
        x=x.reshape(num_shards, v_per, -1),
        edge_row_local=edge_row_local,
        edge_col_local=edge_col_local,
        edge_mask=edge_mask,
        node_graph=node_graph.reshape(num_shards, v_per),
        node_mask=node_mask.reshape(num_shards, v_per),
        num_graphs=batch.num_graphs,
    )


def _ginet_conv_ring(params, x_local, part: RingPartitionedBatch, axis: str, num_shards: int):
    """One GINet conv with ring halo exchange: the transformed node block
    rotates around the ring via ``ppermute`` while each step's local
    segment-sum aggregates the matching source bucket — peak memory stays
    [Vd, F] (vs [V, F] for all_gather) and each hop overlaps with compute."""
    v_local = x_local.shape[0]
    fcx_local = nn.linear(params["fc"], x_local)  # [Vd, out]
    my = jax.lax.axis_index(axis)

    rows = part.edge_row_local[0]  # [S, Eb]
    cols = part.edge_col_local[0]
    masks = part.edge_mask[0]

    def bucket_contrib(buf, source_shard):
        row = jax.lax.dynamic_index_in_dim(rows, source_shard, keepdims=False)
        col = jax.lax.dynamic_index_in_dim(cols, source_shard, keepdims=False)
        msk = jax.lax.dynamic_index_in_dim(masks, source_shard, keepdims=False)
        h = buf[jnp.clip(col, 0, v_local - 1)] * msk[:, None]
        return segment_sum(h, row, v_local)

    perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]

    def step(k, carry):
        acc, buf = carry
        source_shard = (my - k) % num_shards
        acc = acc + bucket_contrib(buf, source_shard)
        buf = jax.lax.ppermute(buf, axis, perm)
        return acc, buf

    acc = jnp.zeros((v_local, fcx_local.shape[1]), dtype=fcx_local.dtype)
    acc, _ = jax.lax.fori_loop(0, num_shards, step, (acc, fcx_local))
    return acc


def make_ring_ginet_forward(model, mesh: Mesh | None = None, axis: str = "gp"):
    """Jitted ring-halo-exchange forward for the no-cluster GINet.

    Returns ``fn(params, ring_batch) -> [G, out]`` with the output replicated.
    """
    mesh = mesh or default_mesh(axis)
    axis = mesh.axis_names[0]
    num_shards = mesh.devices.size

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_rep=False,
    )
    def forward(params, part):
        x_local = part.x[0]
        node_graph = part.node_graph[0]
        node_mask = part.node_mask[0]

        def tower(conv1, conv2):
            h = nn.relu(_ginet_conv_ring(conv1, x_local, part, axis, num_shards))
            h = nn.relu(_ginet_conv_ring(conv2, h, part, axis, num_shards))
            h = h * node_mask[:, None]
            sums = segment_sum(h, node_graph, part.num_graphs)
            counts = segment_sum(node_mask.astype(jnp.float32), node_graph, part.num_graphs)
            sums = jax.lax.psum(sums, axis)
            counts = jax.lax.psum(counts, axis)
            return sums / jnp.maximum(counts, 1.0)[:, None]

        pooled = tower(params["conv1"], params["conv2"])
        pooled_ext = tower(params["conv1_ext"], params["conv2_ext"])
        h = jnp.concatenate([pooled, pooled_ext], axis=1)
        h = nn.relu(nn.linear(params["fc1"], h))
        return nn.linear(params["fc2"], h)

    return jax.jit(forward)


def edge_partition_scaling_report(num_shards: int, num_graphs: int = 8, nodes_per_graph: int = 48) -> dict:
    """Correctness + timing harness: edge-partitioned forward vs single-device."""
    import time

    from deeprank2_tpu.ops.synthetic import synthetic_entries as _synthetic_entries
    from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet
    from deeprank2_tpu.ops.batch import collate_graphs

    feat_dim, edge_dim = 38, 6
    model = GINet(feat_dim, 2, edge_dim)
    params = model.init(jax.random.PRNGKey(0))
    entries = _synthetic_entries(num_graphs, nodes_per_graph, feat_dim, edge_dim)
    batch, _ = collate_graphs(entries, pad_graphs=num_graphs)

    reference = np.asarray(model.apply(params, batch))

    mesh = default_mesh("gp", devices=jax.devices()[:num_shards])
    part = partition_graph_batch(batch, num_shards)
    forward = make_edge_partitioned_ginet_forward(model, mesh=mesh)
    out = forward(params, part)
    float(np.asarray(out).sum())  # value transfer: block_until_ready can return early on tunnel devices

    t0 = time.perf_counter()
    for _ in range(10):
        out = forward(params, part)
    float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / 10

    return {
        "num_shards": num_shards,
        "max_abs_err": float(np.abs(np.asarray(out) - reference).max()),
        "seconds_per_forward": dt,
    }
