"""Simplified graph attention network (reference: neuralnets/gnn/sgat.py).

Layer math: ``z_i = mean_j(e_ij * ([x_i || x_j] W)) + b`` where the edge
attribute multiplies the transformed pair feature (undirected: only the row
aggregation is used since both edge directions are present).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.batch import GraphBatch
from deeprank2_tpu.ops.pooling import community_pool, graph_mean_pool, max_pool_x
from deeprank2_tpu.ops.segment import segment_mean


def init_sgat_layer(rng: jax.Array, in_channels: int, out_channels: int, bias: bool = True) -> dict:
    k1, k2 = jax.random.split(rng)
    size = 2 * in_channels
    bound = 1.0 / jnp.sqrt(size)
    params = {"weight": jax.random.uniform(k1, (size, out_channels), minval=-bound, maxval=bound, dtype=jnp.float32)}
    if bias:
        params["b"] = jax.random.uniform(k2, (out_channels,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return params


def sgat_layer(
    params: dict,
    x: jnp.ndarray,
    edge_index: jnp.ndarray,
    edge_attr: jnp.ndarray,
    edge_mask: jnp.ndarray,
    undirected: bool = True,
) -> jnp.ndarray:
    row, col = edge_index
    capacity = x.shape[0]
    safe_row = jnp.clip(row, 0, capacity - 1)
    safe_col = jnp.clip(col, 0, capacity - 1)

    # [x_i || x_j] W == x_i W_top + x_j W_bottom, precomputed per node
    f = x.shape[1]
    row_part = x @ params["weight"][:f]  # [V, out]
    col_part = x @ params["weight"][f:]  # [V, out]
    alpha = row_part[safe_row] + col_part[safe_col]
    alpha = edge_attr * alpha  # broadcasting: edge_attr must be [E, 1] or [E, out]

    row_or_oob = jnp.where(edge_mask, row, capacity)
    out = segment_mean(alpha * edge_mask[:, None], row_or_oob, capacity)
    if not undirected:
        col_or_oob = jnp.where(edge_mask, col, capacity)
        out = out + segment_mean(alpha * edge_mask[:, None], col_or_oob, capacity)
    if "b" in params:
        out = out + params["b"]
    return out


class SGAT:
    """Two sGAT layers with community pooling."""

    needs_clusters = True
    clustering = "mcl"

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int | None = None):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 4)
        return {
            "conv1": init_sgat_layer(keys[0], self.input_shape, 16),
            "conv2": init_sgat_layer(keys[1], 16, 32),
            "fc1": nn.init_linear(keys[2], 32, 64),
            "fc2": nn.init_linear(keys[3], 64, self.output_shape),
        }

    def apply(self, params: dict, batch: GraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        act = nn.relu
        x = act(sgat_layer(params["conv1"], batch.x, batch.edge_index, batch.edge_attr, batch.edge_mask))
        x = x * batch.node_mask[:, None]

        x, pos, ei, ea, em, node_graph, node_mask = community_pool(
            x,
            batch.pos,
            batch.edge_index,
            batch.edge_attr,
            batch.edge_mask,
            batch.node_graph,
            batch.cluster0,
            batch.num_graphs,
        )

        x = act(sgat_layer(params["conv2"], x, ei, ea, em))
        x = x * node_mask[:, None]

        x, pooled_graph = max_pool_x(batch.cluster1, x, node_graph, batch.num_graphs)
        x = graph_mean_pool(x, pooled_graph, batch.num_graphs)
        x = act(nn.linear(params["fc1"], x))
        return nn.linear(params["fc2"], x)


class SGATDiag:
    """sGAT at PPI scale on the graph-diagonal + slot-pool machinery (see
    :class:`deeprank2_tpu.neuralnets.gnn.ginet_dense.GINetClusteredDiag`):
    the weighted aggregation streams the scalar-edge adjacency as bf16
    through the same diagonal Pallas kernel (the collate's
    ``weight_dtype=np.float32`` exact-oracle mode takes the XLA fallback,
    like the weighted BCSR variant), with the precomputed f32 row sums as
    the row-part coefficient. Replaces the scatter-bound :class:`SGATDense`
    step; parameters interchange with the COO SGAT.

    Reference: neuralnets/gnn/sgat.py:56-84."""

    needs_clusters = True
    diag_clustered_batches = True
    diag_clustered_edge_weights = True  # Trainer collates the weighted adjacency
    clustering = "mcl"

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int | None = None, compute_dtype=None):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.compute_dtype = compute_dtype
        self._coo = SGAT(input_shape, output_shape, input_shape_edge)

    def init(self, rng: jax.Array) -> dict:
        return self._coo.init(rng)

    def apply(self, params: dict, batch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        from deeprank2_tpu.ops.diag_spmm import diag_spmm_t
        from deeprank2_tpu.ops.pooling import diag_depth0_pool, member_max_pool
        from deeprank2_tpu.ops.segment import segment_max, segment_mean

        def sgat_t(p, x_t, adj_w, deg, wsum, mask_row):
            f = x_t.shape[0]
            row_part = jnp.dot(p["weight"][:f].T, x_t)
            col_part = jnp.dot(p["weight"][f:].T, x_t)
            agg = diag_spmm_t(adj_w, col_part, self.compute_dtype)
            out = (row_part * wsum[None, :] + agg) / jnp.maximum(deg, 1.0)[None, :]
            if "b" in p:
                out = out + p["b"][:, None]
            return nn.relu(out) * mask_row

        g, n, _ = batch.adj_i8.shape
        mask_row = batch.node_mask.astype(jnp.float32).reshape(1, g * n)
        h_t = sgat_t(params["conv1"], batch.x_t, batch.adj_w, batch.deg, batch.wsum, mask_row)

        k_cap = batch.pooled_mask.shape[1]
        hp_t = diag_depth0_pool(h_t, batch)

        pooled_mask_row = batch.pooled_mask.astype(jnp.float32).reshape(1, g * k_cap)
        h2_t = sgat_t(params["conv2"], hp_t, batch.adj_wp, batch.deg_p, batch.wsum_p, pooled_mask_row)

        c1_cap = batch.c1_graph.shape[0]
        if batch.members1.size:
            hc = member_max_pool(h2_t.T, batch.members1, batch.cluster1)
        else:
            hc = segment_max(h2_t.T, batch.cluster1, c1_cap)
        pooled = segment_mean(hc, batch.c1_graph, batch.num_graphs)
        out = nn.relu(nn.linear(params["fc1"], pooled))
        return nn.linear(params["fc2"], out)


def sgat_layer_dense(params: dict, x: jnp.ndarray, adj: jnp.ndarray, adj_w: jnp.ndarray) -> jnp.ndarray:
    """sGAT layer on ``[G, N, F]`` blocks with a scalar-edge-weighted adjacency:

        out_i = mean_j a_ij ([x_i || x_j] W) = (row_i * sum_j a_ij + (A_w col)_i) / deg_i

    where ``deg`` counts neighbors (the COO segment-mean denominator) and
    ``A_w`` carries the scalar edge weights (the reference broadcasts the edge
    attr over the message, sgat.py:56-84 — scalar edge features only)."""
    f = x.shape[-1]
    row_part = x @ params["weight"][:f]
    col_part = x @ params["weight"][f:]
    deg = jnp.maximum(adj.sum(axis=-1, dtype=jnp.float32), 1.0)  # [G, N] (f32: exact counts for bf16 adj)
    weight_sums = adj_w.sum(axis=-1)  # [G, N]
    out = (row_part * weight_sums[:, :, None] + adj_w @ col_part) / deg[:, :, None]
    if "b" in params:
        out = out + params["b"]
    return out


class SGATDense:
    """sGAT over block-dense batches (scalar edge feature, e.g. distance)."""

    needs_clusters = True
    dense_batches = True
    dense_edge_weights = True
    clustering = "mcl"

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int | None = None):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 4)
        return {
            "conv1": init_sgat_layer(keys[0], self.input_shape, 16),
            "conv2": init_sgat_layer(keys[1], 16, 32),
            "fc1": nn.init_linear(keys[2], 32, 64),
            "fc2": nn.init_linear(keys[3], 64, self.output_shape),
        }

    def apply(self, params: dict, batch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        from deeprank2_tpu.neuralnets.gnn.ginet_dense import dense_masked_graph_mean
        from deeprank2_tpu.ops.pooling import dense_community_pool, dense_segment_max

        act = nn.relu
        x = act(sgat_layer_dense(params["conv1"], batch.x, batch.adj, batch.adj_w))
        x = x * batch.node_mask[:, :, None]

        x, _pos, adj1, adj_w1, mask1 = dense_community_pool(x, batch.pos, batch.adj, batch.cluster0, adj_w=batch.adj_w)

        x = act(sgat_layer_dense(params["conv2"], x, adj1, adj_w1))
        x = x * mask1[:, :, None]

        x = dense_segment_max(x, batch.cluster1)
        counts1 = dense_segment_max(mask1[:, :, None].astype(x.dtype), batch.cluster1)[:, :, 0]
        x = dense_masked_graph_mean(x, counts1 > 0)
        x = act(nn.linear(params["fc1"], x))
        return nn.linear(params["fc2"], x)
