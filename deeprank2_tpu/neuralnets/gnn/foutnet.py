"""FoutNet (reference: neuralnets/gnn/foutnet.py; Fout et al., NIPS 2018).

Layer math: ``z = x Wc + mean_neighbors(x Wn) + b``. The reference computes the
neighbor mean with a Python loop over nodes (foutnet.py:55-58, its documented
hot spot); here it is one segment-mean over the edge array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.batch import GraphBatch
from deeprank2_tpu.ops.pooling import community_pool, graph_mean_pool, max_pool_x
from deeprank2_tpu.ops.segment import segment_mean


def init_fout_layer(rng: jax.Array, in_channels: int, out_channels: int, bias: bool = True) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    bound = 1.0 / jnp.sqrt(in_channels)
    params = {
        "wc": jax.random.uniform(k1, (in_channels, out_channels), minval=-bound, maxval=bound, dtype=jnp.float32),
        "wn": jax.random.uniform(k2, (in_channels, out_channels), minval=-bound, maxval=bound, dtype=jnp.float32),
    }
    if bias:
        params["b"] = jax.random.uniform(k3, (out_channels,), minval=-bound, maxval=bound, dtype=jnp.float32)
    return params


def fout_layer(
    params: dict,
    x: jnp.ndarray,
    edge_index: jnp.ndarray,
    edge_mask: jnp.ndarray,
) -> jnp.ndarray:
    row, col = edge_index
    capacity = x.shape[0]
    alpha = x @ params["wc"]
    beta = x @ params["wn"]
    safe_col = jnp.clip(col, 0, capacity - 1)
    neigh = beta[safe_col] * edge_mask[:, None]
    # mean over neighbors j of each row node (masked edges dropped via OOB row)
    row_or_oob = jnp.where(edge_mask, row, capacity)
    gamma = segment_mean(neigh, row_or_oob, capacity)
    out = alpha + gamma
    if "b" in params:
        out = out + params["b"]
    return out


def fout_layer_dense(params: dict, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """Fout layer on ``[G, N, F]`` blocks: the neighbor mean is the
    row-normalized batched matmul ``(adj @ x Wn) / deg`` (MXU; the reference's
    per-node Python loop, foutnet.py:55-58, and the COO segment-mean both
    compute the same quantity)."""
    alpha = x @ params["wc"]
    beta = x @ params["wn"]
    deg = jnp.maximum(adj.sum(axis=-1, dtype=jnp.float32), 1.0)  # [G, N] (f32: exact counts for bf16 adj)
    gamma = (adj @ beta) / deg[:, :, None]
    out = alpha + gamma
    if "b" in params:
        out = out + params["b"]
    return out


class FoutNet:
    """FoutLayer x2 with community pooling."""

    needs_clusters = True
    clustering = "mcl"

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int | None = None):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 4)
        return {
            "conv1": init_fout_layer(keys[0], self.input_shape, 16),
            "conv2": init_fout_layer(keys[1], 16, 32),
            "fc1": nn.init_linear(keys[2], 32, 64),
            "fc2": nn.init_linear(keys[3], 64, self.output_shape),
        }

    def apply(self, params: dict, batch: GraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        act = nn.relu
        x = act(fout_layer(params["conv1"], batch.x, batch.edge_index, batch.edge_mask))
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

        x = act(fout_layer(params["conv2"], x, ei, em))
        x = x * node_mask[:, None]

        x, pooled_graph = max_pool_x(batch.cluster1, x, node_graph, batch.num_graphs)
        x = graph_mean_pool(x, pooled_graph, batch.num_graphs)
        x = act(nn.linear(params["fc1"], x))
        return nn.linear(params["fc2"], x)


class FoutNetDiag:
    """FoutNet at PPI scale on the graph-diagonal + slot-pool machinery (see
    :class:`deeprank2_tpu.neuralnets.gnn.ginet_dense.GINetClusteredDiag` —
    same batch layout and pooling pipeline; the conv is the FoutLayer
    ``x Wc + (A @ x Wn)/deg`` with the aggregation on the diagonal Pallas
    kernel). Replaces the scatter-bound :class:`FoutNetDense` step on
    bench-shaped batches; parameters interchange with the COO FoutNet.

    Reference: neuralnets/gnn/foutnet.py:43-60."""

    needs_clusters = True
    diag_clustered_batches = True
    clustering = "mcl"

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int | None = None, compute_dtype=None):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.compute_dtype = compute_dtype
        self._coo = FoutNet(input_shape, output_shape, input_shape_edge)

    def init(self, rng: jax.Array) -> dict:
        return self._coo.init(rng)

    def apply(self, params: dict, batch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        from deeprank2_tpu.ops.diag_spmm import diag_spmm_t
        from deeprank2_tpu.ops.pooling import diag_depth0_pool, member_max_pool
        from deeprank2_tpu.ops.segment import segment_max, segment_mean

        def fout_t(p, x_t, adj_i8, deg, mask_row):
            alpha = jnp.dot(p["wc"].T, x_t)
            beta = jnp.dot(p["wn"].T, x_t)
            gamma = diag_spmm_t(adj_i8, beta, self.compute_dtype) / jnp.maximum(deg, 1.0)[None, :]
            out = alpha + gamma
            if "b" in p:
                out = out + p["b"][:, None]
            return nn.relu(out) * mask_row

        g, n, _ = batch.adj_i8.shape
        mask_row = batch.node_mask.astype(jnp.float32).reshape(1, g * n)
        h_t = fout_t(params["conv1"], batch.x_t, batch.adj_i8, batch.deg, mask_row)

        k_cap = batch.pooled_mask.shape[1]
        hp_t = diag_depth0_pool(h_t, batch)

        pooled_mask_row = batch.pooled_mask.astype(jnp.float32).reshape(1, g * k_cap)
        h2_t = fout_t(params["conv2"], hp_t, batch.adj_p_i8, batch.deg_p, pooled_mask_row)

        c1_cap = batch.c1_graph.shape[0]
        if batch.members1.size:
            hc = member_max_pool(h2_t.T, batch.members1, batch.cluster1)
        else:
            hc = segment_max(h2_t.T, batch.cluster1, c1_cap)
        pooled = segment_mean(hc, batch.c1_graph, batch.num_graphs)
        out = nn.relu(nn.linear(params["fc1"], pooled))
        return nn.linear(params["fc2"], out)


class FoutNetDense:
    """FoutNet over block-dense batches (see ops/batch.py:DenseGraphBatch):
    convs and community pooling are batched MXU matmuls."""

    needs_clusters = True
    dense_batches = True
    clustering = "mcl"

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int | None = None):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 4)
        return {
            "conv1": init_fout_layer(keys[0], self.input_shape, 16),
            "conv2": init_fout_layer(keys[1], 16, 32),
            "fc1": nn.init_linear(keys[2], 32, 64),
            "fc2": nn.init_linear(keys[3], 64, self.output_shape),
        }

    def apply(self, params: dict, batch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        from deeprank2_tpu.neuralnets.gnn.ginet_dense import dense_masked_graph_mean
        from deeprank2_tpu.ops.pooling import dense_community_pool, dense_segment_max

        act = nn.relu
        x = act(fout_layer_dense(params["conv1"], batch.x, batch.adj))
        x = x * batch.node_mask[:, :, None]

        x, _pos, adj1, _adj_w, mask1 = dense_community_pool(x, batch.pos, batch.adj, batch.cluster0)

        x = act(fout_layer_dense(params["conv2"], x, adj1))
        x = x * mask1[:, :, None]

        x = dense_segment_max(x, batch.cluster1)
        counts1 = dense_segment_max(mask1[:, :, None].astype(x.dtype), batch.cluster1)[:, :, 0]
        x = dense_masked_graph_mean(x, counts1 > 0)
        x = act(nn.linear(params["fc1"], x))
        return nn.linear(params["fc2"], x)
