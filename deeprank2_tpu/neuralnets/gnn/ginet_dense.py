"""GINet on block-dense batches: aggregation as batched MXU matmuls.

Same math and parameters as the no-cluster GINet (reference:
neuralnets/gnn/ginet_nocluster.py): with the reference's attention identically
1.0 with zero gradient (see ginet.py), one conv layer is

    out = adj @ (x W)

— a [G,N,N] x [G,N,F] batched matmul on the MXU instead of COO
gather/segment-sum (the dense layout exists because the batch adjacency of
collated graphs is block-diagonal; see ops/batch.py:DenseGraphBatch).
Parameters are interchangeable with the COO GINet (same pytree), so
checkpoints trained on either path load on the other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.neuralnets.gnn.ginet import init_ginet_conv
from deeprank2_tpu.ops.batch import DenseGraphBatch


def ginet_conv_dense(params: dict, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
    """One GINet conv on ``[G, N, F]`` node blocks with ``[G, N, N]`` adjacency."""
    fcx = x @ params["fc"]["w"]  # [G, N, out]
    return adj @ fcx


def dense_masked_graph_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the node/cluster axis of ``[G, N, F]`` blocks."""
    x = x * mask[:, :, None]
    counts = jnp.maximum(mask.sum(axis=1), 1.0)
    return x.sum(axis=1) / counts[:, None]


class GINetClusteredDense:
    """Clustered GINet over :class:`DenseGraphBatch`: community pooling via the
    one-hot congruence ``C^T A C`` (batched MXU matmuls) — the dense
    counterpart of :class:`deeprank2_tpu.neuralnets.gnn.ginet.GINet`."""

    needs_clusters = True
    dense_batches = True
    clustering = "mcl"
    dropout = 0.4

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int = 1):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 6)
        fe = self.input_shape_edge
        return {
            "conv1": init_ginet_conv(keys[0], self.input_shape, 16, fe),
            "conv2": init_ginet_conv(keys[1], 16, 32, fe),
            "conv1_ext": init_ginet_conv(keys[2], self.input_shape, 16, fe),
            "conv2_ext": init_ginet_conv(keys[3], 16, 32, fe),
            "fc1": nn.init_linear(keys[4], 2 * 32, 128),
            "fc2": nn.init_linear(keys[5], 128, self.output_shape),
        }

    def _tower(self, conv1: dict, conv2: dict, batch: DenseGraphBatch) -> jnp.ndarray:
        from deeprank2_tpu.ops.pooling import dense_community_pool, dense_segment_max

        act = nn.relu
        x = act(ginet_conv_dense(conv1, batch.x, batch.adj))
        x = x * batch.node_mask[:, :, None]

        x, _pos, adj1, _adj_w, mask1 = dense_community_pool(x, batch.pos, batch.adj, batch.cluster0)

        x = act(ginet_conv_dense(conv2, x, adj1))
        x = x * mask1[:, :, None]

        # depth-1 max pooling; cluster1 is indexed by depth-0 cluster id
        x = dense_segment_max(x, batch.cluster1)
        counts1 = dense_segment_max(mask1[:, :, None].astype(x.dtype), batch.cluster1)[:, :, 0]
        return dense_masked_graph_mean(x, counts1 > 0)

    def apply(self, params: dict, batch: DenseGraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        x = self._tower(params["conv1"], params["conv2"], batch)
        x_ext = self._tower(params["conv1_ext"], params["conv2_ext"], batch)
        h = jnp.concatenate([x, x_ext], axis=1)
        h = nn.relu(nn.linear(params["fc1"], h))
        h = nn.dropout(rng, h, self.dropout, training)
        return nn.linear(params["fc2"], h)


class GINetDense:
    """No-cluster GINet over :class:`DenseGraphBatch` (dual tower, mean pool)."""

    needs_clusters = False
    dense_batches = True
    dropout = 0.4

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int = 1):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 6)
        fe = self.input_shape_edge
        return {
            "conv1": init_ginet_conv(keys[0], self.input_shape, 16, fe),
            "conv2": init_ginet_conv(keys[1], 16, 32, fe),
            "conv1_ext": init_ginet_conv(keys[2], self.input_shape, 16, fe),
            "conv2_ext": init_ginet_conv(keys[3], 16, 32, fe),
            "fc1": nn.init_linear(keys[4], 2 * 32, 128),
            "fc2": nn.init_linear(keys[5], 128, self.output_shape),
        }

    def _tower(self, conv1: dict, conv2: dict, batch: DenseGraphBatch) -> jnp.ndarray:
        act = nn.relu
        x = act(ginet_conv_dense(conv1, batch.x, batch.adj))
        x = act(ginet_conv_dense(conv2, x, batch.adj))
        x = x * batch.node_mask[:, :, None]
        counts = jnp.maximum(batch.node_mask.sum(axis=1), 1.0)
        return x.sum(axis=1) / counts[:, None]  # masked per-graph mean [G, 32]

    def apply(self, params: dict, batch: DenseGraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        x = self._tower(params["conv1"], params["conv2"], batch)
        x_ext = self._tower(params["conv1_ext"], params["conv2_ext"], batch)
        h = jnp.concatenate([x, x_ext], axis=1)
        h = nn.relu(nn.linear(params["fc1"], h))
        h = nn.dropout(rng, h, self.dropout, training)
        return nn.linear(params["fc2"], h)
