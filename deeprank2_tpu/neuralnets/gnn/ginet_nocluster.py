"""GINet without community pooling (reference: neuralnets/gnn/ginet_nocluster.py):
same conv layer and dual tower, per-graph mean pooling instead of clustering."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.neuralnets.gnn.ginet import ginet_conv, init_ginet_conv
from deeprank2_tpu.ops.batch import GraphBatch
from deeprank2_tpu.ops.pooling import graph_mean_pool


class GINet:
    """No-cluster GINet (dual tower, mean pooling)."""

    needs_clusters = False
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

    def _tower(self, conv1: dict, conv2: dict, batch: GraphBatch) -> jnp.ndarray:
        act = nn.relu
        x = act(ginet_conv(conv1, batch.x, batch.edge_index, batch.edge_attr, batch.edge_mask))
        x = act(ginet_conv(conv2, x, batch.edge_index, batch.edge_attr, batch.edge_mask))
        x = x * batch.node_mask[:, None]
        return graph_mean_pool(x, batch.node_graph, batch.num_graphs)

    def apply(self, params: dict, batch: GraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        x = self._tower(params["conv1"], params["conv2"], batch)
        x_ext = self._tower(params["conv1_ext"], params["conv2_ext"], batch)
        h = jnp.concatenate([x, x_ext], axis=1)
        h = nn.relu(nn.linear(params["fc1"], h))
        h = nn.dropout(rng, h, self.dropout, training)
        return nn.linear(params["fc2"], h)
