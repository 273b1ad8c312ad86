"""Vanilla message-passing GNN (reference: deeprank2/neuralnets/gnn/vanilla_gnn.py).

Layer math parity: per-edge messages ``MLP([x_i || x_j || e_ij])`` summed onto
the edge's first endpoint, then a node MLP over ``[x || msg_sum]``. Two layers,
graph mean-pool, output MLP. No clustering required.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.batch import GraphBatch
from deeprank2_tpu.ops.pooling import graph_mean_pool
from deeprank2_tpu.ops.segment import segment_sum

MESSAGE_SIZE = 32
HIDDEN_SIZE = 128


class VanillaNetwork:
    """Two vanilla convolutional layers + MLP head. Suitable for both tasks."""

    needs_clusters = False

    def __init__(self, input_shape: int, output_shape: int = 1, input_shape_edge: int = 0):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 6)
        f, fe = self.input_shape, self.input_shape_edge
        layer = lambda k1, k2: {  # noqa: E731
            "edge_mlp": nn.init_linear(k1, 2 * f + fe, MESSAGE_SIZE),
            "node_mlp": nn.init_linear(k2, f + MESSAGE_SIZE, f),
        }
        return {
            "external1": layer(keys[0], keys[1]),
            "external2": layer(keys[2], keys[3]),
            "graph_mlp": {
                "fc1": nn.init_linear(keys[4], f, HIDDEN_SIZE),
                "fc2": nn.init_linear(keys[5], HIDDEN_SIZE, self.output_shape),
            },
        }

    @staticmethod
    def _conv(params: dict, x: jnp.ndarray, batch: GraphBatch) -> jnp.ndarray:
        # Same math as the reference's MLP([x_i || x_j || e]) but with the
        # node-feature contributions precomputed per node ([V, F] matmuls)
        # and gathered per edge — cheaper than per-edge matmuls since E >> V.
        row, col = batch.edge_index
        capacity = x.shape[0]
        safe_row = jnp.clip(row, 0, capacity - 1)
        safe_col = jnp.clip(col, 0, capacity - 1)

        w = params["edge_mlp"]["w"]  # [2F + Fe, M]
        f = x.shape[1]
        x_row_part = x @ w[:f]  # [V, M]
        x_col_part = x @ w[f : 2 * f]  # [V, M]
        messages = x_row_part[safe_row] + x_col_part[safe_col] + batch.edge_attr @ w[2 * f :] + params["edge_mlp"]["b"]
        messages = nn.relu(messages)
        messages = messages * batch.edge_mask[:, None]
        msg_sums = segment_sum(messages, row, capacity, indices_sorted=True)
        node_input = jnp.concatenate([x, msg_sums], axis=1)
        return nn.relu(nn.linear(params["node_mlp"], node_input))

    def apply(self, params: dict, batch: GraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        x = self._conv(params["external1"], batch.x, batch)
        x = self._conv(params["external2"], x, batch)
        means = graph_mean_pool(x * batch.node_mask[:, None], batch.node_graph, batch.num_graphs)
        h = nn.relu(nn.linear(params["graph_mlp"]["fc1"], means))
        return nn.linear(params["graph_mlp"]["fc2"], h)


class VanillaNetworkBlocked(VanillaNetwork):
    """VanillaNetwork on the blocked per-edge-feature layout — the fast path
    for atomic-resolution graphs (and large batches generally), where the COO
    gather/segment pipeline leaves the MXU idle.

    Identical math and parameter pytree to :class:`VanillaNetwork`
    (checkpoints are interchangeable); the per-edge ``relu(MLP([x_i || x_j ||
    e_ij]))`` messages and their aggregation run as tile-local one-hot MXU
    matmuls (ops/blocked_edges.py, ops/pallas_vanilla.py on TPU).

    ``compute_dtype=jnp.bfloat16`` runs the message matmuls with bf16
    operands (f32 accumulation) — the fast training setting; parameters, the
    node/graph MLPs, and the loss stay f32.
    """

    blocked_edge_batches = True

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: int = 0,
        compute_dtype: jnp.dtype | None = None,
    ):
        super().__init__(input_shape, output_shape, input_shape_edge)
        self.compute_dtype = compute_dtype

    def _conv_blocked(self, params: dict, x: jnp.ndarray, structure) -> jnp.ndarray:
        from deeprank2_tpu.ops.blocked_edges import blocked_message_sum

        w = params["edge_mlp"]["w"]  # [2F + Fe, M]
        f = x.shape[1]
        xr = x @ w[:f] + params["edge_mlp"]["b"]  # bias rides the destination part
        xc = x @ w[f : 2 * f]
        msg_sums = blocked_message_sum(structure, xr, xc, w[2 * f :], compute_dtype=self.compute_dtype)
        node_input = jnp.concatenate([x, msg_sums], axis=1)
        return nn.relu(nn.linear(params["node_mlp"], node_input))

    def apply(self, params: dict, batch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        from deeprank2_tpu.ops.blocked_edges import EDGE_TILE
        from deeprank2_tpu.ops.pooling import tiled_graph_mean_pool_rows

        x = self._conv_blocked(params["external1"], batch.x, batch.structure)
        x = self._conv_blocked(params["external2"], x, batch.structure)
        # tile-factorized pooling: a full-V scatter costs ~0.9 ms per segment
        # op at 100k nodes (see ginet_blocksparse.py); blocked collation
        # keeps graphs tile-disjoint so the tile reduce + NT-row scatter is
        # exact
        means = tiled_graph_mean_pool_rows(
            x * batch.node_mask[:, None], batch.node_graph, batch.node_mask, batch.num_graphs, EDGE_TILE
        )
        h = nn.relu(nn.linear(params["graph_mlp"]["fc1"], means))
        return nn.linear(params["graph_mlp"]["fc2"], h)
