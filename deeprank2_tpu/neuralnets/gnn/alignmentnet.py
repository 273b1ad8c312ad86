"""AlignmentGNN (reference: neuralnets/gnn/alignmentnet.py, Rademaker).

Research model with a nonstandard forward signature
``forward(edges, edge_attr, node_attr) -> (per-node outputs, attention)`` —
like in the reference, it is not Trainer-compatible (the reference's forward
does not take a batch object either; alignmentnet.py:250).

Residual message-passing stack: preprocessing MLPs (with batch norm) project
edges/nodes, then ``nmb_gnn_layers`` layers compute per-edge messages
(SiLU MLP over [edge || h_src || h_dst]), scatter-sum them per node, and apply
a residual node MLP; the last layer adds per-node output + sigmoid-attention
heads. Batch norm uses batch statistics (training-mode semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.ops.segment import segment_sum

act_fn = jax.nn.silu


def _init_bn(dim: int) -> dict:
    return {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}


def _batchnorm(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = x.mean(axis=0, keepdims=True)
    var = x.var(axis=0, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * params["scale"] + params["bias"]


def _init_mlp(key: jax.Array, dims: list[int]) -> list[dict]:
    keys = jax.random.split(key, len(dims) - 1)
    return [nn.init_linear(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)]


class GNNLayer:
    """One AlignmentGNN layer (edge MLP -> message sum -> residual node MLP,
    plus attention/output heads on the last layer)."""

    def __init__(
        self,
        nmb_edge_projection: int,
        nmb_hidden_attr: int,
        nmb_output_features: int,
        message_vector_length: int,
        nmb_mlp_neurons: int,
        is_last_layer: bool = True,
    ):
        self.nmb_edge_projection = nmb_edge_projection
        self.nmb_hidden_attr = nmb_hidden_attr
        self.nmb_output_features = nmb_output_features
        self.message_vector_length = message_vector_length
        self.nmb_mlp_neurons = nmb_mlp_neurons
        self.is_last_layer = is_last_layer

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 4)
        params = {
            "edge_mlp": _init_mlp(keys[0], [self.nmb_edge_projection + self.nmb_hidden_attr * 2, self.nmb_mlp_neurons, self.message_vector_length]),
            "node_bn": _init_bn(self.message_vector_length + self.nmb_hidden_attr),
            "node_mlp": _init_mlp(
                keys[1],
                [self.message_vector_length + self.nmb_hidden_attr, self.nmb_mlp_neurons, self.nmb_mlp_neurons, self.nmb_hidden_attr],
            ),
        }
        if self.is_last_layer:
            params["attention_mlp"] = _init_mlp(keys[2], [self.nmb_hidden_attr, self.nmb_mlp_neurons, 1])
            params["output_mlp"] = _init_mlp(keys[3], [self.nmb_hidden_attr, self.nmb_mlp_neurons, self.nmb_output_features])
        return params

    def edge_model(self, params: dict, edge_attr: jnp.ndarray, h_src: jnp.ndarray, h_dst: jnp.ndarray) -> jnp.ndarray:
        cat = jnp.concatenate([edge_attr, h_src, h_dst], axis=1)
        h = act_fn(nn.linear(params["edge_mlp"][0], cat))
        return act_fn(nn.linear(params["edge_mlp"][1], h))

    def node_model(self, params: dict, summed_edge_message: jnp.ndarray, hidden_features: jnp.ndarray) -> jnp.ndarray:
        cat = jnp.concatenate([summed_edge_message, hidden_features], axis=1)
        h = _batchnorm(params["node_bn"], cat)
        h = act_fn(nn.linear(params["node_mlp"][0], h))
        h = act_fn(nn.linear(params["node_mlp"][1], h))
        h = nn.linear(params["node_mlp"][2], h)
        return hidden_features + h

    def update_nodes(self, params: dict, edges: jnp.ndarray, edge_attr: jnp.ndarray, hidden_features: jnp.ndarray, steps: int = 1) -> jnp.ndarray:
        row, col = edges
        h = hidden_features
        capacity = h.shape[0]
        for _ in range(steps):
            messages = self.edge_model(params, edge_attr, h[jnp.clip(row, 0, capacity - 1)], h[jnp.clip(col, 0, capacity - 1)])
            summed = segment_sum(messages, row, capacity)
            h = self.node_model(params, summed, h)
        return h

    def output(self, params: dict, hidden_features: jnp.ndarray, get_attention: bool = True):
        h = act_fn(nn.linear(params["output_mlp"][0], hidden_features))
        out = nn.linear(params["output_mlp"][1], h)
        if get_attention:
            a = act_fn(nn.linear(params["attention_mlp"][0], hidden_features))
            attention = jax.nn.sigmoid(nn.linear(params["attention_mlp"][1], a))
            return out, attention
        return out


class SuperGNN:
    """Preprocessing MLPs + a stack of :class:`GNNLayer`."""

    def __init__(
        self,
        nmb_edge_attr: int,
        nmb_node_attr: int,
        nmb_hidden_attr: int,
        nmb_mlp_neurons: int,
        nmb_edge_projection: int,
        nmb_gnn_layers: int,
        nmb_output_features: int,
        message_vector_length: int,
    ):
        self.nmb_edge_attr = nmb_edge_attr
        self.nmb_node_attr = nmb_node_attr
        self.nmb_hidden_attr = nmb_hidden_attr
        self.nmb_mlp_neurons = nmb_mlp_neurons
        self.nmb_edge_projection = nmb_edge_projection
        self.layers = [
            GNNLayer(
                nmb_edge_projection,
                nmb_hidden_attr,
                nmb_output_features,
                message_vector_length,
                nmb_mlp_neurons,
                is_last_layer=(i == nmb_gnn_layers - 1),
            )
            for i in range(nmb_gnn_layers)
        ]

    def init(self, rng: jax.Array) -> dict:
        keys = jax.random.split(rng, 2 + len(self.layers))
        return {
            "preproc_edge_bn0": _init_bn(self.nmb_edge_attr),
            "preproc_edge_mlp": _init_mlp(keys[0], [self.nmb_edge_attr, self.nmb_mlp_neurons, self.nmb_edge_projection]),
            "preproc_edge_bn1": _init_bn(self.nmb_mlp_neurons),
            "preproc_node_bn0": _init_bn(self.nmb_node_attr),
            "preproc_node_mlp": _init_mlp(keys[1], [self.nmb_node_attr, self.nmb_mlp_neurons, self.nmb_hidden_attr]),
            "preproc_node_bn1": _init_bn(self.nmb_mlp_neurons),
            "layers": [layer.init(k) for layer, k in zip(self.layers, keys[2:])],
        }

    def preprocess(self, params: dict, edge_attr: jnp.ndarray, node_attr: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        e = _batchnorm(params["preproc_edge_bn0"], edge_attr)
        e = nn.linear(params["preproc_edge_mlp"][0], e)
        e = act_fn(_batchnorm(params["preproc_edge_bn1"], e))
        e = act_fn(nn.linear(params["preproc_edge_mlp"][1], e))

        h = _batchnorm(params["preproc_node_bn0"], node_attr)
        h = nn.linear(params["preproc_node_mlp"][0], h)
        h = act_fn(_batchnorm(params["preproc_node_bn1"], h))
        h = act_fn(nn.linear(params["preproc_node_mlp"][1], h))
        return e, h

    def run_through_network(self, params: dict, edges: jnp.ndarray, edge_attr: jnp.ndarray, node_attr: jnp.ndarray, with_output_attention: bool = False):
        edge_attr, node_attr = self.preprocess(params, edge_attr, node_attr)
        for layer, layer_params in zip(self.layers, params["layers"]):
            node_attr = layer.update_nodes(layer_params, edges, edge_attr, node_attr)
        return self.layers[-1].output(params["layers"][-1], node_attr, get_attention=True)


class AlignmentGNN(SuperGNN):
    """Deep residual message-passing stack with per-node output + attention heads."""

    def __init__(
        self,
        nmb_edge_attr: int,
        nmb_node_attr: int,
        nmb_output_features: int,
        nmb_hidden_attr: int,
        message_vector_length: int,
        nmb_mlp_neurons: int,
        nmb_gnn_layers: int,
        nmb_edge_projection: int,
    ):
        super().__init__(
            nmb_edge_attr,
            nmb_node_attr,
            nmb_hidden_attr,
            nmb_mlp_neurons,
            nmb_edge_projection,
            nmb_gnn_layers,
            nmb_output_features,
            message_vector_length,
        )

    def forward(self, params: dict, edges: jnp.ndarray, edge_attr: jnp.ndarray, node_attr: jnp.ndarray):
        """(per-node outputs [V, out], per-node attention [V, 1])."""
        return self.run_through_network(params, edges, edge_attr, node_attr)

    apply = forward
