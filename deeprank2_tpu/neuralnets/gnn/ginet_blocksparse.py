"""GINet on block-sparse adjacencies — the large-graph (atomic-resolution) path.

Same math and parameter pytree as the no-cluster GINet (reference:
neuralnets/gnn/ginet_nocluster.py; see ginet.py here for the attention-is-1
parity notes), but the aggregation runs as BCSR SpMM (ops/block_sparse.py)
instead of gather + segment-sum, and the two towers are fused channel-wise so
each layer costs ONE SpMM over the concatenated tower channels:

- layer 1: ``spmm(A, [x W1_int || x W1_ext])``  (F -> 16+16 channels)
- layer 2: ``spmm(A, [h_int W2_int || h_ext W2_ext])``  (16+16 -> 32+32)

Checkpoints are interchangeable with the COO model: ``init`` delegates to it
and ``apply`` matches its outputs to float tolerance (tests/utils/
test_block_sparse.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.neuralnets.gnn.ginet_nocluster import GINet as GINetCOO
from deeprank2_tpu.ops.batch import BlockSparseBatch
from deeprank2_tpu.ops.block_sparse import bcsr_spmm_t
from deeprank2_tpu.ops.pooling import tiled_graph_mean_pool


class GINetBlockSparse:
    """No-cluster GINet over :class:`BlockSparseBatch` inputs."""

    needs_clusters = False
    blocksparse_batches = True  # Trainer._collate dispatches on this
    dropout = 0.4

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: int = 1,
        precision=jax.lax.Precision.HIGHEST,
        compute_dtype: jnp.dtype | None = None,
    ):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.precision = precision
        # bfloat16 = single-pass MXU block matmuls (f32 accumulation); None
        # keeps f32 operands at ``precision`` (the parity/oracle mode)
        self.compute_dtype = compute_dtype
        self._coo = GINetCOO(input_shape, output_shape, input_shape_edge)

    def init(self, rng: jax.Array) -> dict:
        return self._coo.init(rng)

    def apply(self, params: dict, batch: BlockSparseBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        act = nn.relu
        spmm_t = lambda h_t: bcsr_spmm_t(batch.structure, h_t, precision=self.precision, compute_dtype=self.compute_dtype)  # noqa: E731
        # the whole tower runs in the kernel's native transposed [F, V]
        # layout — one transpose in, one out. Measured on v5e this matches
        # the [V, F] formulation exactly (XLA's layout assignment already
        # elided the per-SpMM transposes); keeping the layout explicit makes
        # that independent of the compiler's mood. Transposed linear (conv
        # fc maps are bias-free):
        lin_t = lambda p, x_t: jnp.dot(p["w"].T, x_t) + (p["b"][:, None] if "b" in p else 0.0)  # noqa: E731

        x_t = batch.x.T  # [F, V]
        # layer 1, both towers in one SpMM (channels [0:16] = internal tower)
        fcx_t = jnp.concatenate([lin_t(params["conv1"]["fc"], x_t), lin_t(params["conv1_ext"]["fc"], x_t)], axis=0)
        h_t = act(spmm_t(fcx_t))

        # layer 2
        fcx2_t = jnp.concatenate(
            [lin_t(params["conv2"]["fc"], h_t[:16]), lin_t(params["conv2_ext"]["fc"], h_t[16:])],
            axis=0,
        )
        h2_t = act(spmm_t(fcx2_t))
        h2_t = h2_t * batch.node_mask[None, :]

        # tile-factorized pooling: a full-V scatter here cost 1.76 ms/step
        # (2x 0.88 ms with the loop-invariant count scatter XLA failed to
        # hoist) — 35 % of the whole train step at 100k nodes
        pooled = tiled_graph_mean_pool(h2_t, batch.node_graph, batch.node_mask, batch.num_graphs)
        # COO model concatenates [internal_tower, external_tower] after pooling
        # — the fused channels are already in that order.
        out = nn.relu(nn.linear(params["fc1"], pooled))
        out = nn.dropout(rng, out, self.dropout, training)
        return nn.linear(params["fc2"], out)
