"""Clustered models on block-sparse adjacencies — the large-graph (atomic-
resolution) fast path for the community-pooling model family.

The COO path runs these models at ~10 M edges/s on atomic graphs (per-edge
gather/scatter); here every aggregation that touches the edge set rides the
BCSR SpMM kernel (ops/block_sparse.py) and all cluster bookkeeping is
precomputed host-side (ops/batch.py:collate_graphs_blocksparse_clustered):

- ``GINetClusteredBlockSparse`` — reference neuralnets/gnn/ginet.py:90-125.
  Both towers fuse channel-wise (one SpMM per layer, like GINetBlockSparse);
  the attention term is the singleton softmax identity (see gnn/ginet.py).
- ``FoutNetBlockSparse`` — reference neuralnets/gnn/foutnet.py:43-60. The
  neighbor mean is the row-normalized SpMM ``(A @ x Wn) / deg``.
- ``SGATBlockSparse`` — reference neuralnets/gnn/sgat.py:56-84. The
  edge-weighted mean is ``(row_part * wsum + A_w @ col_part) / deg`` with a
  *weighted* BCSR adjacency (bf16 blocks; scalar edge feature = first
  edge-attr channel, like SGATDense).

Checkpoints are interchangeable with the COO twins: ``init`` delegates to
them and ``apply`` matches their outputs to float tolerance
(tests/utils/test_clustered_blocksparse.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.neuralnets import nn
from deeprank2_tpu.neuralnets.gnn.foutnet import FoutNet as FoutNetCOO
from deeprank2_tpu.neuralnets.gnn.ginet import GINet as GINetClusteredCOO
from deeprank2_tpu.neuralnets.gnn.sgat import SGAT as SGATCOO
from deeprank2_tpu.ops.batch import ClusteredBlockSparseBatch
from deeprank2_tpu.ops.block_sparse import bcsr_spmm_t
from deeprank2_tpu.ops.pallas_slotpool import slot_group_max
from deeprank2_tpu.ops.pooling import member_max_pool, tiled_graph_mean_pool
from deeprank2_tpu.ops.segment import segment_max, segment_mean


def _lin_t(p: dict, x_t: jnp.ndarray) -> jnp.ndarray:
    """Linear map in the transposed [F, V] layout."""
    out = jnp.dot(p["w"].T, x_t)
    if "b" in p:
        out = out + p["b"][:, None]
    return out


def _pool_max_t(h_t: jnp.ndarray, batch: "ClusteredBlockSparseBatch") -> jnp.ndarray:
    """Depth-0 per-cluster feature max, transposed IO: [F, V] -> [F, C].

    slot8 batches (cluster-major 8-lane slot layout) pool in two stages:
    the Pallas lane-group max (ops/pallas_slotpool.py) collapses every
    aligned 8-lane slot, then the slot member matrix combines each
    cluster's <= ~9 slot partials — ~0.26 ms vs 0.76 ms for the node-level
    member pool at the 100k-node bench shape (tests/perf/slotpool_perf.py).

    Other batches use the collate's node member matrix (scatter-free
    gathers + S-way reduce; the scatter-max over V rows and its VJP twin
    cost 1.74 ms of a 4.0 ms 100k-node step, profiled round 3); scatter-max
    is the last resort when the collate declined to build the matrix (one
    pathological cluster)."""
    if batch.slot_cluster.size:
        p8 = slot_group_max(h_t, batch.node_mask.astype(h_t.dtype)[None, :])  # [F, V/8]
        if batch.members0s.size:
            return member_max_pool(p8.T, batch.members0s, batch.slot_cluster).T
        return segment_max(p8.T, batch.slot_cluster, batch.structure_p.padded_nodes).T
    if batch.members0.size:
        return member_max_pool(h_t.T, batch.members0, batch.cluster0).T
    return segment_max(h_t.T, batch.cluster0, batch.structure_p.padded_nodes).T


class _ClusteredBlockSparseBase:
    """Shared pipeline: conv1 on the full graph, depth-0 max-pool, conv2 on
    the pooled graph, depth-1 max-pool, per-graph mean, FC head."""

    needs_clusters = True
    clustered_blocksparse_batches = True  # Trainer._collate dispatches on this
    clustered_blocksparse_slot8 = True  # cluster-major 8-lane slot layout (Pallas pool)
    clustering = "mcl"

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: int | None = None,
        precision=jax.lax.Precision.HIGHEST,
        compute_dtype: jnp.dtype | None = None,
    ):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.precision = precision
        self.compute_dtype = compute_dtype
        self._coo = self._coo_cls(input_shape, output_shape, input_shape_edge)

    def init(self, rng: jax.Array) -> dict:
        return self._coo.init(rng)

    def _spmm(self, structure, h_t: jnp.ndarray) -> jnp.ndarray:
        return bcsr_spmm_t(structure, h_t, precision=self.precision, compute_dtype=self.compute_dtype)

    def _head(self, params: dict, pooled: jnp.ndarray, training: bool, rng) -> jnp.ndarray:
        x = nn.relu(nn.linear(params["fc1"], pooled))
        return nn.linear(params["fc2"], x)

    def _c1_graph_mean(self, h2_t: jnp.ndarray, batch: ClusteredBlockSparseBatch) -> jnp.ndarray:
        """Depth-1 max pool + per-graph mean (reference max_pool_x +
        scatter_mean, ginet.py:117-118)."""
        c1_cap = batch.c1_graph.shape[0]
        if batch.members1.size:
            hc = member_max_pool(h2_t.T, batch.members1, batch.cluster1)  # [C1, F]
        else:
            hc = segment_max(h2_t.T, batch.cluster1, c1_cap)
        return segment_mean(hc, batch.c1_graph, batch.num_graphs)


class GINetClusteredBlockSparse(_ClusteredBlockSparseBase):
    """Clustered dual-tower GINet over :class:`ClusteredBlockSparseBatch`."""

    _coo_cls = GINetClusteredCOO
    dropout = 0.4

    def apply(self, params: dict, batch: ClusteredBlockSparseBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        act = nn.relu
        x_t = batch.x.T  # [F, V]
        # layer 1, both towers in one SpMM (channels [0:16] = internal tower).
        # No mask multiplies anywhere in this model: GINet's bias lands
        # BEFORE the SpMM (_lin_t), padded rows/columns of A are all-zero,
        # so every padded activation is exactly relu(0) = 0 already — and
        # the pool stages give 0 on empty clusters (FoutNet/sGAT add their
        # bias AFTER aggregation and DO need the masks).
        fcx_t = jnp.concatenate([_lin_t(params["conv1"]["fc"], x_t), _lin_t(params["conv1_ext"]["fc"], x_t)], axis=0)
        h_t = act(self._spmm(batch.structure, fcx_t))

        # depth-0 community pooling (max features; both towers share clusters)
        hp_t = _pool_max_t(h_t, batch)

        # layer 2 on the pooled graph
        fcx2_t = jnp.concatenate(
            [_lin_t(params["conv2"]["fc"], hp_t[:16]), _lin_t(params["conv2_ext"]["fc"], hp_t[16:])],
            axis=0,
        )
        h2_t = act(self._spmm(batch.structure_p, fcx2_t))

        # pooled channel order [internal 0:32 || external 32:64] == the COO
        # model's post-pool concatenation order
        pooled = self._c1_graph_mean(h2_t, batch)
        out = nn.relu(nn.linear(params["fc1"], pooled))
        out = nn.dropout(rng, out, self.dropout, training)
        return nn.linear(params["fc2"], out)


class FoutNetBlockSparse(_ClusteredBlockSparseBase):
    """FoutNet over :class:`ClusteredBlockSparseBatch`."""

    _coo_cls = FoutNetCOO

    def _fout_t(self, p: dict, x_t: jnp.ndarray, structure, deg: jnp.ndarray) -> jnp.ndarray:
        alpha = jnp.dot(p["wc"].T, x_t)
        beta = jnp.dot(p["wn"].T, x_t)
        gamma = self._spmm(structure, beta) / jnp.maximum(deg, 1.0)[None, :]
        out = alpha + gamma
        if "b" in p:
            out = out + p["b"][:, None]
        return out

    def apply(self, params: dict, batch: ClusteredBlockSparseBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        act = nn.relu
        x_t = batch.x.T
        h_t = act(self._fout_t(params["conv1"], x_t, batch.structure, batch.deg))
        h_t = h_t * batch.node_mask[None, :]

        hp_t = _pool_max_t(h_t, batch)
        hp_t = hp_t * batch.pooled_node_mask[None, :]

        h2_t = act(self._fout_t(params["conv2"], hp_t, batch.structure_p, batch.deg_p))
        h2_t = h2_t * batch.pooled_node_mask[None, :]

        pooled = self._c1_graph_mean(h2_t, batch)
        return self._head(params, pooled, training, rng)


class SGATBlockSparse(_ClusteredBlockSparseBase):
    """sGAT over :class:`ClusteredBlockSparseBatch` (scalar edge weights)."""

    _coo_cls = SGATCOO
    clustered_blocksparse_edge_weights = True  # collate builds weighted BCSR

    def _sgat_t(self, p: dict, x_t: jnp.ndarray, structure, deg: jnp.ndarray, wsum: jnp.ndarray) -> jnp.ndarray:
        f = x_t.shape[0]
        row_part = jnp.dot(p["weight"][:f].T, x_t)
        col_part = jnp.dot(p["weight"][f:].T, x_t)
        out = (row_part * wsum[None, :] + self._spmm(structure, col_part)) / jnp.maximum(deg, 1.0)[None, :]
        if "b" in p:
            out = out + p["b"][:, None]
        return out

    def apply(self, params: dict, batch: ClusteredBlockSparseBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        act = nn.relu
        x_t = batch.x.T
        h_t = act(self._sgat_t(params["conv1"], x_t, batch.structure, batch.deg, batch.wsum))
        h_t = h_t * batch.node_mask[None, :]

        hp_t = _pool_max_t(h_t, batch)
        hp_t = hp_t * batch.pooled_node_mask[None, :]

        h2_t = act(self._sgat_t(params["conv2"], hp_t, batch.structure_p, batch.deg_p, batch.wsum_p))
        h2_t = h2_t * batch.pooled_node_mask[None, :]

        pooled = self._c1_graph_mean(h2_t, batch)
        return self._head(params, pooled, training, rng)
