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
    return sym_adj_matmul(adj)(fcx)


def sym_adj_matmul(adj: jnp.ndarray):
    """``v -> adj @ v`` for a SYMMETRIC batched adjacency, with a VJP that
    reuses the forward's dimension order (``d v = adj @ g`` — mirrored edges
    make ``adj^T = adj``, reference dataset.py:944-951).

    Without this, XLA lowers the autodiff VJP as a transposed batched matmul
    and materializes layout copies of every backward intermediate — profiled
    at ~170 us of the 387 us dense train step (four bf16 {1,2,0}<->{0,2,1}
    copies of the [G,N,C] cotangents, round 3). The adjacency is a batch
    constant, so no cotangent for it exists.
    """

    @jax.custom_vjp
    def mm(v):
        return adj @ v

    def fwd(v):
        return adj @ v, None

    def bwd(_, g):
        return (adj @ g,)

    mm.defvjp(fwd, bwd)
    return mm


def apply_weight_t(w: jnp.ndarray, x_t: jnp.ndarray) -> jnp.ndarray:
    """``[F, C] x [G, F, N] -> [G, C, N]`` weight application whose VJP keeps
    N minor on every big operand: the default autodiff weight-grad contracts
    over (g, n), which the TPU dot emitter normalizes by transposing the
    [G, C, N] cotangent (the profiled {1,2,0}<->{0,2,1} copies); computing it
    as per-graph outer products reduced over G keeps the same contraction
    form as the forward."""

    @jax.custom_vjp
    def op(w, x_t):
        return jnp.einsum("fc,gfn->gcn", w, x_t)

    def fwd(w, x_t):
        return op(w, x_t), (w, x_t)

    def bwd(res, g):
        w, x_t = res
        dx_t = jnp.einsum("fc,gcn->gfn", w, g)
        dw = jnp.einsum("gfn,gcn->gfc", x_t, g).sum(axis=0)
        return dw.astype(w.dtype), dx_t

    op.defvjp(fwd, bwd)
    return op(w, x_t)


def sym_adj_matmul_t(adj: jnp.ndarray):
    """Transposed-layout aggregate ``v_t -> v_t @ adj`` on ``[G, C, N]``
    activations (``out[g,c,m] = sum_n v[g,c,n] adj[g,n,m]``), with the
    symmetric VJP in the SAME contraction form — see :func:`sym_adj_matmul`
    and the layout note in :meth:`GINetDense.apply`."""

    def agg(v_t):
        return jnp.einsum("gcn,gnm->gcm", v_t, adj)

    @jax.custom_vjp
    def mm(v_t):
        return agg(v_t)

    def fwd(v_t):
        return agg(v_t), None

    def bwd(_, g):
        # sum_m g[g,c,m] adj[g,n,m] == sum_m g[g,c,m] adj[g,m,n] (symmetry)
        return (agg(g),)

    mm.defvjp(fwd, bwd)
    return mm


_TOWER_BACKEND = "xla"


def set_dense_tower_backend(name: str) -> None:
    """Select the BATCHED tower implementation used when the graph-diagonal
    fast path does not engage (no adj_i8 operands or unsupported shape):
    "xla" (default; batched matmuls) or "pallas" (round-2 fused
    single-adjacency-pass kernel, ops/pallas_ginet.py; kept for re-profiling
    on directly-attached chips). The measured production path since round 4
    is the flat graph-diagonal kernel (ops/diag_spmm.py, _apply_flat) at
    82.9 % of the 4-pass bound — see tests/perf/dense_decompose.py."""
    global _TOWER_BACKEND
    if name not in ("xla", "pallas"):
        msg = f"unknown dense tower backend: {name}"
        raise ValueError(msg)
    _TOWER_BACKEND = name


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

    def apply(self, params: dict, batch: DenseGraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        # Towers fused channel-wise (see GINetDense.apply): pooling is
        # channel-independent and the pooled adjacency/clusters are
        # tower-independent, so the community-pool congruence runs ONCE for
        # both towers instead of twice.
        from deeprank2_tpu.ops.pooling import dense_community_pool, dense_segment_max

        act = nn.relu
        fcx = jnp.concatenate([batch.x @ params["conv1"]["fc"]["w"], batch.x @ params["conv1_ext"]["fc"]["w"]], axis=-1)
        h = act(batch.adj @ fcx)  # [G, N, 32]
        h = h * batch.node_mask[:, :, None]

        h, _pos, adj1, _adj_w, mask1 = dense_community_pool(h, batch.pos, batch.adj, batch.cluster0)

        fcx2 = jnp.concatenate([h[..., :16] @ params["conv2"]["fc"]["w"], h[..., 16:] @ params["conv2_ext"]["fc"]["w"]], axis=-1)
        h = act(adj1 @ fcx2)  # [G, N, 64]
        h = h * mask1[:, :, None]

        # depth-1 max pooling; cluster1 is indexed by depth-0 cluster id
        h = dense_segment_max(h, batch.cluster1)
        counts1 = dense_segment_max(mask1[:, :, None].astype(h.dtype), batch.cluster1)[:, :, 0]
        h = dense_masked_graph_mean(h, counts1 > 0)
        h = nn.relu(nn.linear(params["fc1"], h))
        h = nn.dropout(rng, h, self.dropout, training)
        return nn.linear(params["fc2"], h)


class GINetClusteredDiag:
    """Clustered GINet at PPI scale on the graph-diagonal machinery — the
    fast path for the reference's flagship training config (clustered GINet
    over batches of small interface graphs, reference
    neuralnets/gnn/ginet.py:90-125).

    Nodes collate cluster-major into 8-lane slots per graph
    (:class:`deeprank2_tpu.ops.batch.DiagClusteredBatch`); both conv layers
    run as graph-diagonal Pallas aggregations with fused relu/mask
    (ops/diag_spmm.py — the pooled graph is just a second, smaller
    ``[G, K, K]`` diagonal adjacency precomputed at collate), and depth-0
    community pooling is the slot kernel + member combine
    (ops/pallas_slotpool.py) instead of the ``G*N``-row scatters that cost
    the batched dense variant ~7.4 ms of its 10.4 ms bench step (profiled
    round 4; this model measures ~0.6 ms on the same batch).

    Parameters are interchangeable with the COO clustered GINet (same
    pytree; ``init`` delegates)."""

    needs_clusters = True
    diag_clustered_batches = True  # Trainer._collate dispatches on this
    clustering = "mcl"
    dropout = 0.4

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: int | None = None,
        compute_dtype: jnp.dtype | None = None,
    ):
        from deeprank2_tpu.neuralnets.gnn.ginet import GINet

        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.compute_dtype = compute_dtype
        self._coo = GINet(input_shape, output_shape, input_shape_edge)

    def init(self, rng: jax.Array) -> dict:
        return self._coo.init(rng)

    def apply(self, params: dict, batch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        from deeprank2_tpu.ops.diag_spmm import diag_layer_t
        from deeprank2_tpu.ops.pooling import diag_depth0_pool, member_max_pool
        from deeprank2_tpu.ops.segment import segment_max, segment_mean

        def lin_t(p, x_t):
            out = jnp.dot(p["w"].T, x_t)
            return out + p["b"][:, None] if "b" in p else out

        g, n, _ = batch.adj_i8.shape
        x_t = batch.x_t  # [F, G*N] slot order
        fcx = jnp.concatenate([lin_t(params["conv1"]["fc"], x_t), lin_t(params["conv1_ext"]["fc"], x_t)], axis=0)
        h_t = diag_layer_t(batch.adj_i8, batch.node_mask, fcx, self.compute_dtype)  # relu+mask fused

        # depth-0 community pooling: slot max + member combine (+ the
        # node-level pool for mixed-layout small clusters)
        k_cap = batch.pooled_mask.shape[1]
        hp_t = diag_depth0_pool(h_t, batch)  # [F, G*K]

        fcx2 = jnp.concatenate([lin_t(params["conv2"]["fc"], hp_t[:16]), lin_t(params["conv2_ext"]["fc"], hp_t[16:])], axis=0)
        h2_t = diag_layer_t(batch.adj_p_i8, batch.pooled_mask, fcx2, self.compute_dtype)

        # depth-1 max pool + per-graph mean (reference max_pool_x + scatter_mean)
        c1_cap = batch.c1_graph.shape[0]
        if batch.members1.size:
            hc = member_max_pool(h2_t.T, batch.members1, batch.cluster1)  # [C1, 64]
        else:
            hc = segment_max(h2_t.T, batch.cluster1, c1_cap)
        pooled = segment_mean(hc, batch.c1_graph, batch.num_graphs)

        out = nn.relu(nn.linear(params["fc1"], pooled))
        out = nn.dropout(rng, out, self.dropout, training)
        return nn.linear(params["fc2"], out)


class GINetDense:
    """No-cluster GINet over :class:`DenseGraphBatch` (dual tower, mean pool).

    ``compute_dtype=jnp.bfloat16`` runs the tower (conv matmuls and relu
    intermediates) in bf16 — parameters, the head MLP, and the loss stay f32.
    The dense step is HBM-bound and the f32 intermediates are a large share
    of its non-adjacency traffic, so this is the standard TPU mixed-precision
    trade: ~bf16-epsilon activations for materially fewer bytes streamed."""

    needs_clusters = False
    dense_batches = True
    diag_operands = True  # Trainer ships adj_i8/x_t for the flat fast path
    dropout = 0.4

    def __init__(
        self,
        input_shape: int,
        output_shape: int = 1,
        input_shape_edge: int = 1,
        compute_dtype: jnp.dtype | None = None,
    ):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.input_shape_edge = input_shape_edge
        self.compute_dtype = compute_dtype

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

    def apply(self, params: dict, batch: DenseGraphBatch, training: bool = False, rng: jax.Array | None = None) -> jnp.ndarray:
        # Both towers share the adjacency, so their convs run fused
        # channel-wise: one adj @ [G,N,2*out] matmul per layer instead of two
        # half-width ones (identical math — relu and the final concat commute
        # with the channel split).
        act = nn.relu
        counts = jnp.maximum(batch.node_mask.sum(axis=1), 1.0)
        if _TOWER_BACKEND == "pallas":
            from deeprank2_tpu.ops import pallas_ginet

            if pallas_ginet.supports(batch.num_graphs):
                w1 = jnp.concatenate([params["conv1"]["fc"]["w"], params["conv1_ext"]["fc"]["w"]], axis=-1)
                w2a, w2b = params["conv2"]["fc"]["w"], params["conv2_ext"]["fc"]["w"]
                w2 = jnp.block([[w2a, jnp.zeros_like(w2b)], [jnp.zeros_like(w2a), w2b]])
                # the kernel honors compute_dtype as its matmul operand dtype
                pooled = pallas_ginet.ginet_tower_pooled(
                    w1, w2, batch.x, batch.adj, batch.node_mask.astype(jnp.float32), compute_dtype=self.compute_dtype or jnp.float32
                )
                h = pooled / counts[:, None]
                h = nn.relu(nn.linear(params["fc1"], h))
                h = nn.dropout(rng, h, self.dropout, training)
                return nn.linear(params["fc2"], h)
        from deeprank2_tpu.ops import diag_spmm

        if batch.adj_i8 is not None and batch.adj_i8.size and diag_spmm.supports(batch.num_graphs, batch.nodes_per_graph):
            return self._apply_flat(params, batch, training, rng)
        x, adj = batch.x, batch.adj
        w1a, w1b = params["conv1"]["fc"]["w"], params["conv1_ext"]["fc"]["w"]
        w2a, w2b = params["conv2"]["fc"]["w"], params["conv2_ext"]["fc"]["w"]
        if self.compute_dtype is not None:
            x, adj = x.astype(self.compute_dtype), adj.astype(self.compute_dtype)
            w1a, w1b = w1a.astype(self.compute_dtype), w1b.astype(self.compute_dtype)
            w2a, w2b = w2a.astype(self.compute_dtype), w2b.astype(self.compute_dtype)
        # Fuse the towers on the WEIGHT side, never the activation side:
        # concatenating [G,N,C] activations (and splitting them in the VJP)
        # makes XLA insert full-tensor layout copies — profiled at ~40 % of
        # the train step. x @ [w1a ‖ w1b] and h @ blockdiag(w2a, w2b) are the
        # same math with only [F,C]-sized weight concats.
        w1 = jnp.concatenate([w1a, w1b], axis=1)  # [F, 32]
        w2 = jnp.block([[w2a, jnp.zeros_like(w2b)], [jnp.zeros_like(w2a), w2b]])  # [32, 64]
        # The whole tower runs in the transposed [G, C, N] layout (channels on
        # sublanes, nodes on lanes) — the same layout discipline as the BCSR
        # model. In the row-major [G, N, C] formulation every backward
        # cotangent has two consumers with conflicting preferred layouts
        # (aggregate vs weight-grad contractions) and XLA materializes
        # {1,2,0}<->{0,2,1} copies of each — profiled at 170 us of the 387 us
        # step (round 3). Transposed, every matmul (forward, symmetric-VJP
        # aggregate, dw, dx) contracts with N on the lanes and no tensor is
        # ever re-laid-out.
        x_t = x.swapaxes(1, 2)  # [G, F, N] — the only transpose in the step
        aggregate = sym_adj_matmul_t(adj)
        h = act(aggregate(apply_weight_t(w1, x_t)))  # [G, 32, N]
        h = act(aggregate(apply_weight_t(w2, h)))  # [G, 64, N]
        h = h * batch.node_mask[:, None, :].astype(h.dtype)
        # per-graph mean accumulated in f32 (bf16 sums over ~10^2 nodes drift)
        h = h.astype(jnp.float32).sum(axis=2) / counts[:, None]
        h = nn.relu(nn.linear(params["fc1"], h))
        h = nn.dropout(rng, h, self.dropout, training)
        return nn.linear(params["fc2"], h)

    def _apply_flat(self, params: dict, batch: DenseGraphBatch, training: bool, rng: jax.Array | None) -> jnp.ndarray:
        """Graph-diagonal fast path: the whole tower in the flat transposed
        ``[F, G*N]`` layout with the aggregation as the int8 Pallas kernel
        (ops/diag_spmm.py) — no batched matmuls anywhere, so the XLA dot
        emitter inserts no cotangent layout copies (the ~35 %-of-step residual
        of the ``[G, N, N]`` formulation; see the module docstring there)."""
        from deeprank2_tpu.ops.diag_spmm import diag_layer_pool_t, diag_layer_t

        g, n = batch.num_graphs, batch.nodes_per_graph
        cd = self.compute_dtype
        x_t = batch.x_t if batch.x_t is not None else batch.x.reshape(g * n, -1).T
        w1a, w1b = params["conv1"]["fc"]["w"], params["conv1_ext"]["fc"]["w"]
        w2a, w2b = params["conv2"]["fc"]["w"], params["conv2_ext"]["fc"]["w"]
        if cd is not None:
            x_t = x_t.astype(cd)
            w1a, w1b, w2a, w2b = (w.astype(cd) for w in (w1a, w1b, w2a, w2b))
        # weight-side tower fusion, as in apply(): [F,32] concat + [32,64] blockdiag
        w1 = jnp.concatenate([w1a, w1b], axis=1)
        w2 = jnp.block([[w2a, jnp.zeros_like(w2b)], [jnp.zeros_like(w2a), w2b]])
        # NOTE: a fully-fused tower (one fwd + one bwd kernel, adjacency read
        # once per direction — ops/diag_spmm.py:tower_pooled) measured 603 us
        # vs this formulation's 311 us on v5e: the per-graph dependency chain
        # of small dots with in-kernel VPU splits serializes against the MXU,
        # the same failure mode as round 2's batched pallas tower.
        h = diag_layer_t(batch.adj_i8, batch.node_mask, w1.T @ x_t, cd)  # [32, V]
        # final layer + per-graph sum pooling fused in one kernel pass
        pooled = diag_layer_pool_t(batch.adj_i8, batch.node_mask, w2.T @ h.astype(w2.dtype), cd)  # [64, G]
        counts = jnp.maximum(batch.node_mask.sum(axis=1), 1.0)
        pooled = pooled.astype(jnp.float32).T / counts[:, None]
        out = nn.relu(nn.linear(params["fc1"], pooled))
        out = nn.dropout(rng, out, self.dropout, training)
        return nn.linear(params["fc2"], out)
