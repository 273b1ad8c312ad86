"""Graph pooling under jit with static shapes.

Implements the cluster-pooling semantics the reference gets from PyG
(community_pooling -> consecutive_cluster/pool_edge/scatter_max, reference
deeprank2/utils/community_pooling.py:165-242; max_pool_x in the model forwards)
— but on padded arrays: the pooled graph keeps the same array capacity with a
validity mask, and duplicate pooled edges are coalesced with a sort +
segment-sum (data-independent shapes, XLA-friendly).

Conventions: cluster ids are batch-global and < capacity; padded nodes/edges
carry out-of-range ids so scatters drop them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeprank2_tpu.ops.segment import segment_max, segment_mean, segment_sum


def pool_edges_coalesce(
    edge_index: jnp.ndarray,  # i32 [2, E], padded entries OOB
    edge_attr: jnp.ndarray,  # f32 [E, Fe]
    edge_mask: jnp.ndarray,  # bool [E]
    cluster: jnp.ndarray,  # i32 [V+...] node -> cluster id (padded nodes OOB)
    capacity: int,  # cluster id upper bound (array capacity)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Map edges to cluster pairs, drop self-loops, coalesce duplicates (summing
    attrs — PyG ``coalesce`` semantics). Returns (pooled_edge_index [2, E],
    pooled_edge_attr [E, Fe], pooled_edge_mask [E]); invalid slots are masked.
    """
    num_edges = edge_index.shape[1]
    # map endpoints; padded edges index OOB -> clamp and invalidate via mask
    safe_nodes = jnp.clip(edge_index, 0, cluster.shape[0] - 1)
    ci = cluster[safe_nodes[0]]
    cj = cluster[safe_nodes[1]]
    valid = edge_mask & (ci != cj) & (ci < capacity) & (cj < capacity)

    # lexsort on the (ci, cj) pair — no composite int key, so capacity is
    # unbounded (the previous ci*capacity+cj int32 key capped batches at
    # 46340 nodes, below atomic scale). Invalid edges sort to the end.
    ci_s = jnp.where(valid, ci, capacity).astype(jnp.int32)
    cj_s = jnp.where(valid, cj, capacity).astype(jnp.int32)
    order = jnp.lexsort((cj_s, ci_s))
    sci = ci_s[order]
    scj = cj_s[order]
    sorted_attr = edge_attr[order]

    prev_ci = jnp.concatenate([jnp.full((1,), -1, dtype=sci.dtype), sci[:-1]])
    prev_cj = jnp.concatenate([jnp.full((1,), -1, dtype=scj.dtype), scj[:-1]])
    is_first = (sci != prev_ci) | (scj != prev_cj)
    group = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [E] 0..K-1
    sorted_valid = sci < capacity
    group_or_oob = jnp.where(sorted_valid, group, num_edges)

    pooled_attr = segment_sum(sorted_attr, group_or_oob, num_edges)

    # representative cluster pair per group (all members share the pair)
    slot_ci = jnp.full((num_edges,), capacity, dtype=sci.dtype)
    slot_ci = slot_ci.at[group_or_oob].min(sci, mode="drop")
    slot_cj = jnp.full((num_edges,), capacity, dtype=scj.dtype)
    slot_cj = slot_cj.at[group_or_oob].min(scj, mode="drop")
    pooled_mask = slot_ci < capacity
    # invalid slots point OOB so downstream scatters drop them
    pooled_ci = jnp.where(pooled_mask, slot_ci, capacity)
    pooled_cj = jnp.where(pooled_mask, slot_cj, capacity)

    return jnp.stack([pooled_ci, pooled_cj]), pooled_attr, pooled_mask


def community_pool(
    x: jnp.ndarray,  # f32 [V, F]
    pos: jnp.ndarray,  # f32 [V, 3]
    edge_index: jnp.ndarray,  # i32 [2, E]
    edge_attr: jnp.ndarray,  # f32 [E, Fe]
    edge_mask: jnp.ndarray,  # bool [E]
    node_graph: jnp.ndarray,  # i32 [V] (padded OOB)
    cluster: jnp.ndarray,  # i32 [V] node -> cluster (padded OOB)
    num_graphs: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pool all cluster members into single nodes (max features, mean position).

    Returns (x' [V, F], pos' [V, 3], edge_index' [2, E], edge_attr' [E, Fe],
    edge_mask' [E], node_graph' [V], node_mask' [V]) where row c of the pooled
    arrays is cluster c (same capacity V, padded slots masked).
    """
    capacity = x.shape[0]
    x_pooled = segment_max(x, cluster, capacity)
    pos_pooled = segment_mean(pos, cluster, capacity)

    # graph id per cluster: all members share it; use min (empty -> num_graphs)
    graph_pooled = jnp.full((capacity,), num_graphs, dtype=node_graph.dtype)
    graph_pooled = graph_pooled.at[cluster].min(node_graph, mode="drop")
    member_counts = segment_sum(jnp.ones_like(cluster, dtype=jnp.float32) * (cluster < capacity), cluster, capacity)
    node_mask_pooled = member_counts > 0

    ei, ea, em = pool_edges_coalesce(edge_index, edge_attr, edge_mask, cluster, capacity)
    return x_pooled, pos_pooled, ei, ea, em, graph_pooled, node_mask_pooled


def member_max_pool(
    h: jnp.ndarray,  # f32 [V, F] non-negative features (padded rows 0)
    members: jnp.ndarray,  # i32 [C, S] member node slots per cluster; padding = V
    cluster: jnp.ndarray,  # i32 [V] node -> cluster (padded >= C) — the inverse map
) -> jnp.ndarray:
    """Per-cluster feature max via a host-precomputed member matrix — the
    scatter-free twin of :func:`segment_max` for static clusterings.

    XLA lowers scatter-max over V rows at ~9 ns/row; at atomic scale the one
    cluster0 pooling scatter (plus its VJP twin) cost 1.74 ms of a 4.0 ms
    clustered-BCSR train step (profiled round 3). Member lists are static
    per batch, so the pool becomes a fused gather + S-way reduce, and the
    custom VJP routes gradients back with GATHERS only: every max-achieving
    member gets the FULL cotangent (round-5 change — the tie-count pass
    cost a second [S, C, F] compare+sum over the hot gather; ties only
    matter on measure-zero sets: exact POSITIVE ties in continuous conv
    activations, or zero-max members that are relu-dead downstream — so
    this matches the scatter-max VJP within float tolerance; the parity
    tests assert it against the COO models).

    Requires ``h >= 0`` with padded rows zero (all models pool post-relu,
    masked features): empty clusters then give 0, the torch_scatter
    zero-init parity :func:`segment_max` documents.
    """
    v = h.shape[0]
    num_c = members.shape[0]
    f = h.shape[1]

    def _gathered(h):
        # S-leading layout: the gather emits [S, C, F] and both reductions
        # run over the MAJOR axis, which XLA lowers without the layout
        # copy + reshape churn the [C, S, F] form cost (~190 us at 100k
        # nodes, profiled round 3)
        mt = members.T  # [S, C]
        safe = jnp.clip(mt, 0, v - 1)
        valid = (mt < v)[..., None]
        return jnp.where(valid, h[safe], 0.0)  # [S, C, F]

    @jax.custom_vjp
    def pool(h):
        return _gathered(h).max(axis=0)

    def fwd(h):
        pooled = pool(h)
        return pooled, (h, pooled)

    def bwd(res, g):
        h, pooled = res
        c = jnp.clip(cluster, 0, num_c - 1)
        cvalid = (cluster < num_c)[:, None]
        # one packed [C, 2F] gather instead of two same-index [C, F] ones
        # (row gathers are row-count-bound at ~1.3 us per 1k rows on v5e,
        # bytes-per-row second-order)
        packed = jnp.concatenate([pooled, g], axis=1)[c]  # [V, 2F]
        winner = (h == packed[:, :f]) & cvalid
        d_h = jnp.where(winner, packed[:, f:], 0.0)
        return (d_h,)

    pool.defvjp(fwd, bwd)
    return pool(h)


def diag_depth0_pool(h_t: jnp.ndarray, batch) -> jnp.ndarray:
    """Depth-0 community pooling for :class:`~deeprank2_tpu.ops.batch.DiagClusteredBatch`
    activations (``[F, G*N]`` -> ``[F, G*K]``), shared by the diag model
    family.

    Pure slot8 batches: the aligned 8-lane slot max (ops/pallas_slotpool.py)
    + per-cluster slot combine. MIXED batches (``region_caps`` set): each
    size-class region pools with its own stride through the generalized
    slot kernel (the 1-lane region IS its pooled values) and the per-graph
    segments concatenate straight into pooled order — no node-level member
    gathers anywhere."""
    from deeprank2_tpu.ops.pallas_slotpool import slot_group_max

    if not batch.region_caps:
        mask_row = batch.node_mask.astype(h_t.dtype).reshape(1, -1)
        p8 = slot_group_max(h_t, mask_row)
        k_tot = batch.pooled_mask.size
        if batch.members0s.size:
            hp = member_max_pool(p8.T, batch.members0s, batch.slot_cluster)  # [G*K, F]
        else:
            hp = segment_max(p8.T, batch.slot_cluster, k_tot)
        return hp.T  # [F, G*K]

    nb, n4, n2, n1, kbig = batch.region_caps
    f = h_t.shape[0]
    num_graphs, k_cap = batch.pooled_mask.shape
    n_cap = batch.node_mask.shape[1]
    h3 = h_t.reshape(f, num_graphs, n_cap)
    m3 = batch.node_mask.astype(h_t.dtype)

    segs = []
    if nb:
        hb = h3[:, :, :nb].reshape(f, num_graphs * nb)
        mb = m3[:, :nb].reshape(1, num_graphs * nb)
        p8 = slot_group_max(hb, mb)  # [F, G*nb/8]
        if batch.members0s.size:
            comb = member_max_pool(p8.T, batch.members0s, batch.slot_cluster)  # [G*kbig, F]
        else:  # one pathological cluster tripped the member-matrix size guard
            comb = segment_max(p8.T, batch.slot_cluster, num_graphs * kbig)
        segs.append(comb.T.reshape(f, num_graphs, kbig))
    off = nb
    for stride, ns in ((4, n4), (2, n2)):
        if ns:
            hs = h3[:, :, off : off + ns].reshape(f, num_graphs * ns)
            ms = m3[:, off : off + ns].reshape(1, num_graphs * ns)
            ps = slot_group_max(hs, ms, slot=stride)
            segs.append(ps.reshape(f, num_graphs, ns // stride))
        off += ns
    if n1:
        segs.append(h3[:, :, off : off + n1])
    hp3 = jnp.concatenate(segs, axis=2) if len(segs) > 1 else segs[0]
    if hp3.shape[2] < k_cap:
        hp3 = jnp.pad(hp3, ((0, 0), (0, 0), (0, k_cap - hp3.shape[2])))
    return hp3.reshape(f, num_graphs * k_cap)


def max_pool_x(
    cluster: jnp.ndarray,  # i32 [V] node -> cluster (padded OOB)
    x: jnp.ndarray,  # f32 [V, F]
    node_graph: jnp.ndarray,  # i32 [V]
    num_graphs: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-cluster feature max + per-cluster graph id (PyG ``max_pool_x``)."""
    capacity = x.shape[0]
    x_pooled = segment_max(x, cluster, capacity)
    graph_pooled = jnp.full((capacity,), num_graphs, dtype=node_graph.dtype)
    graph_pooled = graph_pooled.at[cluster].min(node_graph, mode="drop")
    return x_pooled, graph_pooled


def graph_mean_pool(x: jnp.ndarray, node_graph: jnp.ndarray, num_graphs: int) -> jnp.ndarray:
    """Mean of node features per graph (padded nodes carry OOB graph ids)."""
    return segment_mean(x, node_graph, num_graphs)


def tiled_graph_mean_pool(
    h_t: jnp.ndarray,  # f32 [F, NT*B] transposed node features, padded cols 0
    node_graph: jnp.ndarray,  # i32 [NT*B] graph id per node; padded >= num_graphs
    node_mask: jnp.ndarray,  # bool [NT*B]
    num_graphs: int,
    block: int = 128,
) -> jnp.ndarray:
    """Per-graph masked feature mean for tile-aligned layouts — ``[G, F]``.

    XLA lowers a scatter over V rows at ~9 ns/row, which at atomic scale
    (V = 100k) made the single ``segment_mean`` the most expensive op of the
    whole BCSR train step (0.88 ms, profiled round 3). Block-sparse collation
    guarantees no 128-node tile spans two graphs, so the sum factorizes:
    reduce each tile on the VPU (one pass over ``h_t``), then scatter only
    the NT tile partials. Padded columns MUST already be zero (the models
    multiply by ``node_mask`` before pooling).
    """
    f, vpad = h_t.shape
    nt = vpad // block
    tile_sums = h_t.reshape(f, nt, block).sum(axis=2)  # [F, NT]
    gid = jnp.where(node_mask, node_graph, num_graphs).reshape(nt, block)
    tile_graph = jnp.min(gid, axis=1)  # [NT]; empty tiles -> num_graphs (dropped)
    tile_counts = node_mask.reshape(nt, block).sum(axis=1, dtype=jnp.float32)
    sums = segment_sum(tile_sums.T, tile_graph, num_graphs)  # [G, F]
    counts = segment_sum(tile_counts, tile_graph, num_graphs)
    return sums / jnp.maximum(counts, 1.0)[:, None]


def tiled_graph_mean_pool_rows(
    x: jnp.ndarray,  # f32 [NT*B, F] node features, padded rows 0
    node_graph: jnp.ndarray,  # i32 [NT*B]; padded >= num_graphs
    node_mask: jnp.ndarray,  # bool [NT*B]
    num_graphs: int,
    block: int,
) -> jnp.ndarray:
    """Row-major variant of :func:`tiled_graph_mean_pool` (same tile-aligned
    contract; the blocked-edge layout uses 256-node tiles)."""
    vpad, f = x.shape
    nt = vpad // block
    tile_sums = x.reshape(nt, block, f).sum(axis=1)  # [NT, F]
    gid = jnp.where(node_mask, node_graph, num_graphs).reshape(nt, block)
    tile_graph = jnp.min(gid, axis=1)
    tile_counts = node_mask.reshape(nt, block).sum(axis=1, dtype=jnp.float32)
    sums = segment_sum(tile_sums, tile_graph, num_graphs)
    counts = segment_sum(tile_counts, tile_graph, num_graphs)
    return sums / jnp.maximum(counts, 1.0)[:, None]


# ----------------------------------------------------------------------
# Block-dense pooling (see ops/batch.py:DenseGraphBatch)
# ----------------------------------------------------------------------
def dense_segment_max(x: jnp.ndarray, cluster: jnp.ndarray) -> jnp.ndarray:
    """Per-cluster feature max on ``[G, N, F]`` blocks with per-graph local
    cluster ids ``[G, N]`` (padded entries >= N). Returns ``[G, N, F]`` where
    row k of graph g is cluster k (empty clusters 0)."""
    num_graphs, cap_n, feat = x.shape
    offsets = jnp.arange(num_graphs, dtype=cluster.dtype)[:, None] * cap_n
    flat_ids = jnp.where(cluster < cap_n, cluster + offsets, num_graphs * cap_n)
    flat = segment_max(x.reshape(num_graphs * cap_n, feat), flat_ids.reshape(-1), num_graphs * cap_n)
    return flat.reshape(num_graphs, cap_n, feat)


def dense_community_pool(
    x: jnp.ndarray,  # f32 [G, N, F]
    pos: jnp.ndarray,  # f32 [G, N, 3]
    adj: jnp.ndarray,  # f32 [G, N, N]
    cluster: jnp.ndarray,  # i32 [G, N] local cluster ids (padded >= N)
    adj_w: jnp.ndarray | None = None,  # f32 [G, N, N] scalar edge weights
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray | None, jnp.ndarray]:
    """Community pooling on dense blocks: max features, mean positions, and
    pooled adjacency via the one-hot congruence ``C^T A C`` (two batched MXU
    matmuls) — the dense equivalent of :func:`community_pool`.

    Coalesce parity: pooled 0/1 adjacency marks distinct cluster pairs (PyG
    ``coalesce`` keeps one edge per pair); ``adj_w`` entries are summed over
    member edges (coalesce sums attrs). Self-loops are dropped.

    Returns ``(x', pos', adj', adj_w', node_mask')`` with rows = clusters.
    """
    num_graphs, cap_n, _ = x.shape
    onehot = jax.nn.one_hot(jnp.where(cluster < cap_n, cluster, cap_n), cap_n, dtype=x.dtype, axis=-1)  # [G, N, K]

    x_pooled = dense_segment_max(x, cluster)
    counts = onehot.sum(axis=1)  # [G, K]
    pos_pooled = jnp.einsum("gnk,gnd->gkd", onehot, pos) / jnp.maximum(counts, 1.0)[:, :, None]

    pooled_counts = jnp.einsum("gik,gij,gjl->gkl", onehot, adj, onehot)  # member-edge counts per cluster pair
    eye = jnp.eye(cap_n, dtype=x.dtype)
    adj_pooled = (pooled_counts > 0).astype(x.dtype) * (1.0 - eye)
    adj_w_pooled = None
    if adj_w is not None:
        adj_w_pooled = jnp.einsum("gik,gij,gjl->gkl", onehot, adj_w, onehot) * (1.0 - eye)

    node_mask_pooled = counts > 0
    return x_pooled, pos_pooled, adj_pooled, adj_w_pooled, node_mask_pooled
