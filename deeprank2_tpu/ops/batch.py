"""Padded, statically-shaped graph batches — the TPU answer to PyG's dynamic
``Batch`` collation (reference: torch_geometric DataLoader in trainer.py:541).

A :class:`GraphBatch` is a pytree of dense arrays:

- nodes of all graphs are concatenated and padded to a bucketed ``V``;
- edges are *mirrored* ((i,j) and (j,i), reference dataset.py:944-951) and
  padded to a bucketed ``E``; padded edges point at segment id ``V`` so XLA
  scatters drop them;
- per-graph targets padded to ``G``; padded graphs masked in the loss.

Bucketing rounds (V, E) up to a coarse grid so jit recompiles only a handful of
times per dataset instead of once per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import ml_dtypes
import numpy as np


def bucket_size(n: int, quantum: int = 128) -> int:
    """Round up to a coarse geometric/linear grid to bound recompilation."""
    n = max(n, 1)
    if n <= quantum:
        return quantum
    # geometric steps of 1.3x, snapped to the quantum
    size = quantum
    while size < n:
        size = int(np.ceil(size * 1.3 / quantum) * quantum)
    return size


@jax.tree_util.register_dataclass
@dataclass
class GraphBatch:
    """One padded batch of graphs (all arrays are dense, statically shaped)."""

    x: jax.Array  # f32 [V, F] node features (padded rows are 0)
    edge_index: jax.Array  # i32 [2, E] mirrored edges; padded entries = V
    edge_attr: jax.Array  # f32 [E, Fe]
    pos: jax.Array  # f32 [V, 3]
    node_graph: jax.Array  # i32 [V] graph id per node; padded = G
    edge_mask: jax.Array  # bool [E]
    node_mask: jax.Array  # bool [V]
    y: jax.Array  # f32 [G] targets (0 where missing)
    y_mask: jax.Array  # bool [G] real-graph mask
    cluster0: jax.Array  # i32 [V] batch-global cluster ids at depth 0; padded = C0 cap
    cluster1: jax.Array  # i32 [V] batch-global cluster ids at depth 1 (indexed by depth-0 cluster); padded rows unused
    num_graphs: int = field(metadata={"static": True})  # static under jit

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.edge_index.shape[1]


def collate_graphs(entries: list[dict], pad_graphs: int | None = None) -> tuple[GraphBatch, list[str]]:
    """Collate per-entry numpy dicts (from GraphDataset.load_one_graph) into one
    padded GraphBatch.

    Each entry dict has: ``x [v,F]``, ``edge_index [e,2]`` (undirected, will be
    mirrored), ``edge_attr [e,Fe]``, ``pos [v,3]``, ``y`` scalar or None,
    optional ``cluster0 [v]``, ``cluster1 [c0]``, and ``entry_name``.

    Returns the batch and the list of entry names (padded slots get "").
    """
    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)

    v_counts = [e["x"].shape[0] for e in entries]
    e_counts = [e["edge_index"].shape[0] * 2 for e in entries]
    total_v = int(sum(v_counts))
    total_e = int(sum(e_counts))
    cap_v = bucket_size(total_v)
    cap_e = bucket_size(total_e)

    feat_dim = entries[0]["x"].shape[1]
    edge_dim = entries[0]["edge_attr"].shape[1] if entries[0]["edge_attr"].ndim == 2 else 1

    x = np.zeros((cap_v, feat_dim), dtype=np.float32)
    pos = np.zeros((cap_v, 3), dtype=np.float32)
    node_graph = np.full(cap_v, num_graphs, dtype=np.int32)
    node_mask = np.zeros(cap_v, dtype=bool)
    edge_index = np.full((2, cap_e), cap_v, dtype=np.int32)
    edge_attr = np.zeros((cap_e, edge_dim), dtype=np.float32)
    edge_mask = np.zeros(cap_e, dtype=bool)
    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    cluster0 = np.full(cap_v, cap_v, dtype=np.int32)
    cluster1 = np.full(cap_v, cap_v, dtype=np.int32)

    v_off = 0
    e_off = 0
    c0_off = 0  # global depth-0 cluster id offset
    c1_off = 0  # global depth-1 cluster id offset
    have_clusters = all(e.get("cluster0") is not None and e.get("cluster1") is not None for e in entries)

    for g, entry in enumerate(entries):
        v = entry["x"].shape[0]
        x[v_off : v_off + v] = entry["x"]
        pos[v_off : v_off + v] = entry["pos"]
        node_graph[v_off : v_off + v] = g
        node_mask[v_off : v_off + v] = True

        und = np.asarray(entry["edge_index"], dtype=np.int64)
        mirrored = np.concatenate([und, und[:, ::-1]], axis=0)  # [2e, 2]
        e2 = mirrored.shape[0]
        edge_index[:, e_off : e_off + e2] = (mirrored + v_off).T
        ea = np.asarray(entry["edge_attr"], dtype=np.float32)
        if ea.ndim == 1:
            ea = ea[:, None]
        edge_attr[e_off : e_off + e2] = np.concatenate([ea, ea], axis=0)
        edge_mask[e_off : e_off + e2] = True

        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

        if have_clusters:
            c0 = np.asarray(entry["cluster0"], dtype=np.int64)
            c1 = np.asarray(entry["cluster1"], dtype=np.int64)
            n_c0 = int(c0.max()) + 1 if c0.size else 0
            n_c1 = int(c1.max()) + 1 if c1.size else 0
            cluster0[v_off : v_off + v] = c0 + c0_off
            # cluster1 is indexed by depth-0 cluster id (length n_c0)
            cluster1[c0_off : c0_off + n_c0] = c1 + c1_off
            c0_off += n_c0
            c1_off += n_c1

        v_off += v
        e_off += e2

    # sort edges by destination row (padded edges carry cap_v and stay last):
    # ascending segment ids let aggregation use sorted-scatter / the Pallas
    # banded-matmul kernel
    order = np.argsort(edge_index[0], kind="stable")
    edge_index = edge_index[:, order]
    edge_attr = edge_attr[order]
    edge_mask = edge_mask[order]

    batch = GraphBatch(
        x=x,
        edge_index=edge_index,
        edge_attr=edge_attr,
        pos=pos,
        node_graph=node_graph,
        edge_mask=edge_mask,
        node_mask=node_mask,
        y=y,
        y_mask=y_mask,
        cluster0=cluster0,
        cluster1=cluster1,
        num_graphs=num_graphs,
    )
    return batch, names


def collate_graphs_sharded(entries: list[dict], num_shards: int, pad_graphs_per_shard: int) -> tuple[GraphBatch, list[str]]:
    """Collate into ``num_shards`` equally-shaped sub-batches stacked on a
    leading device axis (for shard_map data parallelism).

    Entries are dealt round-robin; every shard is padded to the same (V, E)
    caps so the stacked arrays are rectangular.
    """
    shards: list[list[dict]] = [[] for _ in range(num_shards)]
    for i, entry in enumerate(entries):
        shards[i % num_shards].append(entry)

    # shared caps across shards
    cap_v = bucket_size(max(sum(e["x"].shape[0] for e in shard) for shard in shards if shard) if entries else 1)
    cap_e = bucket_size(max(sum(e["edge_index"].shape[0] * 2 for e in shard) for shard in shards if shard) if entries else 1)

    batches = []
    names: list[str] = []
    template = entries[0]
    for shard in shards:
        if not shard:  # empty shard: one dummy zero-graph batch
            shard = [{**_dummy_entry(template), "cluster0": None, "cluster1": None}]
        batch, shard_names = collate_graphs(shard, pad_graphs=pad_graphs_per_shard)
        # re-pad to the shared caps
        batch = _repad(batch, cap_v, cap_e)
        batches.append(batch)
        names.extend(shard_names)

    stacked = jax.tree.map(lambda *leaves: np.stack(leaves), *batches)
    return stacked, names


def _repad(batch: GraphBatch, cap_v: int, cap_e: int) -> GraphBatch:
    """Grow a batch's node/edge capacity to shared caps (masked padding)."""
    v0, e0 = batch.num_nodes, batch.num_edges
    if v0 == cap_v and e0 == cap_e:
        return batch
    pad_v = cap_v - v0
    pad_e = cap_e - e0

    def pad_nodes(a, fill=0):
        return np.pad(a, ((0, pad_v),) + ((0, 0),) * (a.ndim - 1), constant_values=fill)

    # node-index content must stay consistent: old OOB marker was v0, new is cap_v
    edge_index = np.where(batch.edge_index >= v0, cap_v, batch.edge_index)
    edge_index = np.pad(edge_index, ((0, 0), (0, pad_e)), constant_values=cap_v)
    cluster0 = np.where(batch.cluster0 >= v0, cap_v, batch.cluster0)
    cluster1 = np.where(batch.cluster1 >= v0, cap_v, batch.cluster1)

    return GraphBatch(
        x=pad_nodes(batch.x),
        edge_index=edge_index,
        edge_attr=np.pad(batch.edge_attr, ((0, pad_e), (0, 0))),
        pos=pad_nodes(batch.pos),
        node_graph=pad_nodes(batch.node_graph, fill=batch.num_graphs),
        edge_mask=np.pad(batch.edge_mask, (0, pad_e)),
        node_mask=pad_nodes(batch.node_mask),
        y=batch.y,
        y_mask=batch.y_mask,
        cluster0=np.pad(cluster0, (0, pad_v), constant_values=cap_v),
        cluster1=np.pad(cluster1, (0, pad_v), constant_values=cap_v),
        num_graphs=batch.num_graphs,
    )


@jax.tree_util.register_dataclass
@dataclass
class DenseGraphBatch:
    """Block-dense batch: per-graph node arrays + dense adjacency blocks.

    The batch adjacency of collated graphs is block-diagonal (edges never cross
    graphs), so with graphs bucketed to ``N`` nodes the aggregation
    ``segment_sum(x[col], row)`` is exactly the batched MXU matmul
    ``adj @ x`` — no gather/scatter at all. This is the TPU-native layout for
    graph batches whose per-graph node count is small (residue PPI/SRV graphs:
    tens to a few hundred nodes); the COO :class:`GraphBatch` remains for
    models that need per-edge features in their messages.
    """

    x: jax.Array  # f32 [G, N, F] node features (padded rows 0)
    # bf16 [G, N, N]; adj[g, i, j] = 1 if directed edge j->i. Entries are
    # exactly 0/1 (lossless in bf16) and the adjacency stream is the step's
    # dominant HBM traffic (read 4x: two forward layers + their VJPs), so
    # bf16 halves the bandwidth bound; consumers accumulate in f32.
    adj: jax.Array
    pos: jax.Array  # f32 [G, N, 3]
    node_mask: jax.Array  # bool [G, N]
    y: jax.Array  # f32 [G]
    y_mask: jax.Array  # bool [G]
    # scalar-edge-weighted adjacency (first edge-attr channel; for models whose
    # messages scale by a scalar edge feature, e.g. sGAT x distance). Empty
    # [G, 0, 0] when not collated.
    adj_w: jax.Array = None  # type: ignore[assignment]
    # per-graph local cluster ids (precluster depth 0/1); padded entries = N.
    # cluster1 is indexed by depth-0 cluster id. Empty [G, 0] when absent.
    cluster0: jax.Array = None  # type: ignore[assignment]
    cluster1: jax.Array = None  # type: ignore[assignment]
    # graph-diagonal fast-path operands (ops/diag_spmm.py): the same adjacency
    # stored int8 (entries are exactly 0/1; half the bf16 stream bytes), and
    # node features flat + transposed ([F, G*N], features on sublanes) so the
    # whole tower runs 2-D with no batched matmuls. None when not collated.
    adj_i8: jax.Array = None  # type: ignore[assignment]
    x_t: jax.Array = None  # type: ignore[assignment]

    @property
    def num_graphs(self) -> int:
        return self.x.shape[0]

    @property
    def nodes_per_graph(self) -> int:
        return self.x.shape[1]


def collate_graphs_dense(
    entries: list[dict],
    pad_graphs: int | None = None,
    pad_nodes: int | None = None,
    with_clusters: bool = False,
    with_edge_weights: bool = False,
    with_diag_operands: bool = True,
) -> tuple[DenseGraphBatch, list[str]]:
    """Collate entries (same dicts as :func:`collate_graphs`) into a
    :class:`DenseGraphBatch`. Edges are mirrored into a symmetric adjacency.

    ``pad_nodes`` bounds nodes per graph (bucketed from the data when None).
    ``with_clusters`` fills ``cluster0``/``cluster1`` from precluster entries;
    ``with_edge_weights`` fills ``adj_w`` from the first edge-attr channel;
    ``with_diag_operands`` additionally ships the graph-diagonal fast-path
    operands (``adj_i8``/``x_t`` — ops/diag_spmm.py). Models that run the
    batched XLA formulation (the clustered dense family) should pass False:
    the pair costs ~25 MB of dead host->device transfer per bench-shaped
    batch (the Trainer dispatches on the model's ``diag_operands`` marker).
    """
    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)
    max_v = max(e["x"].shape[0] for e in entries)
    cap_n = pad_nodes or bucket_size(max_v, quantum=32)
    if max_v > cap_n:
        msg = f"graph with {max_v} nodes exceeds dense node capacity {cap_n}"
        raise ValueError(msg)
    feat_dim = entries[0]["x"].shape[1]

    x = np.zeros((num_graphs, cap_n, feat_dim), dtype=np.float32)
    adj = np.zeros((num_graphs, cap_n, cap_n), dtype=ml_dtypes.bfloat16)
    pos = np.zeros((num_graphs, cap_n, 3), dtype=np.float32)
    node_mask = np.zeros((num_graphs, cap_n), dtype=bool)
    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    adj_w = np.zeros((num_graphs, cap_n, cap_n), dtype=np.float32) if with_edge_weights else np.zeros((num_graphs, 0, 0), dtype=np.float32)
    cluster0 = np.full((num_graphs, cap_n if with_clusters else 0), cap_n, dtype=np.int32)
    cluster1 = np.full((num_graphs, cap_n if with_clusters else 0), cap_n, dtype=np.int32)

    for g, entry in enumerate(entries):
        v = entry["x"].shape[0]
        x[g, :v] = entry["x"]
        pos[g, :v] = entry["pos"]
        node_mask[g, :v] = True
        und = np.asarray(entry["edge_index"], dtype=np.int64)
        if und.size:
            adj[g, und[:, 0], und[:, 1]] = 1.0
            adj[g, und[:, 1], und[:, 0]] = 1.0
            if with_edge_weights:
                ea = np.asarray(entry["edge_attr"], dtype=np.float32).reshape(len(und), -1)[:, 0]
                # coalesce parity: duplicate pairs SUM their weights
                np.add.at(adj_w[g], (und[:, 0], und[:, 1]), ea)
                np.add.at(adj_w[g], (und[:, 1], und[:, 0]), ea)
        if with_clusters:
            c0 = np.asarray(entry["cluster0"], dtype=np.int32)
            c1 = np.asarray(entry["cluster1"], dtype=np.int32)
            cluster0[g, :v] = c0
            cluster1[g, : len(c1)] = c1
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    return DenseGraphBatch(
        x=x,
        adj=adj,
        pos=pos,
        node_mask=node_mask,
        y=y,
        y_mask=y_mask,
        adj_w=adj_w,
        cluster0=cluster0,
        cluster1=cluster1,
        adj_i8=adj.astype(np.int8) if with_diag_operands else np.zeros((0, 0, 0), np.int8),
        x_t=np.ascontiguousarray(x.reshape(num_graphs * cap_n, feat_dim).T) if with_diag_operands else np.zeros((0, 0), np.float32),
    ), names


def collate_graphs_dense_sharded(
    entries: list[dict],
    num_shards: int,
    pad_graphs_per_shard: int,
    pad_nodes: int | None = None,
    with_clusters: bool = False,
    with_edge_weights: bool = False,
    with_diag_operands: bool = True,
) -> tuple[DenseGraphBatch, list[str]]:
    """Round-robin dense collation with a leading device axis (shard_map DP).

    Dense batches shard on the graph axis with no cross-shard coupling (the
    adjacency is per-graph), so DP is a plain stack of per-shard batches.
    """
    shards: list[list[dict]] = [[] for _ in range(num_shards)]
    for i, entry in enumerate(entries):
        shards[i % num_shards].append(entry)

    cap_n = pad_nodes or bucket_size(max(e["x"].shape[0] for e in entries), quantum=32)
    feat_dim = entries[0]["x"].shape[1]
    batches = []
    names: list[str] = []
    for shard in shards:
        if not shard:
            shard = [_dummy_entry({**entries[0], "cluster0": np.zeros(1, np.int32)})]
        batch, shard_names = collate_graphs_dense(
            shard,
            pad_graphs=pad_graphs_per_shard,
            pad_nodes=cap_n,
            with_clusters=with_clusters,
            with_edge_weights=with_edge_weights,
            with_diag_operands=with_diag_operands,
        )
        batches.append(batch)
        names.extend(shard_names)
    return jax.tree.map(lambda *leaves: np.stack(leaves), *batches), names


@jax.tree_util.register_dataclass
@dataclass
class GridBatch:
    """One padded batch of 3D grids: ``x [G, C, W, H, D]``, targets ``y [G]``."""

    x: jax.Array
    y: jax.Array
    y_mask: jax.Array


def collate_grids(entries: list[dict], pad_graphs: int | None = None) -> tuple[GridBatch, list[str]]:
    """Collate per-entry dicts (``x [C,W,H,D]``, ``y`` scalar/None) to a GridBatch."""
    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)
    shape = entries[0]["x"].shape
    x = np.zeros((num_graphs, *shape), dtype=np.float32)
    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    for g, entry in enumerate(entries):
        x[g] = entry["x"]
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True
    return GridBatch(x=x, y=y, y_mask=y_mask), names


def collate_grids_sharded(entries: list[dict], num_shards: int, pad_graphs_per_shard: int) -> tuple[GridBatch, list[str]]:
    """Round-robin grid collation with a leading device axis (for shard_map DP)."""
    shards: list[list[dict]] = [[] for _ in range(num_shards)]
    for i, entry in enumerate(entries):
        shards[i % num_shards].append(entry)
    batches = []
    names: list[str] = []
    shape = entries[0]["x"].shape
    for shard in shards:
        if not shard:
            shard = [{"x": np.zeros(shape, np.float32), "y": None, "entry_name": ""}]
        batch, shard_names = collate_grids(shard, pad_graphs=pad_graphs_per_shard)
        batches.append(batch)
        names.extend(shard_names)
    return jax.tree.map(lambda *leaves: np.stack(leaves), *batches), names


@jax.tree_util.register_dataclass
@dataclass
class BlockSparseBatch:
    """A batch of *large* graphs in the block-sparse layout (ops/block_sparse.py).

    Nodes of each graph are locality-reordered, padded to a whole number of
    128-node tiles (so adjacency blocks never span graphs), and concatenated.
    This is the layout for atomic-resolution graphs too big for the dense
    ``[G, N, N]`` adjacency.
    """

    x: jax.Array  # f32 [NT*B, F] node features in locality order (padded rows 0)
    pos: jax.Array  # f32 [NT*B, 3]
    node_graph: jax.Array  # i32 [NT*B] graph id per node; padded = G
    node_mask: jax.Array  # bool [NT*B]
    y: jax.Array  # f32 [G]
    y_mask: jax.Array  # bool [G]
    structure: "BlockSparseStructure"  # BCSR adjacency over all NT tiles
    num_graphs: int = field(metadata={"static": True})

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]


def _dummy_entry(template: dict) -> dict:
    """A 1-node, 0-edge placeholder entry matching ``template``'s schema —
    used by the sharded collates to give empty shards a well-formed batch."""
    entry = {
        "x": np.zeros((1, template["x"].shape[1]), dtype=np.float32),
        "edge_index": np.zeros((0, 2), dtype=np.int64),
        "pos": np.zeros((1, 3), dtype=np.float32),
        "y": None,
        "entry_name": "",
    }
    if "edge_attr" in template:
        ea = template["edge_attr"]
        entry["edge_attr"] = np.zeros((0, ea.shape[1] if ea.ndim == 2 else 1), dtype=np.float32)
    if template.get("cluster0") is not None:
        entry["cluster0"] = np.zeros(1, dtype=np.int32)
        entry["cluster1"] = np.zeros(1, dtype=np.int32)
    return entry


def blocksparse_layout(
    entries: list[dict], block: int = 128, num_graphs: int | None = None, features: bool = True, plans: list[dict] | None = None
) -> dict:
    """The shared locality pass for block-sparse collation: per-entry
    locality orders, tile-padded feature copies (when ``features``), and the
    remapped undirected pairs. One implementation backs collation, the
    requirements pass, and partitioned collation so capacities never drift.

    ``plans`` (the slot8 layout, :func:`_slot8_plan`) overrides the per-entry
    row placement: plan ``posmap`` maps original node index -> row (holes are
    intra-cluster padding rows) and ``cap`` is the entry's row capacity."""
    from deeprank2_tpu.ops.block_sparse import locality_order

    num_graphs = len(entries) if num_graphs is None else num_graphs
    feat_dim = entries[0]["x"].shape[1] if entries else 0
    xs, poss, graph_ids, masks, pairs = [], [], [], [], []
    orders, offsets = [], []
    offset = 0
    for g, entry in enumerate(entries):
        v = entry["x"].shape[0]
        if plans is not None:
            posmap, cap = plans[g]["posmap"], plans[g]["cap"]
            order = None
        else:
            order = locality_order(entry["pos"]) if v > block else np.arange(v)
            inv = np.empty(v, dtype=np.int64)
            inv[order] = np.arange(v)
            posmap, cap = inv, -(-v // block) * block
        und = np.asarray(entry["edge_index"], dtype=np.int64).reshape(-1, 2)
        pairs.append(posmap[und] + offset)
        orders.append(order)
        offsets.append(offset)
        if features:
            x = np.zeros((cap, feat_dim), dtype=np.float32)
            x[posmap] = entry["x"]
            pos = np.zeros((cap, 3), dtype=np.float32)
            pos[posmap] = entry["pos"]
            gid = np.full(cap, num_graphs, dtype=np.int32)
            gid[posmap] = g
            m = np.zeros(cap, dtype=bool)
            m[posmap] = True
            xs.append(x)
            poss.append(pos)
            graph_ids.append(gid)
            masks.append(m)
        offset += cap
    return {
        "xs": xs,
        "poss": poss,
        "graph_ids": graph_ids,
        "masks": masks,
        "pairs": np.concatenate(pairs) if pairs else np.zeros((0, 2), np.int64),
        "num_tiles": max(offset // block, 1),
        "feat_dim": feat_dim,
        # per-entry locality orders and global node offsets: the clustered
        # collate remaps host-side cluster assignments through these
        "orders": orders,
        "offsets": offsets,
    }


def collate_graphs_blocksparse(
    entries: list[dict],
    block: int = 128,
    pad_tiles: int | None = None,
    pad_blocks: int | None = None,
    pad_graphs: int | None = None,
) -> tuple[BlockSparseBatch, list[str]]:
    """Collate entry dicts (same schema as :func:`collate_graphs`) into a
    :class:`BlockSparseBatch`. ``pad_tiles``/``pad_blocks``/``pad_graphs``
    bucket the capacities to bound jit recompilation; ``pad_tiles`` and
    ``pad_blocks`` may be callables ``required -> capacity`` (the Trainer
    installs grow-only geometric buckets this way)."""
    from deeprank2_tpu.ops.block_sparse import build_blocksparse

    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    if num_real > num_graphs:
        msg = f"{num_real} entries exceed pad_graphs={num_graphs}"
        raise ValueError(msg)
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)

    layout = blocksparse_layout(entries, block, num_graphs)
    xs, poss, graph_ids, masks = layout["xs"], layout["poss"], layout["graph_ids"], layout["masks"]
    feat_dim = layout["feat_dim"]
    num_tiles = layout["num_tiles"]

    if callable(pad_tiles):
        pad_tiles = pad_tiles(num_tiles)
    if pad_tiles is not None:
        if pad_tiles < num_tiles:
            msg = f"pad_tiles={pad_tiles} < required {num_tiles}"
            raise ValueError(msg)
        extra = (pad_tiles - num_tiles) * block
        if extra:
            xs.append(np.zeros((extra, feat_dim), np.float32))
            poss.append(np.zeros((extra, 3), np.float32))
            graph_ids.append(np.full(extra, num_graphs, np.int32))
            masks.append(np.zeros(extra, bool))
        num_tiles = pad_tiles

    structure = build_blocksparse(
        layout["pairs"],
        num_nodes=num_tiles * block,
        block=block,
        pad_blocks_to=pad_blocks,
    )

    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    for g, entry in enumerate(entries):
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    return BlockSparseBatch(
        x=np.concatenate(xs),
        pos=np.concatenate(poss),
        node_graph=np.concatenate(graph_ids),
        node_mask=np.concatenate(masks),
        y=y,
        y_mask=y_mask,
        structure=structure,
        num_graphs=num_graphs,
    ), names


def blocksparse_requirements(entries: list[dict], block: int = 128) -> tuple[int, int]:
    """(tiles, KBATCH-padded blocks) :func:`collate_graphs_blocksparse` would
    need for these entries — the same :func:`blocksparse_layout` pass without
    feature copies or block materialization, used to equalize shard caps."""
    from deeprank2_tpu.ops.block_sparse import required_blocks

    layout = blocksparse_layout(entries, block, features=False)
    return layout["num_tiles"], required_blocks(layout["pairs"], layout["num_tiles"] * block, block)


def collate_graphs_blocksparse_sharded(
    entries: list[dict],
    num_shards: int,
    pad_graphs_per_shard: int,
    block: int = 128,
    pad_tiles: int | None = None,
    pad_blocks: int | None = None,
) -> tuple[BlockSparseBatch, list[str]]:
    """Collate into ``num_shards`` equally-shaped block-sparse sub-batches
    stacked on a leading device axis (for shard_map data parallelism).

    Entries are assigned greedily by descending tile count to the least-loaded
    shard (large graphs vary widely, so round-robin would leave chips idle);
    all shards are padded to shared (tiles, blocks) caps so the stacked pytree
    is rectangular. ``pad_tiles``/``pad_blocks`` as in
    :func:`collate_graphs_blocksparse` (ints or ``required -> capacity``
    callables), resolved against the max requirement over shards.
    """
    if len(entries) > num_shards * pad_graphs_per_shard:
        msg = f"{len(entries)} entries exceed {num_shards} shards x {pad_graphs_per_shard} graphs"
        raise ValueError(msg)
    template = entries[0]
    tiles_of = [-(-e["x"].shape[0] // block) for e in entries]
    order = sorted(range(len(entries)), key=lambda i: -tiles_of[i])
    shards: list[list[dict]] = [[] for _ in range(num_shards)]
    loads = [0] * num_shards
    for i in order:
        # least-loaded shard among those with free graph slots (a purely
        # tile-greedy choice could overfill a shard's graph capacity)
        open_shards = [s for s in range(num_shards) if len(shards[s]) < pad_graphs_per_shard]
        s = min(open_shards, key=lambda s: loads[s])
        shards[s].append(entries[i])
        loads[s] += tiles_of[i]

    shards = [shard or [_dummy_entry(template)] for shard in shards]

    reqs = [blocksparse_requirements(shard, block) for shard in shards]
    cap_tiles = max(t for t, _ in reqs)
    cap_blocks = max(b for _, b in reqs)
    if callable(pad_tiles):
        cap_tiles = pad_tiles(cap_tiles)
    elif pad_tiles is not None:
        cap_tiles = max(cap_tiles, pad_tiles)
    if callable(pad_blocks):
        cap_blocks = pad_blocks(cap_blocks)
    elif pad_blocks is not None:
        cap_blocks = max(cap_blocks, pad_blocks)

    batches = []
    names: list[str] = []
    for shard in shards:
        batch, shard_names = collate_graphs_blocksparse(
            shard,
            block=block,
            pad_tiles=cap_tiles,
            pad_blocks=cap_blocks,
            pad_graphs=pad_graphs_per_shard,
        )
        batches.append(batch)
        names.extend(shard_names)
    return jax.tree.map(lambda *leaves: np.stack(leaves), *batches), names


@jax.tree_util.register_dataclass
@dataclass
class DiagClusteredBatch:
    """Graph-diagonal clustered batch — the community-pooling family at PPI
    scale (hundreds of small graphs) on the dense fast-path machinery.

    The batched ``[G, N, F]`` clustered dense models spend ~7.4 ms of a
    10.4 ms bench-shaped train step in XLA scatters (dense_segment_max over
    ``G*N`` rows at ~9 ns/row, profiled round 4). Here nodes collate
    cluster-major into 8-lane slots per graph (the slot8 discipline),
    activations live flat and transposed (``[F, G*N]``), aggregation rides
    the graph-diagonal Pallas kernel (ops/diag_spmm.py), depth-0 pooling is
    the slot kernel + a small member combine (ops/pallas_slotpool.py), and
    the pooled graph is ANOTHER graph-diagonal adjacency ``[G, K, K]``
    precomputed at collate (the reference recomputes pooled edges per
    forward, community_pooling.py:165 — they are static per batch).

    Ids are batch-global: pooled slot = ``g*K + local``, depth-1 slot from a
    running offset; padding = the target capacity (scatters drop)."""

    x_t: jax.Array  # f32 [F, G*N] flat transposed features, slot order
    adj_i8: jax.Array  # int8 [G, N, N] symmetric 0/1
    node_mask: jax.Array  # bool [G, N]
    deg: jax.Array  # f32 [G*N] neighbor counts (FoutNet's mean denominator)
    deg_p: jax.Array  # f32 [G*K] pooled neighbor counts (distinct pairs)
    # weighted variants (sGAT; [G, 0, 0] / [0] when not collated): scalar
    # edge weights as a symmetric adjacency (bf16 storage by default, f32 =
    # the exact-oracle mode) + precomputed row sums
    adj_w: jax.Array  # [G, N, N]
    adj_wp: jax.Array  # [G, K, K] pooled (member-edge weights SUMMED per pair)
    wsum: jax.Array  # f32 [G*N]
    wsum_p: jax.Array  # f32 [G*K]
    slot_cluster: jax.Array  # i32 [G*N/8] slot -> global pooled slot; pad = G*K
    members0s: jax.Array  # i32 [G*K, S0s] slot indices per pooled slot; pad = G*N/8
    adj_p_i8: jax.Array  # int8 [G, K, K] pooled adjacency (distinct pairs)
    pooled_mask: jax.Array  # bool [G, K]
    cluster1: jax.Array  # i32 [G*K] pooled slot -> global depth-1 slot; pad = C1
    members1: jax.Array  # i32 [C1, S1] pooled slots per depth-1 slot; pad = G*K
    c1_graph: jax.Array  # i32 [C1] graph id per depth-1 slot; pad = G
    y: jax.Array  # f32 [G]
    y_mask: jax.Array  # bool [G]
    num_graphs: int = field(metadata={"static": True})
    # MIXED size-class region layout (round-5; empty tuple = pure slot8).
    # (nb, n4, n2, n1, kbig): per-graph row caps of the slot8 region, the
    # 4-lane, 2-lane, and 1-lane size-class regions, and the pooled capacity
    # of the slotted segment. Each region pools with its own stride through
    # the generalized slot kernel (ops/pallas_slotpool.py slot=2/4/8; the
    # 1-lane region IS its pooled values) and the per-graph segments
    # concatenate straight into pooled order — no node-level gathers.
    # In this layout ``slot_cluster``/``members0s`` index the COMPACT big
    # region (slots = G*nb/8, pooled = G*kbig).
    region_caps: tuple = field(metadata={"static": True}, default=())

    @property
    def nodes_per_graph(self) -> int:
        return self.adj_i8.shape[1]


def collate_graphs_diag_clustered(
    entries: list[dict],
    pad_graphs: int | None = None,
    pad_nodes=None,
    pad_clusters=None,
    pad_c1=None,
    pad_members0s=None,
    pad_members1=None,
    with_edge_weights: bool = False,
    weight_dtype: np.dtype | None = None,
    min_slot_nodes: int | None = None,
    pad_region_caps: dict | None = None,
) -> tuple[DiagClusteredBatch, list[str]]:
    """Collate entries (:func:`collate_graphs` schema, ``cluster0``/``cluster1``
    required) into a :class:`DiagClusteredBatch`. Pooled-graph semantics match
    :func:`collate_graphs_blocksparse_clustered` (self-loop pairs dropped,
    duplicate pairs coalesced). ``pad_*`` may be ints or callables.

    ``min_slot_nodes`` selects the layout: ``1`` = pure slot8, ``>1`` = the
    MIXED size-class region layout (clusters below the threshold pack at
    stride 4/2/1 instead of paying 8-row slot padding — capping the
    quadratic dense-adjacency inflation on tiny-cluster data — and pool
    through the stride-s slot kernels), ``None`` = decide from the data
    (:func:`_auto_min_slot_nodes`). ``pad_region_caps`` buckets the mixed
    layout's per-region row caps (keys big/s4/s2/s1/kbig; ints or
    callables)."""
    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    if num_real > num_graphs:
        msg = f"{num_real} entries exceed pad_graphs={num_graphs}"
        raise ValueError(msg)
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)
    feat_dim = entries[0]["x"].shape[1]

    if min_slot_nodes is None:
        min_slot_nodes = _auto_min_slot_nodes(entries)
    if min_slot_nodes > 1:
        return _collate_diag_mixed(
            entries, names, num_graphs, feat_dim, min_slot_nodes,
            pad_c1=pad_c1, pad_members0s=pad_members0s, pad_members1=pad_members1,
            pad_region_caps=pad_region_caps, pad_clusters=pad_clusters,
            with_edge_weights=with_edge_weights, weight_dtype=weight_dtype,
        )
    plans = [_slot8_plan(e, 8) for e in entries]
    n_cap = _resolve_cap(pad_nodes, max(max(p["cap"] for p in plans), 8), 8)
    k_cap = _resolve_cap(pad_clusters, max(max(max(len(p["p_inv"]), 1) for p in plans), 8), 8)

    x = np.zeros((num_graphs * n_cap, feat_dim), dtype=np.float32)
    adj = np.zeros((num_graphs, n_cap, n_cap), dtype=np.int8)
    node_mask = np.zeros((num_graphs, n_cap), dtype=bool)
    if with_edge_weights:
        # f32 accumulators; storage cast (bf16 default) happens at the end
        adj_w = np.zeros((num_graphs, n_cap, n_cap), dtype=np.float32)
        adj_wp = np.zeros((num_graphs, k_cap, k_cap), dtype=np.float32)
    else:
        adj_w = np.zeros((num_graphs, 0, 0), dtype=np.float32)
        adj_wp = np.zeros((num_graphs, 0, 0), dtype=np.float32)
    slot_cluster = np.full(num_graphs * n_cap // 8, num_graphs * k_cap, dtype=np.int32)
    adj_p = np.zeros((num_graphs, k_cap, k_cap), dtype=np.int8)
    pooled_mask = np.zeros((num_graphs, k_cap), dtype=bool)
    cluster1_g = np.full(num_graphs * k_cap, -1, dtype=np.int64)
    c1_graphs: list[np.ndarray] = []
    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    c1_off = 0
    for g, entry in enumerate(entries):
        plan = plans[g]
        posmap, p_inv, p_order = plan["posmap"], plan["p_inv"], plan["p_order"]
        c0 = np.asarray(entry["cluster0"], dtype=np.int64)
        c1 = np.asarray(entry["cluster1"], dtype=np.int64)
        n_c0 = len(p_inv)
        if c1.shape[0] != n_c0:
            msg = f"cluster1 has {c1.shape[0]} entries for {n_c0} depth-0 clusters"
            raise ValueError(msg)
        n_c1 = int(c1.max()) + 1 if c1.size else 0

        x[g * n_cap + posmap] = entry["x"]
        node_mask[g][posmap] = True
        und = np.asarray(entry["edge_index"], dtype=np.int64).reshape(-1, 2)
        if und.size:
            pi, pj = posmap[und[:, 0]], posmap[und[:, 1]]
            adj[g, pi, pj] = 1
            adj[g, pj, pi] = 1
            ci, cj = p_inv[c0[und[:, 0]]], p_inv[c0[und[:, 1]]]
            keep = ci != cj
            adj_p[g, ci[keep], cj[keep]] = 1
            adj_p[g, cj[keep], ci[keep]] = 1
            if with_edge_weights:
                ea = np.asarray(entry["edge_attr"], dtype=np.float32).reshape(len(und), -1)[:, 0]
                # coalesce parity: duplicate pairs SUM their weights (node
                # level too, matching the pooled side below)
                np.add.at(adj_w[g], (pi, pj), ea)
                np.add.at(adj_w[g], (pj, pi), ea)
                np.add.at(adj_wp[g], (ci[keep], cj[keep]), ea[keep])
                np.add.at(adj_wp[g], (cj[keep], ci[keep]), ea[keep])
        sc = plan["slot_col"]  # local pooled id per slot, -1 = padding
        base = g * n_cap // 8
        slot_cluster[base : base + len(sc)] = np.where(sc >= 0, sc + g * k_cap, num_graphs * k_cap)
        # a gapped cluster0 id would make a zero-member pooled slot; mask it
        # (and keep it out of the depth-1 mean) like the COO path's counts>0
        valid0 = (np.bincount(c0, minlength=max(n_c0, 1))[:n_c0] > 0)[p_order] if c0.size else np.ones(n_c0, bool)
        pooled_mask[g, :n_c0] = valid0
        # pooled slot j holds cluster p_order[j]; its depth-1 id offsets in
        cluster1_g[g * k_cap : g * k_cap + n_c0] = np.where(valid0, c1[p_order] + c1_off, -1)
        cg = np.full(n_c1, -1, dtype=np.int64)
        if c1.size:
            cg[np.unique(c1)] = g
        c1_graphs.append(cg)
        c1_off += n_c1
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    c1_cap = _resolve_cap(pad_c1, max(c1_off, 1), 1)
    cluster1_arr = np.where(cluster1_g < 0, c1_cap, cluster1_g).astype(np.int32)
    c1_graph = np.full(c1_cap, num_graphs, dtype=np.int32)
    if c1_graphs:
        cg = np.concatenate(c1_graphs)
        c1_graph[: len(cg)] = np.where(cg < 0, num_graphs, cg)

    members0s = _member_matrix(slot_cluster, num_graphs * k_cap, num_graphs * n_cap // 8, pad_s=pad_members0s)
    members1 = _member_matrix(cluster1_arr, c1_cap, num_graphs * k_cap, pad_s=pad_members1)

    return DiagClusteredBatch(
        x_t=np.ascontiguousarray(x.T),
        adj_i8=adj,
        node_mask=node_mask,
        deg=adj.astype(np.float32).sum(axis=2).reshape(-1),
        deg_p=adj_p.astype(np.float32).sum(axis=2).reshape(-1),
        adj_w=adj_w.astype(weight_dtype or ml_dtypes.bfloat16),
        adj_wp=adj_wp.astype(weight_dtype or ml_dtypes.bfloat16),
        wsum=adj_w.sum(axis=2).reshape(-1) if with_edge_weights else np.zeros(0, np.float32),
        wsum_p=adj_wp.sum(axis=2).reshape(-1) if with_edge_weights else np.zeros(0, np.float32),
        slot_cluster=slot_cluster,
        members0s=members0s,
        adj_p_i8=adj_p,
        pooled_mask=pooled_mask,
        cluster1=cluster1_arr,
        members1=members1,
        c1_graph=c1_graph,
        y=y,
        y_mask=y_mask,
        num_graphs=num_graphs,
    ), names


def _resolve_cap(pad, req: int, quantum: int) -> int:
    """Requirement -> capacity: apply an int/callable pad, round to quantum."""
    if callable(pad):
        pad = pad(req)
    cap = max(req, pad or 0)
    return -(-cap // quantum) * quantum if quantum > 1 else cap


def _mixed_class(sizes: np.ndarray, min_slot_nodes: int) -> np.ndarray:
    """Size class per cluster: 8 = slotted, else the 4/2/1-lane stride that
    holds the cluster (zero-size gapped ids ride class 1: one masked lane).

    A stride-s class can only hold clusters of size <= s, so any cluster
    larger than 4 nodes slots regardless of ``min_slot_nodes`` — the
    effective threshold is min(min_slot_nodes, 5). (Without the clamp,
    min_slot_nodes > 5 would overflow the stride-4 region and corrupt the
    layout — caught by the round-5 self-review.)"""
    return np.where(
        (sizes >= min_slot_nodes) | (sizes > 4), 8, np.where(sizes > 2, 4, np.where(sizes == 2, 2, 1))  # noqa: PLR2004
    )


def _collate_diag_mixed(
    entries: list[dict],
    names: list[str],
    num_graphs: int,
    feat_dim: int,
    min_slot_nodes: int,
    *,
    pad_c1=None,
    pad_members0s=None,
    pad_members1=None,
    pad_region_caps: dict | None = None,
    pad_clusters=None,
    with_edge_weights: bool = False,
    weight_dtype: np.dtype | None = None,
) -> tuple[DiagClusteredBatch, list[str]]:
    """The MIXED size-class region layout (see DiagClusteredBatch.region_caps).

    Per graph, rows lay out as four fixed-cap regions
    ``[slot8 big | stride-4 | stride-2 | stride-1]`` (each cap 8-aligned and
    shared across graphs), clusters ordered by locality within each class.
    Pooled slots mirror the same segmentation (``[kbig | n4/4 | n2/2 | n1]``,
    padded groups = masked pooled slots), so depth-0 pooling is per-region
    stride-s slot kernels whose outputs CONCATENATE straight into pooled
    order — no node-level member gathers (the round-5 members0n formulation
    cost ~260 us of row gathers per PPI step; this replaces it with ~tens of
    us of rolls + selection matmuls).
    """
    from deeprank2_tpu.ops.block_sparse import locality_order

    pads = dict(pad_region_caps or {})

    # ---- pass 1: per-entry class assignment + region requirements ----
    infos = []
    reqs = {"big": 8, "s4": 0, "s2": 0, "s1": 0, "kbig": 1}
    for e in entries:
        v = e["x"].shape[0]
        pos = np.asarray(e["pos"], dtype=np.float64)
        c0 = np.asarray(e["cluster0"], dtype=np.int64)
        if c0.shape[0] != v:
            msg = f"cluster0 has {c0.shape[0]} entries for {v} nodes"
            raise ValueError(msg)
        n_c0 = int(c0.max()) + 1 if c0.size else 0
        psum = np.zeros((max(n_c0, 1), 3))
        np.add.at(psum, c0, pos)
        counts = np.bincount(c0, minlength=max(n_c0, 1)).astype(np.float64)
        pmean = psum / np.maximum(counts, 1.0)[:, None]
        p_order = locality_order(pmean[:n_c0]) if n_c0 > 8 else np.arange(n_c0)  # noqa: PLR2004
        sizes = counts[:n_c0].astype(np.int64)
        cls = _mixed_class(sizes, min_slot_nodes)

        # per-class rank in locality order
        rank = np.zeros(n_c0, dtype=np.int64)
        nslots = np.zeros(n_c0, dtype=np.int64)
        slot_base = np.zeros(n_c0, dtype=np.int64)
        for sc in (8, 4, 2, 1):
            sel = p_order[cls[p_order] == sc]
            rank[sel] = np.arange(len(sel))
            if sc == 8:  # noqa: PLR2004
                ns = -(-sizes[sel] // 8)
                nslots[sel] = ns
                slot_base[sel] = np.concatenate([[0], np.cumsum(ns)])[:-1]
        n_big = int(nslots.sum()) * 8
        c4 = int((cls == 4).sum())
        c2 = int((cls == 2).sum())
        c1n = int((cls == 1).sum())
        reqs["big"] = max(reqs["big"], n_big)
        reqs["s4"] = max(reqs["s4"], 4 * c4)
        reqs["s2"] = max(reqs["s2"], 2 * c2)
        reqs["s1"] = max(reqs["s1"], c1n)
        reqs["kbig"] = max(reqs["kbig"], int((cls == 8).sum()))  # noqa: PLR2004

        # member rank within cluster (locality order of nodes)
        order = locality_order(pos) if v > 8 else np.arange(v)  # noqa: PLR2004
        loc_rank = np.empty(v, dtype=np.int64)
        loc_rank[order] = np.arange(v)
        ord_in = np.lexsort((loc_rank, c0))
        starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
        mrank = np.empty(v, dtype=np.int64)
        mrank[ord_in] = np.arange(v) - starts[c0[ord_in]]
        infos.append({"c0": c0, "cls": cls, "rank": rank, "slot_base": slot_base, "nslots": nslots, "mrank": mrank})

    # ---- shared caps (8-aligned so regions stay stride- and tile-aligned) ----
    nb = _resolve_cap(pads.get("big"), reqs["big"], 8)
    n4 = _resolve_cap(pads.get("s4"), reqs["s4"], 8)
    n2 = _resolve_cap(pads.get("s2"), reqs["s2"], 8)
    n1 = _resolve_cap(pads.get("s1"), reqs["s1"], 8)
    kbig = _resolve_cap(pads.get("kbig"), reqs["kbig"], 8)
    n_cap = nb + n4 + n2 + n1
    k_req = kbig + n4 // 4 + n2 // 2 + n1
    k_cap = _resolve_cap(pad_clusters, k_req, 8)
    region_caps = (nb, n4, n2, n1, kbig)
    # pooled-slot base per class (class 8 -> 0)
    kbase = {8: 0, 4: kbig, 2: kbig + n4 // 4, 1: kbig + n4 // 4 + n2 // 2}
    rbase = {8: 0, 4: nb, 2: nb + n4, 1: nb + n4 + n2}
    stride = {8: 8, 4: 4, 2: 2, 1: 1}

    x = np.zeros((num_graphs * n_cap, feat_dim), dtype=np.float32)
    adj = np.zeros((num_graphs, n_cap, n_cap), dtype=np.int8)
    node_mask = np.zeros((num_graphs, n_cap), dtype=bool)
    if with_edge_weights:
        adj_w = np.zeros((num_graphs, n_cap, n_cap), dtype=np.float32)
        adj_wp = np.zeros((num_graphs, k_cap, k_cap), dtype=np.float32)
    else:
        adj_w = np.zeros((num_graphs, 0, 0), dtype=np.float32)
        adj_wp = np.zeros((num_graphs, 0, 0), dtype=np.float32)
    # COMPACT big-region slot map: [G*nb/8] -> [G*kbig]
    slot_cluster = np.full(num_graphs * nb // 8, num_graphs * kbig, dtype=np.int32)
    adj_p = np.zeros((num_graphs, k_cap, k_cap), dtype=np.int8)
    pooled_mask = np.zeros((num_graphs, k_cap), dtype=bool)
    cluster1_g = np.full(num_graphs * k_cap, -1, dtype=np.int64)
    c1_graphs: list[np.ndarray] = []
    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    c1_off = 0
    for g, entry in enumerate(entries):
        info = infos[g]
        c0, cls, rank, mrank = info["c0"], info["cls"], info["rank"], info["mrank"]
        n_c0 = len(cls)
        c1 = np.asarray(entry["cluster1"], dtype=np.int64)
        if c1.shape[0] != n_c0:
            msg = f"cluster1 has {c1.shape[0]} entries for {n_c0} depth-0 clusters"
            raise ValueError(msg)
        n_c1 = int(c1.max()) + 1 if c1.size else 0

        # cluster -> local pooled slot; cluster -> first row
        pslot = np.empty(n_c0, dtype=np.int64)
        row0 = np.empty(n_c0, dtype=np.int64)
        for sc in (8, 4, 2, 1):
            sel = cls == sc
            pslot[sel] = kbase[sc] + rank[sel]
            if sc == 8:  # noqa: PLR2004
                row0[sel] = 8 * info["slot_base"][sel]
            else:
                row0[sel] = rbase[sc] + stride[sc] * rank[sel]
        posmap = row0[c0] + mrank

        x[g * n_cap + posmap] = entry["x"]
        node_mask[g][posmap] = True
        und = np.asarray(entry["edge_index"], dtype=np.int64).reshape(-1, 2)
        if und.size:
            pi, pj = posmap[und[:, 0]], posmap[und[:, 1]]
            adj[g, pi, pj] = 1
            adj[g, pj, pi] = 1
            ci, cj = pslot[c0[und[:, 0]]], pslot[c0[und[:, 1]]]
            keep = ci != cj
            adj_p[g, ci[keep], cj[keep]] = 1
            adj_p[g, cj[keep], ci[keep]] = 1
            if with_edge_weights:
                ea = np.asarray(entry["edge_attr"], dtype=np.float32).reshape(len(und), -1)[:, 0]
                np.add.at(adj_w[g], (pi, pj), ea)
                np.add.at(adj_w[g], (pj, pi), ea)
                np.add.at(adj_wp[g], (ci[keep], cj[keep]), ea[keep])
                np.add.at(adj_wp[g], (cj[keep], ci[keep]), ea[keep])

        # big-region slots -> compact pooled ids
        big = np.flatnonzero(cls == 8)  # noqa: PLR2004
        if big.size:
            base = g * nb // 8
            # slots in increasing slot_base order = big clusters in their
            # locality order
            order8 = np.argsort(info["slot_base"][big], kind="stable")
            sc8 = np.repeat(pslot[big][order8], info["nslots"][big][order8])
            slot_cluster[base : base + len(sc8)] = sc8 + g * kbig

        valid0 = np.bincount(c0, minlength=max(n_c0, 1))[:n_c0] > 0 if c0.size else np.ones(n_c0, bool)
        pooled_mask[g][pslot] = valid0
        cluster1_g[g * k_cap + pslot] = np.where(valid0, c1 + c1_off, -1)
        cg = np.full(n_c1, -1, dtype=np.int64)
        if c1.size:
            cg[np.unique(c1)] = g
        c1_graphs.append(cg)
        c1_off += n_c1
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    c1_cap = _resolve_cap(pad_c1, max(c1_off, 1), 1)
    cluster1_arr = np.where(cluster1_g < 0, c1_cap, cluster1_g).astype(np.int32)
    c1_graph = np.full(c1_cap, num_graphs, dtype=np.int32)
    if c1_graphs:
        cg = np.concatenate(c1_graphs)
        c1_graph[: len(cg)] = np.where(cg < 0, num_graphs, cg)

    members0s = _member_matrix(slot_cluster, num_graphs * kbig, num_graphs * nb // 8, pad_s=pad_members0s)
    members1 = _member_matrix(cluster1_arr, c1_cap, num_graphs * k_cap, pad_s=pad_members1)

    return DiagClusteredBatch(
        x_t=np.ascontiguousarray(x.T),
        adj_i8=adj,
        node_mask=node_mask,
        deg=adj.astype(np.float32).sum(axis=2).reshape(-1),
        deg_p=adj_p.astype(np.float32).sum(axis=2).reshape(-1),
        adj_w=adj_w.astype(weight_dtype or ml_dtypes.bfloat16),
        adj_wp=adj_wp.astype(weight_dtype or ml_dtypes.bfloat16),
        wsum=adj_w.sum(axis=2).reshape(-1) if with_edge_weights else np.zeros(0, np.float32),
        wsum_p=adj_wp.sum(axis=2).reshape(-1) if with_edge_weights else np.zeros(0, np.float32),
        slot_cluster=slot_cluster,
        members0s=members0s,
        adj_p_i8=adj_p,
        pooled_mask=pooled_mask,
        cluster1=cluster1_arr,
        members1=members1,
        c1_graph=c1_graph,
        y=y,
        y_mask=y_mask,
        num_graphs=num_graphs,
        region_caps=region_caps,
    ), names


def diag_mixed_requirements(entries: list[dict], min_slot_nodes: int) -> dict:
    """Region requirements of :func:`_collate_diag_mixed` for these entries
    (the sharded collate's shard-consistent cap source)."""
    reqs = {"big": 8, "s4": 0, "s2": 0, "s1": 0, "kbig": 1}
    c1_total, s1m = 0, 1
    for e in entries:
        c0 = np.asarray(e["cluster0"], dtype=np.int64)
        n_c0 = int(c0.max()) + 1 if c0.size else 0
        sizes = np.bincount(c0, minlength=max(n_c0, 1))[:n_c0]
        cls = _mixed_class(sizes, min_slot_nodes)
        reqs["big"] = max(reqs["big"], int((-(-sizes[cls == 8] // 8)).sum()) * 8)  # noqa: PLR2004
        reqs["s4"] = max(reqs["s4"], 4 * int((cls == 4).sum()))
        reqs["s2"] = max(reqs["s2"], 2 * int((cls == 2).sum()))
        reqs["s1"] = max(reqs["s1"], int((cls == 1).sum()))
        reqs["kbig"] = max(reqs["kbig"], int((cls == 8).sum()))  # noqa: PLR2004
        reqs["members0s_s"] = max(
            reqs.get("members0s_s", 1),
            int((-(-sizes[cls == 8] // 8)).max()) if (cls == 8).any() else 1,  # noqa: PLR2004
        )
        c1 = np.asarray(e["cluster1"], dtype=np.int64)
        if c1.size:
            c1_total += int(c1.max()) + 1
            s1m = max(s1m, int(np.bincount(c1).max()))
    reqs["c1"] = max(c1_total, 1)
    reqs["members1_s"] = s1m
    reqs.setdefault("members0s_s", 1)
    return reqs


def _auto_min_slot_nodes(entries: list[dict], threshold: float = 2.5) -> int:
    """Pick the diag layout from the batch's cluster-size distribution:
    pure slot8 (1) unless per-cluster 8-row padding would inflate the node
    rows more than ``threshold``x, then the mixed layout (5 — the measured
    optimum of the 3/5/9/17 threshold sweep). v5e measurements behind the
    2.5x crossover (tests/perf/diag_clustered_perf.py --cell/--minslot,
    512x160-node PPI batches, full train steps):

      inflation 1.85 (avg 6.3-node clusters): pure 0.838 ms, mixed 1.137
        -> pure wins 36 % (mild padding < the node-level pool's gathers)
      inflation 3.15 (avg 2.73): pure 1.348, mixed 1.380 -> speed tie,
        but mixed streams a [512,200,200] adjacency instead of
        [512,504,504] (20 vs 130 MB -> 6.5x less HBM)
      inflation 4.5 (avg 1.78): pure 4.441, mixed 2.249 -> mixed wins 2x
        (the dense adjacency's quadratic blowup dominates everything)
    """
    total = slotted = 0
    for e in entries:
        c0 = np.asarray(e["cluster0"], dtype=np.int64)
        if not c0.size:
            continue
        sizes = np.bincount(c0)
        sizes = sizes[sizes > 0]
        total += int(sizes.sum())
        slotted += int((-(-sizes // 8) * 8).sum())
    return 5 if slotted > threshold * max(total, 1) else 1


def diag_clustered_requirements(entries: list[dict], min_slot_nodes: int = 1) -> dict:
    """Capacities the PURE-slot8 :func:`collate_graphs_diag_clustered` would
    need — the Trainer's grow-only bucket source (mirrors the collate's plan
    math). Mixed-layout requirements live in :func:`diag_mixed_requirements`."""
    del min_slot_nodes
    plans = [_slot8_plan(e, 8) for e in entries]
    c1_total = 0
    s1 = 1
    for e in entries:
        c1 = np.asarray(e["cluster1"], dtype=np.int64)
        if c1.size:
            c1_total += int(c1.max()) + 1
            s1 = max(s1, int(np.bincount(c1).max()))
    return {
        "nodes": max(p["cap"] for p in plans),
        "clusters": max(max(len(p["p_inv"]), 1) for p in plans),
        "c1": max(c1_total, 1),
        "members0s_s": max(p["max_slots"] for p in plans),
        "members1_s": s1,
    }


def collate_graphs_diag_clustered_sharded(
    entries: list[dict],
    num_shards: int,
    pad_graphs_per_shard: int,
    pad_caps: dict | None = None,
    with_edge_weights: bool = False,
    weight_dtype: np.dtype | None = None,
    min_slot_nodes: int | None = None,
) -> tuple[DiagClusteredBatch, list[str]]:
    """Round-robin :class:`DiagClusteredBatch` collation with a leading
    device axis (shard_map DP — ids are shard-global, so generic leading-axis
    sharding is correct). ``pad_caps`` maps
    :func:`diag_clustered_requirements` keys to ints or callables."""
    if len(entries) > num_shards * pad_graphs_per_shard:
        msg = f"{len(entries)} entries exceed {num_shards} shards x {pad_graphs_per_shard} graphs"
        raise ValueError(msg)
    template = entries[0]
    shards = [entries[s::num_shards] or [_dummy_entry(template)] for s in range(num_shards)]

    # ONE layout decision across shards (per-shard auto choices could
    # differ, and the stacked leaves must be rectangular); the Trainer pins
    # its own decision across BATCHES and passes it explicitly
    msn = min_slot_nodes if min_slot_nodes is not None else _auto_min_slot_nodes(entries)
    if msn > 1:
        reqs = [diag_mixed_requirements(shard, msn) for shard in shards]
        caps = {k: max(r[k] for r in reqs) for k in reqs[0]}
        for k, pad in (pad_caps or {}).items():
            if k in caps:
                caps[k] = pad(caps[k]) if callable(pad) else max(caps[k], pad)
        region = {k: caps[k] for k in ("big", "s4", "s2", "s1", "kbig")}
        extra = {
            "pad_c1": caps["c1"],
            "pad_members1": caps["members1_s"],
            "pad_members0s": caps["members0s_s"],
            "pad_region_caps": region,
        }
    else:
        reqs = [diag_clustered_requirements(shard, min_slot_nodes=1) for shard in shards]
        caps = {k: max(r[k] for r in reqs) for k in reqs[0]}
        for k, pad in (pad_caps or {}).items():
            if k in caps:
                caps[k] = pad(caps[k]) if callable(pad) else max(caps[k], pad)
        extra = {
            "pad_nodes": caps["nodes"],
            "pad_clusters": caps["clusters"],
            "pad_c1": caps["c1"],
            "pad_members0s": caps["members0s_s"],
            "pad_members1": caps["members1_s"],
        }

    batches = []
    names: list[str] = []
    for shard in shards:
        batch, shard_names = collate_graphs_diag_clustered(
            shard,
            pad_graphs=pad_graphs_per_shard,
            with_edge_weights=with_edge_weights,
            weight_dtype=weight_dtype,
            min_slot_nodes=msn,
            **extra,
        )
        batches.append(batch)
        names.extend(shard_names)
    stacked = jax.tree.map(lambda *leaves: np.stack(leaves), *batches)
    return stacked, names


@jax.tree_util.register_dataclass
@dataclass
class ClusteredBlockSparseBatch:
    """Block-sparse batch for *clustered* models (GINet clustered / FoutNet /
    sGAT) at atomic scale: the full graph AND its depth-0 community-pooled
    graph both ride BCSR adjacencies, with every cluster/pooling lookup
    precomputed host-side at collate (cluster assignments are static inputs —
    the reference recomputes pooled edges per forward, community_pooling.py:165,
    but they depend only on the batch).

    Pooled-node rows live in their own locality order (clusters are spatially
    tight, so the pooled adjacency stays banded); ``cluster0`` maps full-graph
    node slots to pooled-node slots. ``deg``/``deg_p`` are neighbor counts
    (the COO segment-mean denominators); ``wsum``/``wsum_p`` are weighted
    adjacency row sums (sGAT's row-part coefficient; zero-size when the model
    takes no edge weights).
    """

    x: jax.Array  # f32 [NT*B, F] node features in locality order (padded rows 0)
    pos: jax.Array  # f32 [NT*B, 3]
    node_graph: jax.Array  # i32 [NT*B] graph id per node; padded = G
    node_mask: jax.Array  # bool [NT*B]
    y: jax.Array  # f32 [G]
    y_mask: jax.Array  # bool [G]
    structure: "BlockSparseStructure"  # full-graph adjacency (weighted iff edge weights)
    deg: jax.Array  # f32 [NT*B] full-graph neighbor counts
    cluster0: jax.Array  # i32 [NT*B] node -> pooled-node slot; padded = NTp*B
    structure_p: "BlockSparseStructure"  # pooled-graph adjacency (distinct cluster pairs)
    deg_p: jax.Array  # f32 [NTp*B] pooled neighbor counts (distinct clusters)
    pooled_node_graph: jax.Array  # i32 [NTp*B]; padded = G
    pooled_node_mask: jax.Array  # bool [NTp*B]
    cluster1: jax.Array  # i32 [NTp*B] pooled node -> depth-1 slot; padded = C1 cap
    c1_graph: jax.Array  # i32 [C1] graph id per depth-1 slot; padded = G
    wsum: jax.Array  # f32 [NT*B] weighted row sums ([0] when unused)
    wsum_p: jax.Array  # f32 [NTp*B] pooled weighted row sums ([0] when unused)
    # member matrices for scatter-free max pooling (ops/pooling.py:
    # member_max_pool): node slots per pooled slot / pooled slots per depth-1
    # slot, padded with the source capacity. Shape (0, 0) signals "use the
    # scatter path" (a pathologically large cluster made the matrix blow up).
    members0: jax.Array  # i32 [NTp*B, S0]
    members1: jax.Array  # i32 [C1, S1]
    # slot8 layout only (size 0 otherwise): slot -> pooled slot (padding
    # slots = NTp*B) and its inverse, slot indices per pooled slot
    slot_cluster: jax.Array  # i32 [NT*B/8]
    members0s: jax.Array  # i32 [NTp*B, S0s]
    num_graphs: int = field(metadata={"static": True})

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_pooled_nodes(self) -> int:
        return self.cluster1.shape[0]


def _member_matrix(ids: np.ndarray, num_clusters: int, pad_value: int, pad_s=None) -> np.ndarray:
    """Invert a cluster assignment into a [num_clusters, S] member matrix
    (padded with ``pad_value``); S is the largest cluster size, optionally
    bucketed by ``pad_s`` (int or callable). Returns shape (0, 0) when the
    matrix would exceed 8x the element count (one huge cluster — the
    scatter path is cheaper then)."""
    ids = np.asarray(ids, dtype=np.int64)
    valid = ids < num_clusters
    counts = np.bincount(ids[valid], minlength=num_clusters)
    s = int(counts.max()) if counts.size else 0
    s = max(s, 1)
    if callable(pad_s):
        s = pad_s(s)
    elif pad_s is not None:
        s = max(s, pad_s)
    if num_clusters * s > 8 * max(len(ids), 1):
        return np.zeros((0, 0), dtype=np.int32)
    members = np.full((num_clusters, s), pad_value, dtype=np.int32)
    order = np.argsort(ids[valid], kind="stable")
    slots = np.nonzero(valid)[0][order]
    sorted_ids = ids[valid][order]
    rank = np.arange(len(slots)) - np.concatenate([[0], np.cumsum(counts)])[:-1][sorted_ids]
    members[sorted_ids, rank] = slots
    return members


def _slot8_plan(entry: dict, block: int) -> dict:
    """Per-entry cluster-slot row plan (the ``slot8`` layout): nodes go
    cluster-major — clusters follow their locality order, members follow
    theirs — with every cluster padded to a multiple of 8 rows ("slots").
    Depth-0 pooling then factorizes into an aligned 8-lane group max
    (ops/pallas_slotpool.py) plus a tiny per-cluster combine over <= 9 slot
    partials, killing the node-count-bound member gathers (+7.8 % rows and
    +10 % adjacency blocks at the 100k-node bench shape — measured cheaper
    than the 0.5 ms node-level pool it replaces). Tiny-cluster batches use
    the size-class region layout instead (:func:`_collate_diag_mixed`).

    Returns ``posmap`` (original node -> row), ``cap`` (row capacity),
    ``p_order``/``p_inv`` (the cluster locality permutation, identical to the
    un-slotted collate's so pooled-graph layouts agree), and ``slot_col``
    (slot -> LOCAL pooled slot id, -1 for trailing padding slots)."""
    from deeprank2_tpu.ops.block_sparse import locality_order

    v = entry["x"].shape[0]
    pos = np.asarray(entry["pos"], dtype=np.float64)
    c0 = np.asarray(entry["cluster0"], dtype=np.int64)
    if c0.shape[0] != v:
        msg = f"cluster0 has {c0.shape[0]} entries for {v} nodes"
        raise ValueError(msg)
    n_c0 = int(c0.max()) + 1 if c0.size else 0
    psum = np.zeros((max(n_c0, 1), 3))
    np.add.at(psum, c0, pos)
    counts = np.bincount(c0, minlength=max(n_c0, 1)).astype(np.float64)
    pmean = psum / np.maximum(counts, 1.0)[:, None]
    p_order = locality_order(pmean[:n_c0]) if n_c0 > block else np.arange(n_c0)
    p_inv = np.empty(n_c0, dtype=np.int64)
    p_inv[p_order] = np.arange(n_c0)

    sizes = counts[:n_c0].astype(np.int64)
    nslots = -(-sizes // 8)
    slot_base = np.zeros(n_c0, dtype=np.int64)
    slot_base[p_order] = np.concatenate([[0], np.cumsum(nslots[p_order])])[:-1]
    total_slots = int(nslots.sum())

    order = locality_order(pos) if v > block else np.arange(v)
    loc_rank = np.empty(v, dtype=np.int64)
    loc_rank[order] = np.arange(v)
    ord_in = np.lexsort((loc_rank, c0))
    starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    mrank = np.empty(v, dtype=np.int64)
    mrank[ord_in] = np.arange(v) - starts[c0[ord_in]]

    posmap = 8 * slot_base[c0] + mrank  # cluster runs are contiguous
    cap = max(-(-(8 * total_slots) // block) * block, block)
    slot_col = np.full(cap // 8, -1, dtype=np.int64)
    slot_col[:total_slots] = np.repeat(np.arange(n_c0), nslots[p_order])
    return {
        "posmap": posmap,
        "cap": cap,
        "p_order": p_order,
        "p_inv": p_inv,
        "slot_col": slot_col,
        "max_slots": int(nslots.max()) if n_c0 else 1,
    }


# x^T chunk size for the CLUSTERED collate's full-graph structure: its
# consumers contract at fw <= 32 (GINet's fused dual tower; FoutNet/sGAT at
# 16), so the chunk can be twice the global CHUNK_TILES and still fit VMEM
# (32 x 640 x 128 x 4B = 10.5 MB chunk + 4 MB block pipeline — the CT640
# configuration ran on-chip in the round-5 sweep). Fewer chunks = fewer
# slab mask+sums and chunk-switch DMAs per SpMM. MUST be used consistently
# by the build and the requirements pass (chunk boundaries change the
# run-padded block count).
_CLUSTERED_CHUNK_TILES = 640


def collate_graphs_blocksparse_clustered(
    entries: list[dict],
    block: int = 128,
    pad_tiles: int | None = None,
    pad_blocks: int | None = None,
    pad_pooled_tiles: int | None = None,
    pad_pooled_blocks: int | None = None,
    pad_c1: int | None = None,
    pad_graphs: int | None = None,
    with_edge_weights: bool = False,
    weight_dtype: np.dtype | None = None,
    pad_members0=None,
    pad_members1=None,
    slot8: bool = False,
    pad_members0s=None,
) -> tuple[ClusteredBlockSparseBatch, list[str]]:
    """Collate entries (the :func:`collate_graphs` schema, ``cluster0``/
    ``cluster1`` required) into a :class:`ClusteredBlockSparseBatch`.

    Pooled-graph semantics mirror :func:`deeprank2_tpu.ops.pooling.community_pool`
    (PyG parity): self-loop cluster pairs dropped, duplicate pairs coalesced;
    with ``with_edge_weights`` the coalesced pair weight is the SUM of member
    edge weights over the first edge-attr channel (PyG ``coalesce`` sums
    attrs; the dense path does the same, :func:`collate_graphs_dense`).
    All ``pad_*`` arguments may be ints or ``required -> capacity`` callables.

    ``slot8`` switches the node layout to cluster-major 8-lane slots
    (:func:`_slot8_plan`) and fills ``slot_cluster``/``members0s`` so the
    models pool via the Pallas slot kernel; node capacity is rounded to
    whole 1024-lane groups (8 tiles) for the kernel's grid.
    """
    from deeprank2_tpu.ops.block_sparse import build_blocksparse, locality_order

    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    if num_real > num_graphs:
        msg = f"{num_real} entries exceed pad_graphs={num_graphs}"
        raise ValueError(msg)
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)

    plans = [_slot8_plan(e, block) for e in entries] if slot8 else None
    layout = blocksparse_layout(entries, block, num_graphs, plans=plans)
    xs, poss, graph_ids, masks = layout["xs"], layout["poss"], layout["graph_ids"], layout["masks"]
    feat_dim = layout["feat_dim"]
    num_tiles = layout["num_tiles"]

    # ---- per-entry pooled-node layout + cluster remapping ----------------
    cluster0_cols: list[np.ndarray] = []  # per-entry, in full locality order
    pooled_graph_ids: list[np.ndarray] = []
    pooled_masks: list[np.ndarray] = []
    cluster1_cols: list[np.ndarray] = []
    c1_graphs: list[np.ndarray] = []
    pooled_pairs: list[np.ndarray] = []
    pooled_weights: list[np.ndarray] = []
    weights_full: list[np.ndarray] = []
    slot_cols: list[np.ndarray] = []  # slot8: per-entry slot -> pooled slot
    p_offset = 0
    c1_off = 0
    for g, entry in enumerate(entries):
        v = entry["x"].shape[0]
        order = layout["orders"][g]
        c0 = np.asarray(entry["cluster0"], dtype=np.int64)
        c1 = np.asarray(entry["cluster1"], dtype=np.int64)
        if c0.shape[0] != v:
            msg = f"cluster0 has {c0.shape[0]} entries for {v} nodes"
            raise ValueError(msg)
        n_c0 = int(c0.max()) + 1 if c0.size else 0
        # cluster1 maps depth-0 cluster id -> depth-1 cluster id, so it must
        # have exactly one entry per depth-0 cluster. A short array would
        # raise an opaque IndexError at c1[p_order]; a long one would mark
        # phantom depth-1 slots live (silent wrong per-graph means).
        if c1.shape[0] != n_c0:
            msg = f"cluster1 has {c1.shape[0]} entries for {n_c0} depth-0 clusters"
            raise ValueError(msg)
        n_c1 = int(c1.max()) + 1 if c1.size else 0

        if slot8:
            # the plan already holds the cluster locality permutation (same
            # math as below — one source of truth for both layouts)
            plan = plans[g]
            p_order, p_inv = plan["p_order"], plan["p_inv"]
        else:
            # pooled locality order from cluster mean positions
            pos = np.asarray(entry["pos"], dtype=np.float64)
            psum = np.zeros((n_c0, 3))
            np.add.at(psum, c0, pos)
            counts = np.bincount(c0, minlength=n_c0).astype(np.float64)
            pmean = psum / np.maximum(counts, 1.0)[:, None]
            p_order = locality_order(pmean) if n_c0 > block else np.arange(n_c0)
            p_inv = np.empty(n_c0, dtype=np.int64)
            p_inv[p_order] = np.arange(n_c0)

        p_cap = max(-(-n_c0 // block) * block, block)
        # cluster0 column for this entry's full-graph rows
        if slot8:
            cap = plan["cap"]
            col = np.full(cap, -1, dtype=np.int64)
            col[plan["posmap"]] = p_inv[c0] + p_offset
            slot_cols.append(np.where(plan["slot_col"] >= 0, plan["slot_col"] + p_offset, -1))
        else:
            cap = -(-v // block) * block
            col = np.full(cap, -1, dtype=np.int64)  # -1 marks padding; fixed up below
            col[:v] = p_inv[c0[order]] + p_offset
        cluster0_cols.append(col)

        pg = np.full(p_cap, num_graphs, dtype=np.int32)
        pg[:n_c0] = g
        pooled_graph_ids.append(pg)
        pm = np.zeros(p_cap, dtype=bool)
        pm[:n_c0] = True
        pooled_masks.append(pm)

        # cluster1 indexed by depth-0 cluster id -> pooled slot order
        c1_col = np.full(p_cap, -1, dtype=np.int64)
        c1_col[:n_c0] = c1[p_order] + c1_off
        cluster1_cols.append(c1_col)
        # only ids actually hit by a pooled node count toward the per-graph
        # mean (COO max_pool_x parity: unhit slots keep an OOB graph id)
        cg = np.full(n_c1, -1, dtype=np.int64)
        if c1.size:
            cg[np.unique(c1)] = g
        c1_graphs.append(cg)

        # pooled edges: map member edges, drop self-loops, coalesce
        und = np.asarray(entry["edge_index"], dtype=np.int64).reshape(-1, 2)
        w = None
        if with_edge_weights:
            if und.size:
                ea = np.asarray(entry["edge_attr"], dtype=np.float32).reshape(len(und), -1)
                w = ea[:, 0]
            else:
                w = np.zeros(0, np.float32)
            weights_full.append(w)
        pi = p_inv[c0[und[:, 0]]] if und.size else np.zeros(0, np.int64)
        pj = p_inv[c0[und[:, 1]]] if und.size else np.zeros(0, np.int64)
        keep = pi != pj
        pi, pj = pi[keep], pj[keep]
        lo, hi = np.minimum(pi, pj), np.maximum(pi, pj)
        pair_key = lo * p_cap + hi
        uniq_key, inverse = np.unique(pair_key, return_inverse=True)
        up = np.stack([uniq_key // p_cap, uniq_key % p_cap], axis=1) + p_offset
        pooled_pairs.append(up)
        if with_edge_weights:
            pw = np.zeros(len(uniq_key), dtype=np.float32)
            np.add.at(pw, inverse, w[keep])
            pooled_weights.append(pw)

        p_offset += p_cap
        c1_off += n_c1

    num_pooled_tiles = max(p_offset // block, 1)
    if callable(pad_pooled_tiles):
        pad_pooled_tiles = pad_pooled_tiles(num_pooled_tiles)
    if pad_pooled_tiles is not None:
        if pad_pooled_tiles < num_pooled_tiles:
            msg = f"pad_pooled_tiles={pad_pooled_tiles} < required {num_pooled_tiles}"
            raise ValueError(msg)
        extra = (pad_pooled_tiles - num_pooled_tiles) * block
        if extra:
            pooled_graph_ids.append(np.full(extra, num_graphs, np.int32))
            pooled_masks.append(np.zeros(extra, bool))
            cluster1_cols.append(np.full(extra, -1, np.int64))
        num_pooled_tiles = pad_pooled_tiles
    pooled_cap = num_pooled_tiles * block

    if callable(pad_tiles):
        pad_tiles = pad_tiles(num_tiles)
    if slot8 and pad_tiles is not None:
        # whole 1024-lane kernel groups (8 tiles of 128)
        pad_tiles = -(-pad_tiles // 8) * 8
    if pad_tiles is None and slot8:
        pad_tiles = -(-num_tiles // 8) * 8
    if pad_tiles is not None:
        if pad_tiles < num_tiles:
            msg = f"pad_tiles={pad_tiles} < required {num_tiles}"
            raise ValueError(msg)
        extra = (pad_tiles - num_tiles) * block
        if extra:
            xs.append(np.zeros((extra, feat_dim), np.float32))
            poss.append(np.zeros((extra, 3), np.float32))
            graph_ids.append(np.full(extra, num_graphs, np.int32))
            masks.append(np.zeros(extra, bool))
            cluster0_cols.append(np.full(extra, -1, np.int64))
            if slot8:
                slot_cols.append(np.full(extra // 8, -1, np.int64))
        num_tiles = pad_tiles
    node_cap = num_tiles * block

    n_c1_total = max(c1_off, 1)
    if callable(pad_c1):
        pad_c1 = pad_c1(n_c1_total)
    c1_cap = max(pad_c1 or 0, n_c1_total)
    if (pad_c1 or 0) and pad_c1 < n_c1_total:
        msg = f"pad_c1={pad_c1} < required {n_c1_total}"
        raise ValueError(msg)

    cluster0 = np.concatenate(cluster0_cols) if cluster0_cols else np.zeros(0, np.int64)
    cluster0 = np.where(cluster0 < 0, pooled_cap, cluster0).astype(np.int32)
    cluster1 = np.concatenate(cluster1_cols) if cluster1_cols else np.zeros(0, np.int64)
    cluster1 = np.where(cluster1 < 0, c1_cap, cluster1).astype(np.int32)
    c1_graph = np.full(c1_cap, num_graphs, dtype=np.int32)
    if c1_graphs:
        cg = np.concatenate(c1_graphs)
        c1_graph[: len(cg)] = np.where(cg < 0, num_graphs, cg)

    pairs = layout["pairs"]
    w_full = np.concatenate(weights_full) if with_edge_weights and weights_full else None
    structure = build_blocksparse(
        pairs, num_nodes=node_cap, block=block, pad_blocks_to=pad_blocks, weights=w_full, weight_dtype=weight_dtype,
        chunk_tiles=_CLUSTERED_CHUNK_TILES,
    )
    p_pairs = np.concatenate(pooled_pairs) if pooled_pairs else np.zeros((0, 2), np.int64)
    p_w = np.concatenate(pooled_weights) if with_edge_weights and pooled_weights else None
    structure_p = build_blocksparse(
        p_pairs, num_nodes=pooled_cap, block=block, pad_blocks_to=pad_pooled_blocks, weights=p_w, weight_dtype=weight_dtype
    )

    # degrees / weighted row sums (segment-mean denominators + sGAT row part)
    deg = np.zeros(node_cap, dtype=np.float32)
    if pairs.size:
        np.add.at(deg, pairs[:, 0], 1.0)
        np.add.at(deg, pairs[:, 1], 1.0)
    deg_p = np.zeros(pooled_cap, dtype=np.float32)
    if p_pairs.size:
        np.add.at(deg_p, p_pairs[:, 0], 1.0)
        np.add.at(deg_p, p_pairs[:, 1], 1.0)
    if with_edge_weights:
        wsum = np.zeros(node_cap, dtype=np.float32)
        if pairs.size and w_full is not None:
            np.add.at(wsum, pairs[:, 0], w_full)
            np.add.at(wsum, pairs[:, 1], w_full)
        wsum_p = np.zeros(pooled_cap, dtype=np.float32)
        if p_pairs.size and p_w is not None:
            np.add.at(wsum_p, p_pairs[:, 0], p_w)
            np.add.at(wsum_p, p_pairs[:, 1], p_w)
    else:
        wsum = np.zeros(0, dtype=np.float32)
        wsum_p = np.zeros(0, dtype=np.float32)

    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    for g, entry in enumerate(entries):
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    members0 = _member_matrix(cluster0, pooled_cap, node_cap, pad_s=pad_members0)
    members1 = _member_matrix(cluster1, c1_cap, pooled_cap, pad_s=pad_members1)

    if slot8:
        slot_cluster = np.concatenate(slot_cols) if slot_cols else np.zeros(0, np.int64)
        slot_cluster = np.where(slot_cluster < 0, pooled_cap, slot_cluster).astype(np.int32)
        members0s = _member_matrix(slot_cluster, pooled_cap, node_cap // 8, pad_s=pad_members0s)
    else:
        slot_cluster = np.zeros(0, np.int32)
        members0s = np.zeros((0, 0), np.int32)

    return ClusteredBlockSparseBatch(
        x=np.concatenate(xs),
        pos=np.concatenate(poss),
        node_graph=np.concatenate(graph_ids),
        node_mask=np.concatenate(masks),
        y=y,
        y_mask=y_mask,
        structure=structure,
        deg=deg,
        cluster0=cluster0,
        structure_p=structure_p,
        deg_p=deg_p,
        pooled_node_graph=np.concatenate(pooled_graph_ids),
        pooled_node_mask=np.concatenate(pooled_masks),
        cluster1=cluster1,
        c1_graph=c1_graph,
        wsum=wsum,
        wsum_p=wsum_p,
        members0=members0,
        members1=members1,
        slot_cluster=slot_cluster,
        members0s=members0s,
        num_graphs=num_graphs,
    ), names


def clustered_blocksparse_requirements(entries: list[dict], block: int = 128, slot8: bool = False) -> dict:
    """The capacities :func:`collate_graphs_blocksparse_clustered` would need
    for these entries — the light pass (no feature copies, no block
    materialization) used to equalize shard caps before sharded collation.
    Mirrors the collate's per-entry cluster math exactly (including the
    slot8 row plan, whose padding changes tile and block counts)."""
    from deeprank2_tpu.ops.block_sparse import locality_order, required_blocks

    plans = [_slot8_plan(e, block) for e in entries] if slot8 else None
    layout = blocksparse_layout(entries, block, features=False, plans=plans)
    p_offset = 0
    c1_total = 0
    s0 = 1
    s1 = 1
    pooled_pairs = []
    for g, entry in enumerate(entries):
        order = layout["orders"][g]
        c0 = np.asarray(entry["cluster0"], dtype=np.int64)
        c1 = np.asarray(entry["cluster1"], dtype=np.int64)
        n_c0 = int(c0.max()) + 1 if c0.size else 0
        if c1.shape[0] != n_c0:
            msg = f"cluster1 has {c1.shape[0]} entries for {n_c0} depth-0 clusters"
            raise ValueError(msg)
        n_c1 = int(c1.max()) + 1 if c1.size else 0
        pos = np.asarray(entry["pos"], dtype=np.float64)
        psum = np.zeros((n_c0, 3))
        np.add.at(psum, c0, pos)
        counts = np.bincount(c0, minlength=n_c0).astype(np.float64)
        if counts.size:
            s0 = max(s0, int(counts.max()))
        if c1.size:
            s1 = max(s1, int(np.bincount(c1, minlength=n_c1).max()))
        pmean = psum / np.maximum(counts, 1.0)[:, None]
        p_order = locality_order(pmean) if n_c0 > block else np.arange(n_c0)
        p_inv = np.empty(n_c0, dtype=np.int64)
        p_inv[p_order] = np.arange(n_c0)
        p_cap = max(-(-n_c0 // block) * block, block)
        und = np.asarray(entry["edge_index"], dtype=np.int64).reshape(-1, 2)
        pi = p_inv[c0[und[:, 0]]] if und.size else np.zeros(0, np.int64)
        pj = p_inv[c0[und[:, 1]]] if und.size else np.zeros(0, np.int64)
        keep = pi != pj
        pi, pj = pi[keep], pj[keep]
        lo, hi = np.minimum(pi, pj), np.maximum(pi, pj)
        uniq = np.unique(lo * p_cap + hi)
        pooled_pairs.append(np.stack([uniq // p_cap, uniq % p_cap], axis=1) + p_offset)
        p_offset += p_cap
        c1_total += n_c1
    pooled_tiles = max(p_offset // block, 1)
    p_pairs = np.concatenate(pooled_pairs) if pooled_pairs else np.zeros((0, 2), np.int64)
    req = {
        "tiles": layout["num_tiles"],
        "blocks": required_blocks(layout["pairs"], layout["num_tiles"] * block, block, chunk_tiles=_CLUSTERED_CHUNK_TILES),
        "pooled_tiles": pooled_tiles,
        "pooled_blocks": required_blocks(p_pairs, pooled_tiles * block, block),
        "c1": max(c1_total, 1),
        "members0_s": s0,
        "members1_s": s1,
    }
    if slot8:
        req["members0s_s"] = max(p["max_slots"] for p in plans)
    return req


def collate_graphs_blocksparse_clustered_sharded(
    entries: list[dict],
    num_shards: int,
    pad_graphs_per_shard: int,
    block: int = 128,
    with_edge_weights: bool = False,
    weight_dtype: np.dtype | None = None,
    pad_caps: dict | None = None,
    slot8: bool = False,
) -> tuple[ClusteredBlockSparseBatch, list[str]]:
    """Collate into ``num_shards`` equally-shaped clustered block-sparse
    sub-batches stacked on a leading device axis (shard_map data parallelism),
    with the same greedy tile-balanced assignment as the block-sparse variant.
    ``pad_caps`` maps the :func:`clustered_blocksparse_requirements` keys to
    ints or ``required -> capacity`` callables (grow-only Trainer buckets)."""
    if len(entries) > num_shards * pad_graphs_per_shard:
        msg = f"{len(entries)} entries exceed {num_shards} shards x {pad_graphs_per_shard} graphs"
        raise ValueError(msg)
    template = entries[0]
    tiles_of = [-(-e["x"].shape[0] // block) for e in entries]
    order = sorted(range(len(entries)), key=lambda i: -tiles_of[i])
    shards: list[list[dict]] = [[] for _ in range(num_shards)]
    loads = [0] * num_shards
    for i in order:
        open_shards = [s for s in range(num_shards) if len(shards[s]) < pad_graphs_per_shard]
        s = min(open_shards, key=lambda s: loads[s])
        shards[s].append(entries[i])
        loads[s] += tiles_of[i]
    shards = [shard or [_dummy_entry(template)] for shard in shards]

    reqs = [clustered_blocksparse_requirements(shard, block, slot8=slot8) for shard in shards]
    caps = {k: max(r[k] for r in reqs) for k in reqs[0]}
    for k, pad in (pad_caps or {}).items():
        caps[k] = pad(caps[k]) if callable(pad) else max(caps[k], pad)

    batches = []
    names: list[str] = []
    for shard in shards:
        batch, shard_names = collate_graphs_blocksparse_clustered(
            shard,
            block=block,
            pad_tiles=caps["tiles"],
            pad_blocks=caps["blocks"],
            pad_pooled_tiles=caps["pooled_tiles"],
            pad_pooled_blocks=caps["pooled_blocks"],
            pad_c1=caps["c1"],
            pad_graphs=pad_graphs_per_shard,
            with_edge_weights=with_edge_weights,
            weight_dtype=weight_dtype,
            pad_members0=caps["members0_s"],
            pad_members1=caps["members1_s"],
            slot8=slot8,
            pad_members0s=caps.get("members0s_s"),
        )
        batches.append(batch)
        names.extend(shard_names)
    return jax.tree.map(lambda *leaves: np.stack(leaves), *batches), names


@jax.tree_util.register_dataclass
@dataclass
class BlockedEdgeBatch:
    """A batch of graphs in the blocked per-edge-feature layout
    (ops/blocked_edges.py) — for models whose messages consume per-edge
    features (VanillaNetwork family). Nodes are locality-reordered per graph,
    padded to whole ``EDGE_TILE`` tiles, and concatenated, exactly like the
    block-sparse layout but with the edge list (and its features) kept in
    tile-sorted slabs instead of an adjacency."""

    x: jax.Array  # f32 [NT*T, F] node features in locality order (padded rows 0)
    pos: jax.Array  # f32 [NT*T, 3]
    node_graph: jax.Array  # i32 [NT*T] graph id per node; padded = G
    node_mask: jax.Array  # bool [NT*T]
    y: jax.Array  # f32 [G]
    y_mask: jax.Array  # bool [G]
    structure: "BlockedEdgeStructure"  # sorted edge slabs over all NT tiles
    num_graphs: int = field(metadata={"static": True})

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]


def collate_graphs_blocked(
    entries: list[dict],
    pad_tiles: int | None = None,
    pad_slabs=None,
    pad_graphs: int | None = None,
) -> tuple[BlockedEdgeBatch, list[str]]:
    """Collate entry dicts (same schema as :func:`collate_graphs`) into a
    :class:`BlockedEdgeBatch`. Capacity arguments may be ints or
    ``required -> capacity`` callables (grow-only buckets), as in
    :func:`collate_graphs_blocksparse`."""
    from deeprank2_tpu.ops.blocked_edges import EDGE_TILE, build_blocked_edges

    num_real = len(entries)
    num_graphs = pad_graphs or num_real
    if num_real > num_graphs:
        msg = f"{num_real} entries exceed pad_graphs={num_graphs}"
        raise ValueError(msg)
    names = [e["entry_name"] for e in entries] + [""] * (num_graphs - num_real)

    layout = blocksparse_layout(entries, EDGE_TILE, num_graphs)
    xs, poss, graph_ids, masks = layout["xs"], layout["poss"], layout["graph_ids"], layout["masks"]
    feat_dim = layout["feat_dim"]
    num_tiles = layout["num_tiles"]

    if callable(pad_tiles):
        pad_tiles = pad_tiles(num_tiles)
    if pad_tiles is not None:
        if pad_tiles < num_tiles:
            msg = f"pad_tiles={pad_tiles} < required {num_tiles}"
            raise ValueError(msg)
        extra = (pad_tiles - num_tiles) * EDGE_TILE
        if extra:
            xs.append(np.zeros((extra, feat_dim), np.float32))
            poss.append(np.zeros((extra, 3), np.float32))
            graph_ids.append(np.full(extra, num_graphs, np.int32))
            masks.append(np.zeros(extra, bool))
        num_tiles = pad_tiles

    # edge features in the same per-entry order as the remapped pairs
    eattrs = []
    for entry in entries:
        ea = np.asarray(entry["edge_attr"], dtype=np.float32)
        eattrs.append(ea[:, None] if ea.ndim == 1 else ea)
    edge_dim = eattrs[0].shape[1] if eattrs else 1
    eattr = np.concatenate(eattrs) if eattrs else np.zeros((0, edge_dim), np.float32)

    structure = build_blocked_edges(
        layout["pairs"],
        eattr,
        num_nodes=num_tiles * EDGE_TILE,
        pad_slabs=pad_slabs,
    )

    y = np.zeros(num_graphs, dtype=np.float32)
    y_mask = np.zeros(num_graphs, dtype=bool)
    for g, entry in enumerate(entries):
        if entry.get("y") is not None:
            y[g] = entry["y"]
            y_mask[g] = True

    return BlockedEdgeBatch(
        x=np.concatenate(xs),
        pos=np.concatenate(poss),
        node_graph=np.concatenate(graph_ids),
        node_mask=np.concatenate(masks),
        y=y,
        y_mask=y_mask,
        structure=structure,
        num_graphs=num_graphs,
    ), names


def blocked_requirements(entries: list[dict]) -> tuple[int, int]:
    """(tiles, slabs) :func:`collate_graphs_blocked` would need for these
    entries — used to equalize per-shard capacities."""
    from deeprank2_tpu.ops.blocked_edges import EDGE_TILE, required_slabs

    layout = blocksparse_layout(entries, EDGE_TILE, features=False)
    return layout["num_tiles"], required_slabs(layout["pairs"], layout["num_tiles"] * EDGE_TILE)


def collate_graphs_blocked_sharded(
    entries: list[dict],
    num_shards: int,
    pad_graphs_per_shard: int,
    pad_tiles=None,
    pad_slabs=None,
) -> tuple[BlockedEdgeBatch, list[str]]:
    """Collate into ``num_shards`` equally-shaped blocked-edge sub-batches
    stacked on a leading device axis (for shard_map data parallelism), with
    the same greedy tile-balanced assignment as the block-sparse variant."""
    from deeprank2_tpu.ops.blocked_edges import EDGE_TILE

    if len(entries) > num_shards * pad_graphs_per_shard:
        msg = f"{len(entries)} entries exceed {num_shards} shards x {pad_graphs_per_shard} graphs"
        raise ValueError(msg)
    template = entries[0]
    tiles_of = [-(-e["x"].shape[0] // EDGE_TILE) for e in entries]
    order = sorted(range(len(entries)), key=lambda i: -tiles_of[i])
    shards: list[list[dict]] = [[] for _ in range(num_shards)]
    loads = [0] * num_shards
    for i in order:
        open_shards = [s for s in range(num_shards) if len(shards[s]) < pad_graphs_per_shard]
        s = min(open_shards, key=lambda s: loads[s])
        shards[s].append(entries[i])
        loads[s] += tiles_of[i]

    shards = [shard or [_dummy_entry(template)] for shard in shards]

    reqs = [blocked_requirements(shard) for shard in shards]
    cap_tiles = max(t for t, _ in reqs)
    cap_slabs = max(b for _, b in reqs)
    if callable(pad_tiles):
        cap_tiles = pad_tiles(cap_tiles)
    elif pad_tiles is not None:
        cap_tiles = max(cap_tiles, pad_tiles)
    if callable(pad_slabs):
        cap_slabs = pad_slabs(cap_slabs)
    elif pad_slabs is not None:
        cap_slabs = max(cap_slabs, pad_slabs)

    batches = []
    names: list[str] = []
    for shard in shards:
        batch, shard_names = collate_graphs_blocked(
            shard,
            pad_tiles=cap_tiles,
            pad_slabs=cap_slabs,
            pad_graphs=pad_graphs_per_shard,
        )
        batches.append(batch)
        names.extend(shard_names)
    return jax.tree.map(lambda *leaves: np.stack(leaves), *batches), names
